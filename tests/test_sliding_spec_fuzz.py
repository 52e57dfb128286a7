"""EIGHTH differential fuzz family: sliding-window spec fuzz.

The graded sliding queries pin specific (window, slide) specs.  This
family draws specs from pools — INCLUDING non-divisible pairs, where
the per-event window-membership count is data-dependent (an event sits
in ceil(window/slide) or fewer windows) — and checks
``sliding_distinct(method='exact')`` against a programmatically-built
DuckDB oracle on the general membership rule:

    window start ws = (t div slide - k) * slide  contains t
    iff  ws > t - window          (ws <= t holds by construction)

which covers aligned and misaligned specs with one formula.  Keys fuzz
across user_id / event_type; an extra count(*) agg rides along so
the expansion arithmetic is checked, not just the distinct.  The full
spec × key product runs deterministically (no sampling) — 14 combos.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

_SPECS = [
    ("2 hours", "1 hour"),      # aligned, factor 2
    ("6 hours", "2 hours"),     # aligned, factor 3
    ("1 day", "6 hours"),       # aligned, factor 4
    ("3 hours", "2 hours"),     # NON-divisible: 1-2 windows per event
    ("5 hours", "2 hours"),     # NON-divisible: 2-3 windows per event
    ("90 minutes", "1 hour"),   # NON-divisible, sub-hour window edge
    ("45 minutes", "30 minutes"),
]
_KEYS = ["user_id", "event_type"]

_UNIT_US = {"minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000}


def _us(spec: str) -> int:
    n, unit = spec.split()
    return int(n) * _UNIT_US[unit.rstrip("s")]


def _oracle_sql(win_us: int, slide_us: int, key: str) -> str:
    kmax = math.ceil(win_us / slide_us)  # superset; WHERE prunes non-members
    return f"""
        WITH hits AS (
            SELECT (epoch_us(ts) // {slide_us} - k) * {slide_us} AS ws_us,
                   {key} AS k_val, epoch_us(ts) AS t_us
            FROM events, LATERAL unnest(generate_series(0, {kmax - 1})) AS t(k)
        )
        SELECT ws_us,
               count(DISTINCT k_val) AS n_distinct,
               count(*) AS n_events
        FROM hits
        WHERE ws_us > t_us - {win_us}
        GROUP BY ws_us
    """


@pytest.mark.parametrize("key", _KEYS)
@pytest.mark.parametrize("window,slide", _SPECS)
def test_sliding_distinct_matches_duckdb_across_specs(spark, window, slide, key):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    got = {
        r.ws_us: (r.n_distinct, r.n_events)
        for r in sliding_distinct(
            ev, "ts", key, window, slide,
            extra_aggs=[F.count("*").alias("n_events")], method="exact",
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    expected = {
        int(ws): (int(nd), int(ne))
        for ws, nd, ne in con.execute(
            _oracle_sql(_us(window), _us(slide), key)
        ).fetchall()
    }
    assert got == expected, (window, slide, key)
