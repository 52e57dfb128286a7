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
            -- positive-mod floor alignment, same form as the graded e2c/e2d/
            -- e2e oracles (ADVICE r12): truncating `epoch_us // slide` would
            -- misalign pre-1970 negative-epoch fixtures, so the fuzz oracle
            -- must not quietly depend on the fixtures being post-1970.
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {slide_us}) + {slide_us}) % {slide_us})
                   - k * {slide_us} AS ws_us,
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


# ---------------------------------------------------------------------------
# method='hll' leg (VERDICT r11 #4, widened round-13 to ALL specs incl.
# non-divisible — sliding_expand's general membership filter): × both keys,
# per-window REGISTER TABLES checked against a pure-Python recompute of the
# whole chain — floor-aligned expansion, string fold, avalanche hash,
# register/rho split, per-register max.  Integer-exact, no float tolerance.
# ---------------------------------------------------------------------------

def _py_fold(s: str) -> int:
    """Mirror of sketch.hll_key_expr's string fold (split('', s) on the
    empty string yields [''] whose ascii is 0)."""
    codes = [0] if s == "" else [ord(c) for c in s]
    acc = 0
    for x in codes:
        acc = (acc * 31 + x) % 1_000_000_007
    return acc


def _py_registers(rows, win_us: int, slide_us: int, key_is_str: bool):
    """(ws_us, register) → max_rho over the expanded membership, in pure
    Python (bit_length for rho — a different exactness path than the
    engines' floor(log2)).  General membership rule (``ws > t − window``
    over a ceil(window/slide) candidate expansion), so the recompute
    covers aligned AND non-divisible specs — the same rule the exact-path
    oracle above uses."""
    from pulsar_message_filter_spark.operators.sketch import (
        _HLL_A,
        _HLL_B,
        _HLL_M,
        _HLL_MULT,
        _P,
    )

    regs: dict[tuple[int, int], int] = {}
    for us, k in rows:
        kv = _py_fold(k) if key_is_str else int(k)
        h = (kv * _HLL_A + _HLL_B) % _P
        h ^= h >> 16
        h = (h * _HLL_MULT) % _P
        h ^= h >> 13
        h = (h * _HLL_MULT) % _P
        h ^= h >> 16
        reg, w = h % _HLL_M, h // _HLL_M
        rho = (25 - (w.bit_length() - 1)) if w > 0 else 26
        base = us - us % slide_us  # Python % IS floor-mod (pmod semantics)
        for j in range(-(-win_us // slide_us)):  # ceil(window/slide)
            ws = base - j * slide_us
            if ws <= us - win_us:  # non-member boundary candidate
                continue
            key2 = (ws, reg)
            if regs.get(key2, -1) < rho:
                regs[key2] = rho
    return regs


@pytest.mark.parametrize("key", _KEYS)
@pytest.mark.parametrize("window,slide", _SPECS)
def test_sliding_hll_registers_match_python_recompute(spark, window, slide, key):
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.sketch import hll_registers_by
    from pulsar_message_filter_spark.operators.windows import (
        sliding_distinct,
        sliding_expand,
    )

    ev = load(spark, "events", SF_SMOKE)
    rows = [
        (r.us, r.k)
        for r in ev.select(
            F.unix_micros("ts").alias("us"), F.col(key).alias("k")
        ).collect()
    ]
    expected = _py_registers(rows, _us(window), _us(slide), key == "event_type")

    got = {
        (r.ws_us, r.register): r.max_rho
        for r in hll_registers_by(
            sliding_expand(ev, "ts", key, window, slide), key, [F.col("ws_us")]
        ).collect()
    }
    assert got == expected, (window, slide, key)

    # spec-level alignment: the hll output covers exactly the window starts
    # the exact (F.window) path produces
    hll_ws = {
        r.ws_us
        for r in sliding_distinct(
            ev, "ts", key, window, slide, method="hll"
        ).collect()
    }
    exact_ws = {
        r.ws_us
        for r in sliding_distinct(
            ev, "ts", key, window, slide, method="exact"
        ).collect()
    }
    assert hll_ws == exact_ws, (window, slide, key)


# ---------------------------------------------------------------------------
# Round-18 third witness: sliding_expand vs Spark's OWN F.window membership
# on seeded RANDOM specs.  The exact leg above checks F.window against a
# DuckDB oracle and the hll leg checks sliding_expand against pure Python —
# this closes the triangle engine-internally (expansion ≡ F.window for
# arbitrary window/slide pairs, aligned or not), over specs the fixed pools
# never tried.  crc32-seeded so every run draws the same specs.
# ---------------------------------------------------------------------------


def _random_specs(seed: int, n: int = 8) -> list[tuple[str, str]]:
    import random
    import zlib

    rng = random.Random(zlib.crc32(b"sliding-spec") ^ seed)
    specs = []
    while len(specs) < n:
        slide = rng.randint(7, 180)
        window = slide + rng.randint(1, 360)
        specs.append((f"{window} minutes", f"{slide} minutes"))
    return specs


@pytest.mark.parametrize("seed", [1, 2])
def test_sliding_expand_matches_fwindow_membership_random_specs(spark, seed):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_expand

    ev = load(spark, "events", SF_SMOKE)
    for window, slide in _random_specs(seed):
        got = {
            (r.ws_us, r.k): r.n
            for r in sliding_expand(ev, "ts", "user_id", window, slide)
            .groupBy("ws_us", F.col("user_id").alias("k"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        expected = {
            (r.ws_us, r.k): r.n
            for r in ev.groupBy(
                F.window("ts", window, slide).alias("__w"),
                F.col("user_id").alias("k"),
            )
            .agg(F.count("*").alias("n"))
            .select(F.unix_micros("__w.start").alias("ws_us"), "k", "n")
            .collect()
        }
        assert got == expected, (seed, window, slide)
