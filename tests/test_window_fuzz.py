"""Differential fuzz for window functions (C18–C20), the round-12 widening
of the §5.3.2 fuzz surface: seeded-random (partition, total order, frame,
function) specs render from ONE spec into BOTH a Spark Window chain and
DuckDB SQL, then compare exactly.

Determinism rules that make exact compare sound:
- the ORDER BY is always total — (epoch_us(ts), event_id) with event_id
  unique — so ranking and ROWS frames are well-defined on both engines;
- all aggregated values are exact integer cents (no float summation);
- RANGE frames order by a single integer expression (value-defined frames
  are tie-order-independent by construction).
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from tests.conftest import SF_SMOKE

PARTITIONS = [
    ("event_type", "event_type"),
    ("user_id % 7", "user_id % 7"),
    (None, None),  # global window (single partition — fine at fuzz scale)
]

RANK_FNS = [
    ("row_number", F.row_number, "row_number()"),
    ("rank", F.rank, "rank()"),
    ("dense_rank", F.dense_rank, "dense_rank()"),
    ("ntile4", lambda: F.ntile(4), "ntile(4)"),
]

AGG_FNS = [
    ("sum", lambda c: F.sum(c), "sum"),
    ("count", lambda c: F.count(c), "count"),
    ("min", lambda c: F.min(c), "min"),
    ("max", lambda c: F.max(c), "max"),
]


def _frame(rng: random.Random):
    """Random ROWS frame: (spark_lo, spark_hi, sql_text)."""
    lo = rng.choice([Window.unboundedPreceding, -5, -2, -1, 0])
    hi = rng.choice([Window.unboundedFollowing, 5, 2, 1, 0])
    def side(v, preceding):
        if v == Window.unboundedPreceding:
            return "UNBOUNDED PRECEDING"
        if v == Window.unboundedFollowing:
            return "UNBOUNDED FOLLOWING"
        if v == 0:
            return "CURRENT ROW"
        n = abs(v)
        return f"{n} PRECEDING" if v < 0 else f"{n} FOLLOWING"
    return lo, hi, f"ROWS BETWEEN {side(lo, True)} AND {side(hi, False)}"


def _spec(rng: random.Random):
    part_spark, part_sql = rng.choice(PARTITIONS)
    over_part = f"PARTITION BY {part_sql} " if part_sql else ""
    order_sql = "ORDER BY epoch_us(ts), event_id"
    cols_spark, cols_sql = [], []

    # one ranking function (no frame allowed)
    name, fn, sql_fn = rng.choice(RANK_FNS)
    w = (
        Window.partitionBy(*( [F.expr(part_spark)] if part_spark else [] ))
        .orderBy(F.unix_micros("ts"), "event_id")
    )
    cols_spark.append(fn().over(w).cast("long").alias(f"r_{name}"))
    cols_sql.append(
        f"CAST({sql_fn} OVER ({over_part}{order_sql}) AS BIGINT) AS r_{name}"
    )

    # two framed aggregates over integer cents
    for i in range(2):
        aname, afn, asql = rng.choice(AGG_FNS)
        lo, hi, frame_sql = _frame(rng)
        if (lo, hi) == (Window.unboundedFollowing, Window.unboundedPreceding):
            continue  # impossible frame; _frame can't produce it, guard anyway
        wf = w.rowsBetween(lo, hi)
        cols_spark.append(
            afn(cents("value")).over(wf).cast("long").alias(f"a{i}_{aname}")
        )
        cols_sql.append(
            f"CAST({asql}({cents_sql('value')}) OVER "
            f"({over_part}{order_sql} {frame_sql}) AS BIGINT) AS a{i}_{aname}"
        )

    # one lag/lead with a random offset and integer default
    off = rng.randint(1, 3)
    kind = rng.choice(["lag", "lead"])
    sfn = F.lag if kind == "lag" else F.lead
    cols_spark.append(
        sfn(cents("value"), off, -1).over(w).cast("long").alias(f"lx_{kind}")
    )
    cols_sql.append(
        f"CAST({kind}({cents_sql('value')}, {off}, -1) OVER "
        f"({over_part}{order_sql}) AS BIGINT) AS lx_{kind}"
    )

    # one RANGE frame over the integer time axis (value-defined)
    span = rng.choice([60, 600, 3600]) * 1_000_000
    w_range = (
        Window.partitionBy(*( [F.expr(part_spark)] if part_spark else [] ))
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-span, 0)
    )
    cols_spark.append(
        F.sum(cents("value")).over(w_range).cast("long").alias("rng_sum")
    )
    cols_sql.append(
        f"CAST(sum({cents_sql('value')}) OVER ({over_part}ORDER BY epoch_us(ts) "
        f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW) AS BIGINT) AS rng_sum"
    )
    return cols_spark, cols_sql


@pytest.mark.parametrize("seed", range(10))
def test_random_window_specs_match_duckdb(spark, seed):
    rng = random.Random(7_000 + seed)
    cols_spark, cols_sql = _spec(rng)

    ev = load(spark, "events", SF_SMOKE)
    got = (
        ev.select(F.col("event_id"), *cols_spark)
        .orderBy("event_id")
        .collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet')"
        )
        want = con.execute(
            f"SELECT event_id, {', '.join(cols_sql)} FROM events "
            "ORDER BY event_id"
        ).fetchall()
    finally:
        con.close()

    assert len(got) == len(want)
    names = got[0].asDict().keys() if got else []
    for g, w in zip(got, want):
        gt = tuple(g.asDict().values())
        assert gt == tuple(w), (seed, dict(zip(names, gt)), w)
