"""Differential fuzz for set operations (C23/C24) — the fourth fuzz
family next to selectors, windows, joins, and aggregates: seeded-random
chains of UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] over overlapping
event slices render from ONE spec into both a DataFrame chain and DuckDB
SQL, then compare as exact multisets.

Why set ops deserve a generator: the DISTINCT/ALL axis changes
MULTIPLICITY semantics (bag intersection keeps min(m_a, m_b) copies, bag
difference subtracts multiplicities), left-deep association changes
results for mixed chains, and NULL rows participate in set-op equality
(unlike join equality) — three semantic edges a hand-written oracle pair
can silently agree on getting wrong.

Determinism: every projected column is an exact integer or string, so
multiset compare needs no float tolerance; slices overlap by
construction so intersections/differences are non-trivial.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from tests.conftest import SF_SMOKE

# Overlapping slices: every pair of relations shares rows (value bands
# overlap, user bands overlap) so INTERSECT/EXCEPT are non-trivial.
SLICES = [
    ("value < 120", lambda: F.col("value") < 120),
    ("value > 60", lambda: F.col("value") > 60),
    ("user_id % 2 = 0", lambda: F.col("user_id") % 2 == 0),
    ("event_type IN ('click','view','error')",
     lambda: F.col("event_type").isin("click", "view", "error")),
]

# (spark_method, sql_keyword).  Spark: union == UNION ALL; UNION DISTINCT
# = union().distinct(); intersect/exceptAll etc. map 1:1.
OPS = [
    ("union_all", "UNION ALL"),
    ("union", "UNION"),
    ("intersect", "INTERSECT"),
    ("intersect_all", "INTERSECT ALL"),
    ("except_", "EXCEPT"),
    ("except_all", "EXCEPT ALL"),
]


def _apply(op: str, a, b):
    if op == "union_all":
        return a.unionByName(b)
    if op == "union":
        return a.unionByName(b).distinct()
    if op == "intersect":
        return a.intersect(b)
    if op == "intersect_all":
        return a.intersectAll(b)
    if op == "except_":
        return a.subtract(b)
    return a.exceptAll(b)


def _run_spec(spark, seed: int) -> int:
    rng = random.Random(11_000 + seed)
    ev = load(spark, "events", SF_SMOKE)

    # shared projection: two exact columns + one NULLABLE column so NULL
    # rows exercise set-op equality (NULL == NULL for set ops)
    proj_spark = [
        F.col("event_type"),
        cents("value").alias("v_cents"),
        F.when(F.col("user_id") % 5 == 0, F.col("user_id")).alias("u5"),
    ]
    proj_sql = (
        f"event_type, {cents_sql('value')} AS v_cents, "
        "CASE WHEN user_id % 5 = 0 THEN user_id END AS u5"
    )

    picks = [rng.choice(SLICES) for _ in range(3)]
    rels_spark = [ev.filter(p[1]()).select(*proj_spark) for p in picks]
    rels_sql = [f"(SELECT {proj_sql} FROM events WHERE {p[0]})" for p in picks]

    op1 = rng.choice(OPS)
    op2 = rng.choice(OPS)
    left_deep = rng.random() < 0.5

    if left_deep:  # (A op1 B) op2 C — SQL set ops are left-associative
        got_df = _apply(op2[0], _apply(op1[0], rels_spark[0], rels_spark[1]),
                        rels_spark[2])
        sql = (
            f"SELECT * FROM ({rels_sql[0]} {op1[1]} {rels_sql[1]}) "
            f"{op2[1]} {rels_sql[2]}"
        )
    else:  # A op1 (B op2 C)
        got_df = _apply(op1[0], rels_spark[0],
                        _apply(op2[0], rels_spark[1], rels_spark[2]))
        sql = (
            f"{rels_sql[0]} {op1[1]} "
            f"(SELECT * FROM ({rels_sql[1]} {op2[1]} {rels_sql[2]}))"
        )

    got = sorted((tuple(r) for r in got_df.collect()), key=repr)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet')"
        )
        want = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=repr)
    finally:
        con.close()

    assert got == want, (seed, op1, op2, left_deep, len(got), len(want), sql)
    return len(got)


@pytest.mark.parametrize("seed", range(20))
def test_random_setop_chains_match_duckdb(spark, seed):
    _run_spec(spark, seed)
