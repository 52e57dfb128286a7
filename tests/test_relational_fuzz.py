"""Differential fuzz for the relational core (SURVEY.md §5.3.2, widened
beyond the selector grammar): seeded-random filter/aggregate specs are
rendered from ONE spec into BOTH a Spark DataFrame chain and DuckDB SQL,
then compared exactly.  Catches operator-semantics drift the handcrafted
oracles don't reach (comparison edge values, AND/OR nesting, group-key
combinations) — all on exact integers, so any mismatch is a real bug,
never float noise.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from tests.conftest import SF_SMOKE

# predicate atoms: (spark_column_builder, sql_text) from one literal pool
NUM_COLS = [("l_quantity", 1, 50), ("l_discount", 0.0, 0.1), ("l_extendedprice", 1000, 100000)]
STR_COLS = [("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["F", "O"])]
DATE_LITS = ["1996-01-01", "1997-06-01", "1999-01-01", "2000-06-01"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
OPS = [("<", lambda c, v: c < v), ("<=", lambda c, v: c <= v), (">", lambda c, v: c > v),
       (">=", lambda c, v: c >= v), ("=", lambda c, v: c == v), ("<>", lambda c, v: c != v)]


def _rand_atom(rng: random.Random):
    kind = rng.choice(["num", "str", "date", "in"])
    if kind == "num":
        col, lo, hi = rng.choice(NUM_COLS)
        op_txt, op_fn = rng.choice(OPS)
        v = round(rng.uniform(lo, hi), 2)
        return op_fn(F.col(col), v), f"{col} {op_txt} {v}"
    if kind == "str":
        col, vals = rng.choice(STR_COLS)
        op_txt, op_fn = rng.choice(OPS[4:])  # = / <>
        v = rng.choice(vals)
        return op_fn(F.col(col), v), f"{col} {op_txt} '{v}'"
    if kind == "date":
        v = rng.choice(DATE_LITS)
        op_txt, op_fn = rng.choice(OPS[:4])
        return (
            op_fn(F.col("l_shipdate"), v),
            f"l_shipdate {op_txt} TIMESTAMP '{v} 00:00:00'",
        )
    col, vals = rng.choice(STR_COLS)
    chosen = rng.sample(vals, rng.randint(1, len(vals)))
    in_list = ", ".join(f"'{v}'" for v in chosen)
    return F.col(col).isin(chosen), f"{col} IN ({in_list})"


def _rand_predicate(rng: random.Random):
    n = rng.randint(1, 4)
    col_pred, sql = _rand_atom(rng)
    for _ in range(n - 1):
        c2, s2 = _rand_atom(rng)
        if rng.random() < 0.5:
            col_pred, sql = col_pred & c2, f"({sql}) AND ({s2})"
        else:
            col_pred, sql = col_pred | c2, f"({sql}) OR ({s2})"
    return col_pred, sql


@pytest.mark.parametrize("seed", range(4))
def test_random_filter_aggregates_match_duckdb(spark, seed):
    rng = random.Random(1000 + seed)
    li = load(spark, "lineitem", SF_SMOKE)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    )
    for _ in range(10):
        pred, sql_pred = _rand_predicate(rng)
        if rng.random() < 0.5:
            keys = rng.sample(GROUP_COLS, rng.randint(1, 2))
            got = {
                tuple(r[k] for k in keys): (r.n, r.qc)
                for r in li.filter(pred)
                .groupBy(*keys)
                .agg(F.count("*").alias("n"), F.sum(cents("l_quantity")).alias("qc"))
                .collect()
            }
            want = {
                tuple(row[: len(keys)]): (row[-2], row[-1])
                for row in con.execute(
                    f"SELECT {', '.join(keys)}, CAST(count(*) AS BIGINT), "
                    f"CAST(sum({cents_sql('l_quantity')}) AS BIGINT) "
                    f"FROM lineitem WHERE {sql_pred} GROUP BY {', '.join(keys)}"
                ).fetchall()
            }
        else:
            r = (
                li.filter(pred)
                .agg(F.count("*").alias("n"), F.sum(cents("l_extendedprice")).alias("pc"))
                .collect()[0]
            )
            got = (r.n, r.pc)
            want = tuple(
                con.execute(
                    f"SELECT CAST(count(*) AS BIGINT), "
                    f"CAST(sum({cents_sql('l_extendedprice')}) AS BIGINT) "
                    f"FROM lineitem WHERE {sql_pred}"
                ).fetchall()[0]
            )
        assert got == want, f"mismatch for: {sql_pred}"


def test_agg_corr_exact_bounds_and_signs(spark):
    from pulsar_message_filter_spark.operators.relational import agg_corr_exact
    from tests.conftest import SF_SMOKE

    rows = agg_corr_exact(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        # cov and corr must agree in sign (corr = cov / positive stds)
        assert (r.corr > 0) == (r.cov_pop > 0)
