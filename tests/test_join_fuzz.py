"""Differential fuzz for join semantics (C4–C6), round-12 widening of the
§5.3.2 fuzz surface: seeded-random (join type, side filters, aggregate)
specs over the real orders⋈customer FK render into BOTH a Spark join
chain and DuckDB SQL and must agree exactly.

Null-handling is the point: right/full outer joins manufacture NULL keys
and NULL aggregand rows, semi/anti must ignore the right side's columns
entirely, and the post-join aggregate (count(*) vs count(col) vs integer-
cents sum) must treat those NULLs identically across engines.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from tests.conftest import SF_SMOKE

JOIN_TYPES = [
    ("inner", "JOIN"),
    ("left", "LEFT JOIN"),
    ("right", "RIGHT JOIN"),
    ("full", "FULL JOIN"),
    ("left_semi", "SEMI JOIN"),
    ("left_anti", "ANTI JOIN"),
]

# lambdas, not Columns: a Column literal at module scope would need an
# active SparkContext at import/collection time
O_FILTERS = [
    ("o_totalprice > 100000", lambda: F.col("o_totalprice") > 100000),
    ("o_orderstatus = 'F'", lambda: F.col("o_orderstatus") == "F"),
    ("o_orderkey % 3 = 0", lambda: F.col("o_orderkey") % 3 == 0),
    (None, None),
]
C_FILTERS = [
    ("c_acctbal > 0", lambda: F.col("c_acctbal") > 0),
    ("c_mktsegment = 'BUILDING'", lambda: F.col("c_mktsegment") == "BUILDING"),
    ("c_custkey % 2 = 0", lambda: F.col("c_custkey") % 2 == 0),
    (None, None),
]


@pytest.mark.parametrize("seed", range(10))
def test_random_joins_match_duckdb(spark, seed):
    rng = random.Random(9_100 + seed)
    jt_spark, jt_sql = rng.choice(JOIN_TYPES)
    of_sql, of_spark = rng.choice(O_FILTERS)
    cf_sql, cf_spark = rng.choice(C_FILTERS)
    semi_like = jt_spark in ("left_semi", "left_anti")

    orders = load(spark, "orders", SF_SMOKE)
    customer = load(spark, "customer", SF_SMOKE)
    if of_spark is not None:
        orders = orders.filter(of_spark())
    if cf_spark is not None:
        customer = customer.filter(cf_spark())

    joined = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"], jt_spark
    )
    if semi_like:
        got_df = joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(cents("o_totalprice")).alias("sum_cents"),
        )
    else:
        got_df = joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.count("c_custkey").alias("n_matched"),
            F.sum(cents("o_totalprice")).alias("sum_cents"),
            F.sum(cents("c_acctbal")).alias("sum_bal_cents"),
        )
    got = {
        r["o_orderpriority"]: tuple(r)[1:]
        for r in got_df.collect()
    }

    o_where = f"WHERE {of_sql}" if of_sql else ""
    c_where = f"WHERE {cf_sql}" if cf_sql else ""
    if semi_like:
        sql = f"""
            SELECT o_orderpriority, count(*) AS n,
                   CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) AS s
            FROM (SELECT * FROM orders {o_where}) o
            {jt_sql} (SELECT * FROM customer {c_where}) c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """
    else:
        sql = f"""
            SELECT o_orderpriority, count(*) AS n,
                   count(c_custkey) AS nm,
                   CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) AS s,
                   CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS sb
            FROM (SELECT * FROM orders {o_where}) o
            {jt_sql} (SELECT * FROM customer {c_where}) c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """
    con = duckdb.connect()
    try:
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{t}.parquet')"
            )
        want = {row[0]: tuple(row)[1:] for row in con.execute(sql).fetchall()}
    finally:
        con.close()

    assert got == want, (seed, jt_spark, of_sql, cf_sql)
