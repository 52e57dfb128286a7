"""Slowly-changing-dimension (SCD2) temporal joins — facts vs versioned dims.

The standard warehouse shape: a dimension keeps every historical version
of a row with a validity interval ``[valid_from, valid_to]``, and facts
join to the version that was current *at the fact's own timestamp* —
``fact.ts BETWEEN dim.valid_from AND dim.valid_to``.  Plain equi-joins
get this wrong (they'd multiply facts by all versions); the correct form
is an equi-join on the business key plus an interval predicate.

The fixture has no versioned dimension, so the graded query *derives*
one deterministically: every customer gets two versions split at
1998-01-01, with the market segment renamed to ``<segment>/v2`` for
``c_custkey % 3 = 0`` customers in the second epoch (the others change
nothing — versions exist but are identical, exercising the no-op-change
case).  Plain CASE/date literals — identical SQL on both engines.

Scale notes (100 TB):

* The join is equi on the business key (custkey) with the interval
  predicate as a residual filter — Spark executes it as a hash join on
  the key with a post-filter, NOT a range/nested-loop join, because the
  equi conjunct dominates.  Facts and dim co-partition on the key.
* Version fan-out per key is small and bounded (dim versions per entity
  are rare events), so the residual filter multiplies nothing material.
* The as-of alternative (join_asof, C10) picks the LATEST version ≤ ts;
  SCD2 intervals express the same thing when ``valid_to`` chains are
  maintained closed-open — both shapes are in the graded surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded

_SPLIT = "1998-01-01 00:00:00"
_LO = "1900-01-01 00:00:00"
_HI = "2999-12-31 00:00:00"


def scd2_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each fact row to the dimension version valid at its timestamp.

    Equi-join on ``key`` + interval residual ``valid_from <= ts <
    valid_to`` (closed-open, so chained versions never double-match)."""
    return fact.join(dim, on=key, how="inner").filter(
        (F.col(valid_from) <= F.col(ts_col)) & (F.col(ts_col) < F.col(valid_to))
    )


def _versioned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SCD2 versions per customer, split at 1998-01-01 (see module doc)."""
    c = load(spark, "customer", sf_dir)
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.to_timestamp(F.lit(_LO)).alias("valid_from"),
        F.to_timestamp(F.lit(_SPLIT)).alias("valid_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.col("c_mktsegment"), F.lit("/v2")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.to_timestamp(F.lit(_SPLIT)).alias("valid_from"),
        F.to_timestamp(F.lit(_HI)).alias("valid_to"),
    )
    return v1.unionAll(v2)


@graded(
    "scd2_asof_revenue",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   TIMESTAMP '{_LO}' AS valid_from,
                   TIMESTAMP '{_SPLIT}' AS valid_to
            FROM customer
            UNION ALL
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment || '/v2'
                        ELSE c_mktsegment END AS segment,
                   TIMESTAMP '{_SPLIT}' AS valid_from,
                   TIMESTAMP '{_HI}' AS valid_to
            FROM customer
        )
        SELECT d.segment,
               count(*) AS n_orders,
               CAST(sum({cents_sql('o.o_totalprice')}) AS BIGINT) AS revenue_cents
        FROM orders o JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND d.valid_from <= o.o_orderdate AND o.o_orderdate < d.valid_to
        GROUP BY 1
    """,
    section="C9,C10,C4,D2",
    description="SCD2 temporal join: orders joined to the customer-segment "
    "version valid AT the order date (equi-join on key + closed-open "
    "interval residual); revenue by historical segment.  Every order "
    "matches exactly one version (tested)",
)
def scd2_asof_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderdate", "o_totalprice"
    )
    dim = _versioned_customers(spark, sf_dir)
    joined = scd2_join(orders, dim, "c_custkey", "o_orderdate")
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Multi-epoch SCD2: version chains longer than two
# ---------------------------------------------------------------------------

_EPOCH_BOUNDS = (_LO, "1995-01-01 00:00:00", "1996-07-01 00:00:00", _SPLIT, _HI)


def _multi_epoch_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four chained SCD2 versions per customer (epochs 0-3).

    Change rule per epoch e >= 1: customers with ``(c_custkey + e) % 3 = 0``
    get the segment renamed to ``<segment>/v<e>`` for that epoch only —
    so a single customer's chain mixes real changes, reversions to the
    base value, and no-op versions (the three shapes a long SCD2 chain
    exhibits in practice).
    """
    c = load(spark, "customer", sf_dir)
    versions = []
    for e in range(4):
        seg = F.col("c_mktsegment")
        if e >= 1:
            seg = F.when(
                (F.col("c_custkey") + e) % 3 == 0,
                F.concat(F.col("c_mktsegment"), F.lit(f"/v{e}")),
            ).otherwise(F.col("c_mktsegment"))
        versions.append(
            c.select(
                "c_custkey",
                F.lit(e).alias("epoch"),
                seg.alias("segment"),
                F.to_timestamp(F.lit(_EPOCH_BOUNDS[e])).alias("valid_from"),
                F.to_timestamp(F.lit(_EPOCH_BOUNDS[e + 1])).alias("valid_to"),
            )
        )
    out = versions[0]
    for v in versions[1:]:
        out = out.unionAll(v)
    return out


def _multi_epoch_dim_sql() -> str:
    parts = []
    for e in range(4):
        seg = (
            "c_mktsegment"
            if e == 0
            else f"CASE WHEN (c_custkey + {e}) % 3 = 0 "
            f"THEN c_mktsegment || '/v{e}' ELSE c_mktsegment END"
        )
        parts.append(
            f"SELECT c_custkey, {e} AS epoch, {seg} AS segment, "
            f"TIMESTAMP '{_EPOCH_BOUNDS[e]}' AS valid_from, "
            f"TIMESTAMP '{_EPOCH_BOUNDS[e + 1]}' AS valid_to FROM customer"
        )
    return " UNION ALL ".join(parts)


@graded(
    "scd2_multi_epoch",
    oracle=f"""
        WITH dim AS ({_multi_epoch_dim_sql()})
        SELECT d.epoch, d.segment,
               count(*) AS n_orders,
               CAST(sum({cents_sql('o.o_totalprice')}) AS BIGINT) AS revenue_cents
        FROM orders o JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND d.valid_from <= o.o_orderdate AND o.o_orderdate < d.valid_to
        GROUP BY 1, 2
    """,
    section="C9,C10,C4,D2",
    description="SCD2 with a 4-version chain per key (changes, reversions, "
    "and no-op versions): orders matched to the epoch valid at order date; "
    "revenue by (epoch, historical segment).  Closed-open intervals chain "
    "without double-matching — every order hits exactly one version",
)
def scd2_multi_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderdate", "o_totalprice"
    )
    dim = _multi_epoch_customers(spark, sf_dir)
    joined = scd2_join(orders, dim, "c_custkey", "o_orderdate")
    return joined.groupBy("epoch", "segment").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("revenue_cents"),
    )
