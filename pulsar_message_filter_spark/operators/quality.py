"""Data-quality constraint checking — declarative expectations, exact reports.

The operational guardrail every 100 TB ingest runs before publishing a
table: assert key uniqueness, non-nullness, value ranges, and referential
integrity, and emit an exact violation report (not a sample) that either
gates the publish or routes to the DLQ path (SURVEY.md §2 A6/B13 analog
for batch).

Design: each expectation compiles to ONE aggregate expression over a
single pass (``sum(case when violated)``), so checking ten constraints
costs one scan — not ten.  Referential integrity is the exception: it is
an anti-join per foreign key (shuffle- or broadcast-keyed by the FK, the
engine picks via AQE/statistics).

Cross-engine parity: violation counts are exact int64s.

Scale notes (100 TB):

* ``check_constraints`` is a single full-scan aggregation — map-side
  combinable, output one row.  No shuffle beyond the final 1-row merge.
* ``fk_orphans`` anti-joins fact→dim; dims broadcast when small (the
  normal case), otherwise the join co-partitions on the FK.
* Uniqueness is the only constraint that genuinely shuffles (count per
  key > 1): keyed by the candidate key, uniform by construction when the
  key is near-unique — the skew case IS the violation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def violation_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-pass violation report: ``checks`` maps a rule name to a boolean
    Column that is true when the row VIOLATES the rule.  Output: one row,
    one int64 violation count per rule."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once (uniqueness violations), with counts."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
    """Fact rows whose foreign key has no match in the dimension
    (referential-integrity violations) — anti-join keyed by the FK."""
    return fact.join(dim.select(F.col(pk).alias(fk)), on=fk, how="left_anti")


@graded(
    "dq_violation_report",
    oracle="""
        WITH scan AS (
            SELECT
                CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
                CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
                CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate,
                CAST(sum(CASE WHEN l_extendedprice < l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS price_lt_qty
            FROM lineitem
        ),
        orphans AS (
            SELECT CAST(count(*) AS BIGINT) AS orphan_orderkeys
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL
        ),
        dup_keys AS (
            SELECT CAST(count(*) AS BIGINT) AS duplicate_line_keys FROM (
                SELECT l_orderkey, l_linenumber
                FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
            )
        )
        SELECT scan.*, orphans.orphan_orderkeys, dup_keys.duplicate_line_keys
        FROM scan, orphans, dup_keys
    """,
    section="C6,C11,D4",
    description="declarative data-quality report: four range/null rules in "
    "one scan-pass aggregate + FK-orphan anti-join + composite-key "
    "uniqueness check; exact int64 violation counts",
)
def dq_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    scan = violation_counts(
        li,
        {
            "bad_quantity": F.col("l_quantity") <= 0,
            "bad_discount": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
            "null_shipdate": F.col("l_shipdate").isNull(),
            "price_lt_qty": F.col("l_extendedprice") < F.col("l_quantity"),
        },
    )
    orphans = fk_orphans(li, "l_orderkey", orders, "o_orderkey").agg(
        F.count("*").cast("long").alias("orphan_orderkeys")
    )
    dups = duplicate_keys(li, ["l_orderkey", "l_linenumber"]).agg(
        F.count("*").cast("long").alias("duplicate_line_keys")
    )
    return scan.crossJoin(orphans).crossJoin(dups)
