"""F-series: dataset profiling — content-addressed sharding and histograms.

Two operational primitives for the training-data pipeline:

* **f27 shard assignment** — deterministic, content-addressed assignment
  of documents to N output shards, plus the per-shard balance report.
  Hash-mod sharding is how a 100 TB corpus becomes N equal-ish training
  files; making it *content-addressed* (md5 of the key, not RNG or row
  order) means the assignment is stable under re-runs, repartitioning,
  and engine changes — the same property `sampling.py` exploits.
* **f28 histogram profile** — fixed-width numeric histograms as plain
  integer bucket arithmetic (``floor(x / width)``), the portable core of
  a data-profiling pass (no engine-specific ``width_bucket`` dialects).

Cross-engine determinism: the shard id is derived from the md5 hex
character of the key — string operations only (``substr`` +
``strpos``-style position lookup in a hex alphabet), identical on Spark
and DuckDB.  IEEE double division + ``floor`` over identical parquet
doubles is likewise bit-identical.

Scale notes (100 TB):

* Shard assignment is a scan-side projection (no shuffle).  The write
  path is ``df.repartition(n, "shard").write.partitionBy("shard")`` —
  one shuffle keyed by the (uniform, content-addressed) shard id, which
  is exactly the shuffle the output layout requires; the balance report
  is a map-side-combinable count.
* Histograms shuffle only (bucket, partial-count) pairs — bounded by
  bucket count, not data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.operators.parity import cents, cents_sql

_HEX = "0123456789abcdef"


def shard_assign(df: DataFrame, key, n_shards: int = 16) -> DataFrame:
    """Append a content-addressed ``shard`` column in ``[0, n_shards)``.

    Uses the first hex nibble(s) of ``md5(key)``: engine-portable (string
    ops only) and uniform.  ``n_shards`` must divide 16 or 256 so the
    nibble→shard map stays exact."""
    key_col = F.col(key) if isinstance(key, str) else key
    if 16 % n_shards == 0:
        nibble = F.instr(F.lit(_HEX), F.substring(F.md5(key_col.cast("string")), 1, 1)) - 1
        shard = nibble % n_shards
    elif 256 % n_shards == 0:
        hi = F.instr(F.lit(_HEX), F.substring(F.md5(key_col.cast("string")), 1, 1)) - 1
        lo = F.instr(F.lit(_HEX), F.substring(F.md5(key_col.cast("string")), 2, 1)) - 1
        shard = (hi * 16 + lo) % n_shards
    else:
        raise ValueError(f"n_shards={n_shards} must divide 16 or 256")
    return df.withColumn("shard", shard.cast("int"))


def shard_balance(df_with_shard: DataFrame, weight_col: str | None = None) -> DataFrame:
    """Per-shard balance report: row count (+ optional weight sum)."""
    aggs = [F.count("*").alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("total_weight"))
    return df_with_shard.groupBy("shard").agg(*aggs)


def histogram(df: DataFrame, col, width: float, value_alias: str = "bucket") -> DataFrame:
    """Fixed-width histogram: ``floor(col / width)`` → count per bucket."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.select(F.floor(c / F.lit(width)).cast("long").alias(value_alias))
        .groupBy(value_alias)
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Graded queries
# ---------------------------------------------------------------------------


@graded(
    "f27_shard_balance",
    oracle=f"""
        WITH sharded AS (
            SELECT doc_id, n_chars,
                   (strpos('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                   % 8 AS shard
            FROM documents
        )
        SELECT shard,
               count(*) AS n_rows,
               CAST(sum(n_chars) AS BIGINT) AS total_weight
        FROM sharded GROUP BY 1
    """,
    section="F14,C26,D8",
    description="content-addressed shard assignment (md5-nibble mod 8) with "
    "per-shard balance report — re-run/engine/topology-stable output "
    "sharding for training-file layout",
)
def f27_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "n_chars")
    sharded = shard_assign(docs, "doc_id", n_shards=8)
    return shard_balance(sharded, "n_chars").select(
        F.col("shard").cast("long").alias("shard"),
        "n_rows",
        F.col("total_weight").cast("long").alias("total_weight"),
    )


@graded(
    "f28_price_histogram",
    oracle=f"""
        SELECT CAST(floor(o_totalprice / 30000.0) AS BIGINT) AS bucket,
               count(*) AS n,
               min({cents_sql('o_totalprice')}) AS min_cents,
               max({cents_sql('o_totalprice')}) AS max_cents
        FROM orders GROUP BY 1
    """,
    section="C11,F10,D3",
    description="fixed-width histogram profile of order totals: portable "
    "floor-division bucketing with exact integer-cents bucket extrema "
    "(shuffle bounded by bucket count, not rows)",
)
def f28_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return (
        orders.select(
            F.floor(F.col("o_totalprice") / F.lit(30000.0)).cast("long").alias("bucket"),
            F.col("o_totalprice"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min(cents("o_totalprice")).alias("min_cents"),
            F.max(cents("o_totalprice")).alias("max_cents"),
        )
    )
