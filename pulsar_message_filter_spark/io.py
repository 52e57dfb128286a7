"""Fixture loaders — parquet in, normalized DataFrames out.

The ten driver-generated tables (TESTDATA.md, FIXTURES.md) are the engine's
batch inputs; ``events`` doubles as the message-stream analog (SURVEY.md
§1.2).  The loader owns the two type quirks so no query ever sees them:

1. ``events.ts`` is parquet ``TIMESTAMP(NANOS)`` → read as bigint epoch-nanos
   (with the nanosAsLong conf), then truncated to microseconds with integer
   division (``ts div 1000``) — exact, no double round-trip — and converted
   to ``TimestampType``.  The DuckDB oracle reads the same column natively as
   ``TIMESTAMP_NS``; truncation to µs matches ``epoch_us()`` semantics.
2. ``o_orderdate`` / ``l_shipdate`` arrive as ``timestamp_ntz`` and are left
   untouched (tz-naive on both engines — FIXTURES.md quirk 2).

At 100 TB these reads become partitioned scans over object storage; nothing
here collects to the driver, and the per-table normalization is a pure
column projection that fuses into the scan stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.session import configure

#: The ten fixture tables (TESTDATA.md; driver registers same-named DuckDB views).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table with type normalization applied."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # bigint epoch-nanos → µs (exact integer division) → TimestampType.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table; keys match the DuckDB oracle view names."""
    return {name: load(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so ``spark.sql`` queries mirror the
    oracle's view names exactly."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
