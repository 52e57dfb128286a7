"""Local streaming sources (SURVEY.md §2.A4): deterministic stand-ins that
produce message-shaped rows, because this environment has no Pulsar broker.

Both sources emit the ``events`` schema (the message model of SURVEY §1.1:
header columns + JSON ``props``), so every selector/verdict/window operator
runs unchanged under ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.session import configure

#: The message-stream schema (events fixture shape — FIXTURES.md).
EVENT_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

_EVENT_TYPES = "array('click','view','purchase','signup','error')"


def file_message_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-based message stream: parquet drops into ``input_dir`` become
    micro-batches — the deterministic test harness for E-series operators
    (new files are discovered per trigger, mirroring topic consumption)."""
    configure(spark)
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def rate_message_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate-source message stream: synthesizes message-shaped rows at a fixed
    rate — the load-generator stand-in (A4) for soak/throughput testing."""
    configure(spark)
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(
            F.expr(_EVENT_TYPES), (F.col("value") % 5 + 1).cast("int")
        ).alias("event_type"),
        (F.pmod(F.col("value") * 37, 200) + 0.5).cast("double").alias("value"),
        F.concat(
            F.lit('{"k": '), (F.col("value") % 100).cast("string"), F.lit("}")
        ).alias("props"),
    )
