"""Pulsar connector wiring (SURVEY.md §2.A3/A5) — documented and gated.

The public pulsar–spark connector (``io.streamnative.connectors:pulsar-spark-connector``)
exposes ``format("pulsar")`` with the DataFrame schema
``key, value, topic, properties, publishTime, eventTime, …`` — exactly the
message model in SURVEY §1.1.  This environment ships neither a broker nor
the connector jar, so these builders *construct* the reader/writer and fail
fast with an actionable error if the format is unavailable; everything
downstream (selectors, verdict routing, windows) is connector-agnostic and
is exercised through the A4 stand-ins instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.readwriter import DataStreamReader


def pulsar_stream_reader(
    spark: SparkSession,
    service_url: str,
    topics: str,
    admin_url: str | None = None,
    start: str = "earliest",
) -> DataStreamReader:
    """readStream builder for a Pulsar topic subscription (A3).

    Usage on a cluster with the connector jar::

        df = pulsar_stream_reader(spark, "pulsar://broker:6650", "events").load()
        normalized = normalize_pulsar_frame(df)
    """
    reader = (
        spark.readStream.format("pulsar")
        .option("service.url", service_url)
        .option("topics", topics)
        .option("startingOffsets", start)
    )
    if admin_url:
        reader = reader.option("admin.url", admin_url)
    return reader


def normalize_pulsar_frame(df: DataFrame) -> DataFrame:
    """Map the connector's frame to the engine's message schema: the
    ``properties`` map is serialized to the JSON ``props`` column the
    selector compiler resolves against (B9).

    ``event_id`` must be *deterministic across replays* — downstream E4
    stream dedup keys on it, and a replayed micro-batch (at-least-once
    source) must produce the same ids or dedup silently fails.  The
    connector's ``messageId`` (broker-assigned ledger/entry id, stable per
    message) is the preferred identity; when absent the id is a content/
    metadata hash.  ``monotonically_increasing_id`` is NOT used: it depends
    on partition layout and task attempt, so it differs across restarts.
    """
    if "messageId" in df.columns:
        event_id = F.xxhash64("messageId").alias("event_id")
    else:
        event_id = F.xxhash64("topic", "key", "eventTime", "value").alias("event_id")
    return df.select(
        event_id,
        F.col("eventTime").alias("ts"),
        F.xxhash64("key").alias("user_id"),
        F.col("topic").alias("event_type"),
        F.length("value").cast("double").alias("value"),
        F.to_json("properties").alias("props"),
    )


def pulsar_sink_writer(df: DataFrame, service_url: str, topic: str):
    """writeStream builder targeting a Pulsar topic (A5) — the ACCEPT-forward
    leg of verdict routing; REJECT goes to a DLQ topic the same way."""
    return (
        df.writeStream.format("pulsar")
        .option("service.url", service_url)
        .option("topic", topic)
    )
