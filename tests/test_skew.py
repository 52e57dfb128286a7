"""Salted aggregation (F14): exactness under the two-stage rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.skew import salted_agg
from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    events = load(spark, "events", SF_SMOKE)
    direct = {
        (r.event_type): (r.n, round(r.total, 2), r.mx)
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.total, 2), r.mx)
        for r in salted_agg(
            events,
            ["event_type"],
            {
                "n": ("sum", F.count("*")),
                "total": ("sum", F.sum("value")),
                "mx": ("max", F.max("value")),
            },
            n_salts=8,
            salt_source="event_id",
        ).collect()
    }
    assert direct == salted


def test_salted_agg_spreads_hot_key(spark):
    """The partial stage must actually split the hot key across salts."""
    events = load(spark, "events", SF_SMOKE)
    partial = (
        events.withColumn("__salt", F.pmod(F.xxhash64("event_id"), 8))
        .groupBy("event_type", "__salt")
        .count()
    )
    per_key = partial.groupBy("event_type").count().collect()
    assert all(r["count"] == 8 for r in per_key)  # every key uses all 8 salts
