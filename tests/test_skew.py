"""Salted aggregation/join (F14): exactness under the skew rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.skew import salted_agg, salted_join
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


def _multiset(rows, cols):
    out: dict[tuple, int] = {}
    for r in rows:
        k = tuple(r[c] for c in cols)
        out[k] = out.get(k, 0) + 1
    return out


def test_salted_join_matches_plain_inner(spark):
    """Inner salted join must preserve exact row multiplicity (dup small keys)."""
    events = load(spark, "events", SF_SMOKE)
    # small side with DUPLICATE keys: two rows per event_type → each event
    # row must appear twice in the join, salted or not.
    small = spark.createDataFrame(
        [(t, v) for t in ["click", "error", "purchase"] for v in (1, 2)],
        ["event_type", "variant"],
    )
    cols = ["event_id", "event_type", "variant"]
    plain = _multiset(events.join(small, "event_type").select(*cols).collect(), cols)
    salted = _multiset(
        salted_join(events, small, on=["event_type"], n_salts=8).select(*cols).collect(),
        cols,
    )
    assert plain == salted and len(plain) > 0


def test_salted_join_matches_plain_left(spark):
    """Left join: unmatched skewed-side rows survive exactly once."""
    events = load(spark, "events", SF_SMOKE)
    small = spark.createDataFrame([("click", 1)], ["event_type", "variant"])
    cols = ["event_id", "variant"]
    plain = _multiset(
        events.join(small, "event_type", "left").select(*cols).collect(), cols
    )
    salted = _multiset(
        salted_join(events, small, on=["event_type"], how="left", n_salts=8)
        .select(*cols)
        .collect(),
        cols,
    )
    assert plain == salted
    assert any(k[1] is None for k in plain)  # unmatched rows exercised


def test_salted_join_rejects_outer_modes(spark):
    events = load(spark, "events", SF_SMOKE)
    small = spark.createDataFrame([("click", 1)], ["event_type", "variant"])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(events, small, on=["event_type"], how="full")


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's first line of defense for skewed joins is AQE: a hot key
    whose partition exceeds the skew threshold must be SPLIT at runtime
    ('AQEShuffleRead ... skewed' in the final adaptive plan) and still join
    correctly.  salted_join (tested above) is the manual fallback for when
    one key outgrows even the split model."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of 300k rows share key 0, with an incompressible payload so
        # the hot partition's shuffle bytes actually exceed the threshold
        big = spark.range(300_000).select(
            F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        small = spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = big.join(small, "k").select(
            F.count("*").alias("n"), F.sum(F.length("payload")).alias("payload_bytes")
        )
        row = j.collect()[0]
        # matched rows: key 0 = the 285,000 non-multiples of 20 plus id=0
        # itself; other surviving keys are multiples of 20 below 2,000
        expected = 285_000 + 1 + sum(1 for i in range(20, 2_000, 20))
        assert row.n == expected and row.payload_bytes == expected * 64
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must occupy every salt bucket."""
    events = load(spark, "events", SF_SMOKE)
    small = spark.createDataFrame([("click", 1)], ["event_type", "variant"])
    joined = salted_join(events, small, on=["event_type"], n_salts=8)
    # re-derive the salt distribution from the pre-drop plan: run the same
    # salting expression standalone
    n_buckets = (
        events.filter(F.col("event_type") == "click")
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.col("event_type")), 8),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_buckets == 8
    assert joined.count() == events.filter(F.col("event_type") == "click").count()
