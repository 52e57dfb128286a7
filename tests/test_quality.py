"""Tests for data-quality constraints and path-transition analysis."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.behavior import path_transitions
from pulsar_message_filter_spark.operators.quality import (
    dq_violation_report,
    duplicate_keys,
    fk_orphans,
    violation_counts,
)
from tests.conftest import SF_SMOKE


def test_violation_counts_one_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "k int, v double"
    )
    row = violation_counts(
        df, {"neg_v": F.col("v") < 0, "null_v": F.col("v").isNull()}
    ).collect()[0]
    assert row.neg_v == 1 and row.null_v == 1


def test_duplicate_keys_and_orphans(spark):
    fact = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1), (3, 9)], ["k", "fk"]
    )
    dim = spark.createDataFrame([(1,), (2,)], ["pk"])
    dups = duplicate_keys(fact, ["k", "fk"]).collect()
    assert len(dups) == 1 and dups[0].n == 2
    orphans = fk_orphans(fact, "fk", dim, "pk").collect()
    assert [r.k for r in orphans] == [3]


def test_graded_dq_report_matches_fixture_reality(spark):
    row = dq_violation_report(spark, SF_SMOKE).collect()[0]
    # range/null/FK rules are clean on the driver fixtures…
    assert row.bad_quantity == 0
    assert row.bad_discount == 0
    assert row.null_shipdate == 0
    assert row.price_lt_qty == 0
    assert row.orphan_orderkeys == 0
    # …but (l_orderkey, l_linenumber) is genuinely NOT unique in the
    # synthetic lineitem — the report surfaces a real data characteristic,
    # which is exactly its job.  Cross-check against a direct recount.
    li = load(spark, "lineitem", SF_SMOKE)
    expect = (
        li.groupBy("l_orderkey", "l_linenumber")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert row.duplicate_line_keys == expect > 0


def test_path_transitions_probabilities_normalize(spark):
    rows = path_transitions(spark, SF_SMOKE).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p
        assert r.n > 0 and 0 < r.p <= 1
    for total in by_src.values():
        assert abs(total - 1.0) < 1e-9
    ev = load(spark, "events", SF_SMOKE)
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == ev.count() - n_users  # one less pair per user


def test_throttle_batch_verdicts_deterministic(spark):
    from pulsar_message_filter_spark.operators.throttle import (
        throttle_per_key_window,
        throttle_per_user_hour,
    )

    events = load(spark, "events", SF_SMOKE)
    tagged = throttle_per_key_window(events, "user_id", "ts", "event_id", 3)
    # per (user, hour): at most 3 ACCEPTs, and ACCEPTs are the earliest rows
    agg = (
        tagged.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(F.when(F.col("verdict") == "ACCEPT", 1).otherwise(0)).alias("acc"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    for r in agg:
        assert r.acc == min(3, r.n)
    out1 = sorted(map(tuple, throttle_per_user_hour(spark, SF_SMOKE).collect()))
    out2 = sorted(map(tuple, throttle_per_user_hour(spark, SF_SMOKE).collect()))
    assert out1 == out2
