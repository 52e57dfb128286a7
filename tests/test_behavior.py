"""Tests for behavioral analytics (cohort retention / first-touch attribution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.behavior import (
    attribution_first_touch,
    cohort_retention,
)
from pulsar_message_filter_spark.operators.parity import cents
from tests.conftest import SF_SMOKE


def test_cohort_day_zero_is_full_cohort(spark):
    rows = cohort_retention(spark, SF_SMOKE).collect()
    zero = [r for r in rows if r.day_offset == 0]
    assert zero, "every cohort must have an offset-0 row"
    for r in zero:
        assert r.n_active == r.cohort_size
        assert r.retention == 1.0
    assert all(0 < r.n_active <= r.cohort_size for r in rows)
    assert all(r.day_offset >= 0 for r in rows)


def test_cohort_sizes_partition_users(spark):
    events = load(spark, "events", SF_SMOKE)
    n_users = events.select("user_id").distinct().count()
    rows = cohort_retention(spark, SF_SMOKE).collect()
    sizes = {r.cohort_day: r.cohort_size for r in rows}
    assert sum(sizes.values()) == n_users


def test_attribution_linear_credit_bounded_by_revenue(spark):
    from pulsar_message_filter_spark.operators.behavior import attribution_linear

    events = load(spark, "events", SF_SMOKE)
    purchases = events.filter(F.col("event_type") == "purchase")
    # only purchases with >=1 prior touch contribute credit
    rows = attribution_linear(spark, SF_SMOKE).collect()
    assert rows
    total_credit = sum(r.credit_millicents for r in rows)
    total_revenue_mc = (
        purchases.agg(F.sum(cents("value") * 1000)).collect()[0][0]
    )
    # integer splitting loses at most (n_touches - 1) millicents per purchase
    assert 0 < total_credit <= total_revenue_mc
    assert {r.channel for r in rows} <= {"click", "view", "signup", "error"}


def test_attribution_conserves_purchases_and_revenue(spark):
    events = load(spark, "events", SF_SMOKE)
    purchases = events.filter(F.col("event_type") == "purchase")
    expect_n = purchases.count()
    expect_cents = purchases.agg(F.sum(cents("value"))).collect()[0][0]
    rows = attribution_first_touch(spark, SF_SMOKE).collect()
    assert sum(r.n_purchases for r in rows) == expect_n
    assert sum(r.revenue_cents for r in rows) == expect_cents
    types = {r[0] for r in events.select("event_type").distinct().collect()}
    assert {r.first_touch for r in rows} <= types
