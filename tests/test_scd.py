"""Tests for SCD2 temporal joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.scd import (
    scd2_asof_revenue,
    scd2_join,
)
from tests.conftest import SF_SMOKE


def test_scd2_join_picks_exactly_one_version(spark):
    dim = spark.createDataFrame(
        [
            (1, "a-v1", "2020-01-01", "2021-01-01"),
            (1, "a-v2", "2021-01-01", "2999-01-01"),
            (2, "b-v1", "2020-01-01", "2999-01-01"),
        ],
        ["k", "attr", "f", "t"],
    ).select(
        "k", "attr",
        F.to_timestamp("f").alias("valid_from"),
        F.to_timestamp("t").alias("valid_to"),
    )
    fact = spark.createDataFrame(
        [
            (10, 1, "2020-06-01"),  # inside v1
            (11, 1, "2021-01-01"),  # ON the boundary: closed-open -> v2 only
            (12, 2, "2025-01-01"),
        ],
        ["fid", "k", "d"],
    ).select("fid", "k", F.to_timestamp("d").alias("ts"))
    out = {r.fid: r.attr for r in scd2_join(fact, dim, "k", "ts").collect()}
    assert out == {10: "a-v1", 11: "a-v2", 12: "b-v1"}


def test_graded_scd2_every_order_matches_once(spark):
    orders = load(spark, "orders", SF_SMOKE)
    rows = scd2_asof_revenue(spark, SF_SMOKE).collect()
    # closed-open chained intervals: total joined rows == total orders
    assert sum(r.n_orders for r in rows) == orders.count()
    # both epochs are represented (orders span the 1998 split)
    assert any(r.segment.endswith("/v2") for r in rows)
    assert any(not r.segment.endswith("/v2") for r in rows)


def test_scd2_multi_epoch_partitions_orders_exactly_once(spark):
    from pulsar_message_filter_spark.operators.scd import (
        _multi_epoch_customers,
        scd2_multi_epoch,
    )

    rows = scd2_multi_epoch(spark, SF_SMOKE).collect()
    n_orders = load(spark, "orders", SF_SMOKE).count()
    # chained closed-open intervals: every order matched exactly once
    assert sum(r.n_orders for r in rows) == n_orders
    # smoke orders all post-date 1995, so epoch 0 may legitimately be empty
    epochs = {r.epoch for r in rows}
    assert epochs <= {0, 1, 2, 3} and {1, 2, 3} <= epochs
    # epoch-tagged segments only appear in their own epoch
    for r in rows:
        if "/v" in r.segment:
            assert r.segment.endswith(f"/v{r.epoch}")
    # version chains really chain: each customer's 4 versions tile [LO, HI)
    dim = _multi_epoch_customers(spark, SF_SMOKE)
    bad = (
        dim.alias("a")
        .join(dim.alias("b"), "c_custkey")
        .filter(F.col("a.epoch") + 1 == F.col("b.epoch"))
        .filter(F.col("a.valid_to") != F.col("b.valid_from"))
        .count()
    )
    assert bad == 0
