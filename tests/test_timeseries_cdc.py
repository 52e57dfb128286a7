"""Tests for time-series gap-fill and CDC snapshot-diff/upsert operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.cdc import (
    cdc_snapshot_diff,
    snapshot_diff,
    upsert_latest,
)
from pulsar_message_filter_spark.operators.timeseries import (
    gapfill_hourly,
    timeseries_gapfill,
)
from tests.conftest import SF_SMOKE


def test_gapfill_dense_grid_and_zero_fill(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "a", 1.0),
            ("2024-01-01 03:20:00", "a", 2.0),
            ("2024-01-01 01:00:00", "b", 5.0),
        ],
        ["ts_s", "event_type", "value"],
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    rows = {(r.hour, r.event_type): r for r in gapfill_hourly(df).collect()}
    # spine: 4 hours x 2 types = 8 rows, no gaps
    assert len(rows) == 8
    # empty bucket: zero count, forward-filled value
    gap = rows[("2024-01-01 01:00:00", "a")]
    assert gap.n_events == 0 and gap.filled_cents == 100
    # before first observation: zero (nothing to carry)
    pre = rows[("2024-01-01 00:00:00", "b")]
    assert pre.n_events == 0 and pre.filled_cents == 0
    # new observation replaces the carried value
    late = rows[("2024-01-01 03:00:00", "a")]
    assert late.n_events == 1 and late.filled_cents == 200


def test_graded_gapfill_covers_full_calendar(spark):
    out = timeseries_gapfill(spark, SF_SMOKE).collect()
    types = {r.event_type for r in out}
    hours_per_type = len(out) / len(types)
    assert hours_per_type == int(hours_per_type)  # perfect grid
    assert all(r.n_events >= 0 and r.filled_cents >= 0 for r in out)
    ev = load(spark, "events", SF_SMOKE)
    assert sum(r.n_events for r in out) == ev.count()


def test_snapshot_diff_classifies_all_three(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 25), (3, "c", 30), (4, "d", 40)], ["k", "s", "v"]
    )
    out = {r.k: r.change for r in snapshot_diff(old, new, "k", ["s", "v"]).collect()}
    assert out == {1: "deleted", 2: "changed", 4: "inserted"}  # 3 unchanged → dropped


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k int, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    out = {r.k: r.change for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert out == {2: "changed"}  # NULL == NULL must not flag row 1


def test_graded_cdc_diff_counts(spark):
    orders = load(spark, "orders", SF_SMOKE)
    n_ins = orders.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 10 != 0)).count()
    n_del = orders.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 0)).count()
    rows = cdc_snapshot_diff(spark, SF_SMOKE).collect()
    by = {}
    for r in rows:
        by.setdefault(r.change, 0)
        by[r.change] += 1
    assert by["inserted"] == n_ins
    assert by["deleted"] == n_del
    assert by["changed"] > 0
    changed = [r for r in rows if r.change == "changed"]
    assert all(r.new_price_cents - r.old_price_cents == 100 for r in changed)


def test_rolling_zscore_exact_math_and_null_guards(spark):
    from pulsar_message_filter_spark.operators.timeseries import rolling_zscore

    rows = [("a", f"2024-01-{d:02d}", n) for d, n in
            [(1, 10), (2, 10), (3, 10), (4, 10), (5, 50)]]
    rows += [("b", f"2024-01-{d:02d}", 7) for d in range(1, 6)]  # constant: var 0
    daily = spark.createDataFrame(rows, ["event_type", "day", "n"])
    out = {(r.event_type, r.day): r.z for r in
           rolling_zscore(daily, "event_type", "day").collect()}
    # first two rows: fewer than min_obs trailing points
    assert out[("a", "2024-01-01")] is None and out[("a", "2024-01-03")] is None
    # spike day: trailing = [10,10,10,10] -> mean 10, var 0 -> NULL (guard)
    assert out[("a", "2024-01-05")] is None
    # constant series: variance 0 everywhere
    assert all(v is None for (t, _), v in out.items() if t == "b")
    # non-degenerate check: make day-4 computable with real variance
    daily2 = spark.createDataFrame(
        [("a", "2024-01-01", 10), ("a", "2024-01-02", 14),
         ("a", "2024-01-03", 12), ("a", "2024-01-04", 30)],
        ["event_type", "day", "n"],
    )
    z = {r.day: r.z for r in rolling_zscore(daily2, "event_type", "day").collect()}
    import math
    mean, var = 12.0, 4.0  # trailing [10,14,12]: mean 12, sample var 4
    assert abs(z["2024-01-04"] - (30 - mean) / math.sqrt(var)) < 1e-12


def test_graded_anomaly_zscore_warmup_nulls(spark):
    from pulsar_message_filter_spark.operators.timeseries import (
        anomaly_rolling_zscore,
    )

    rows = anomaly_rolling_zscore(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        # warm-up: fewer than 3 trailing points -> NULL z
        assert series[0].z is None and series[1].z is None and series[2].z is None
        assert any(r.z is not None for r in series[3:])


def test_upsert_latest_picks_highest_version(spark):
    log = spark.createDataFrame(
        [(1, 1, "v1"), (1, 3, "v3"), (1, 2, "v2"), (2, 1, "w1")],
        ["k", "version", "payload"],
    )
    out = {r.k: r.payload for r in upsert_latest(log, "k", "version").collect()}
    assert out == {1: "v3", 2: "w1"}


def test_table_checksum_detects_single_row_change(spark):
    from pulsar_message_filter_spark.operators.cdc import table_checksum

    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )
    tampered = base.withColumn(
        "v", F.when(F.col("id") == 500, F.col("v") + 1).otherwise(F.col("v"))
    )
    a = table_checksum(base, ["id", "v"]).collect()[0]
    b = table_checksum(tampered, ["id", "v"]).collect()[0]
    assert a.n_rows == b.n_rows == 1000
    assert a.checksum != b.checksum
    # order-insensitive: a reshuffled replica fingerprints identically
    c = table_checksum(base.repartition(7), ["id", "v"]).collect()[0]
    assert c.checksum == a.checksum


def test_trend_slope_recovers_synthetic_line(spark):
    from pulsar_message_filter_spark.operators.timeseries import (
        _TREND_ANCHOR_H,
        timeseries_trend_slope,
    )

    rows = timeseries_trend_slope(spark, SF_SMOKE).collect()
    assert rows and all(r.n > 0 for r in rows)
    # cross-check one group against numpy's lstsq on the same exact inputs
    import numpy as np

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.parity import cents

    events = load(spark, "events", SF_SMOKE)
    t0 = rows[0].event_type
    pdf = (
        events.filter(F.col("event_type") == t0)
        .select(
            ((F.unix_timestamp("ts") / 3600).cast("long") - _TREND_ANCHOR_H).alias("x"),
            cents("value").alias("y"),
        )
        .toPandas()
    )
    slope, intercept = np.polyfit(pdf["x"], pdf["y"], 1)
    got = {r.event_type: r for r in rows}[t0]
    assert abs(got.slope_cents_per_hour - slope) < 1e-3
    assert abs(got.intercept_cents - intercept) < 1.0
