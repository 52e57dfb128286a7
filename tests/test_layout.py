"""Data-layout contracts: range-partitioned file skipping and bucketed
shuffle-free joins — the write-side half of the 100 TB design, proven
against parquet footers and physical plans instead of asserted by faith."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.layout import (
    bucketed_join,
    file_value_bounds,
    write_bucketed,
    write_range_partitioned,
)
from tests.conftest import SF_SMOKE


def test_range_partitioned_files_tile_disjoint_bands(spark, tmp_path):
    li = load(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    path = str(tmp_path / "li_ranged")
    write_range_partitioned(li, path, "l_orderkey", n_files=6)

    bounds = [b for b in file_value_bounds(path, "l_orderkey") if b[1] is not None]
    assert len(bounds) >= 4
    # files tile the key space: sorted by min, each file's max < next file's min
    bounds.sort(key=lambda b: b[1])
    for (_, _, hi), (_, lo2, _) in zip(bounds, bounds[1:]):
        assert hi <= lo2, "range files must not overlap"

    # a narrow predicate matches only a small fraction of files on stats
    target = bounds[0][2]  # first file's max key
    matching = [b for b in bounds if b[1] <= target <= b[2]]
    assert len(matching) <= 2, "narrow key predicate should skip most files"
    # and the data still round-trips completely
    assert spark.read.parquet(path).count() == li.count()


def test_bucketed_join_has_no_shuffle_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, "orders", SF_SMOKE).select("o_orderkey", "o_custkey")
        li = load(spark, "lineitem", SF_SMOKE).select("l_orderkey", "l_quantity")
        write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=4)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "t_lineitem_b",
            "o_orderkey",
            n_buckets=4,
        )
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "same-bucketed tables must join without a shuffle:\n" + plan
        )
        # and the join result matches the plain (shuffled) join
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zorder_value_interleaves_bits():
    from pulsar_message_filter_spark.layout import zorder_value

    # morton(x=0b11, y=0b01) = y1 x1 y0 x0 = 0 1 1 1 = 7
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    row = (
        spark.createDataFrame([(3, 1)], ["a", "b"])
        .select(zorder_value("a", "b", bits=4).alias("z"))
        .collect()[0]
    )
    assert row.z == 7


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered files must give BOTH filter columns narrow per-file value
    bands, so either predicate skips files on footer stats; a 1-D sorted
    layout only achieves that for its sort column."""
    from pulsar_message_filter_spark.layout import (
        file_value_bounds,
        write_range_partitioned,
        write_zordered,
    )

    # z-order assumes dimensions of comparable bit width (the docstring's
    # "range-rank normalization") — mod both keys into the same 7-bit domain
    li = load(spark, "lineitem", SF_SMOKE).select(
        (F.col("l_orderkey") % 128).alias("ka"),
        (F.col("l_partkey") % 128).alias("kb"),
        "l_quantity",
    )
    z_path, lin_path = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, z_path, "ka", "kb", n_files=16, bits=7)
    write_range_partitioned(li, lin_path, "ka", n_files=16)

    def mean_band_frac(path, col, domain):
        bounds = [b for b in file_value_bounds(path, col) if b[1] is not None]
        return sum(hi - lo for _, lo, hi in bounds) / len(bounds) / domain

    # normalize to each column's ACTUAL domain (the smoke fixture's partkey
    # space is far smaller than the modulus)
    dom = {
        c: (
            li.agg(F.max(c) - F.min(c)).collect()[0][0] or 1
        )
        for c in ("ka", "kb")
    }
    # z-order: both dimensions' per-file bands are a fraction of the domain
    assert mean_band_frac(z_path, "ka", dom["ka"]) < 0.7
    assert mean_band_frac(z_path, "kb", dom["kb"]) < 0.7
    # 1-D layout: its sort column is tight but the other column is ~full-range
    assert mean_band_frac(lin_path, "ka", dom["ka"]) < 0.3
    assert mean_band_frac(lin_path, "kb", dom["kb"]) > 0.8
    # and z-order beats the 1-D layout on the second dimension
    assert mean_band_frac(z_path, "kb", dom["kb"]) < mean_band_frac(
        lin_path, "kb", dom["kb"]
    )
    # content unchanged
    assert spark.read.parquet(z_path).count() == li.count()


def test_hilbert_value_matches_reference_and_is_a_true_curve(spark):
    """hilbert_value must agree with the classic xy2d algorithm cell-for-
    cell, be bijective on the grid, and take only unit steps (the
    defining locality property Morton order lacks)."""
    from pulsar_message_filter_spark.layout import hilbert_value

    def xy2d(order, x, y):
        d, s = 0, 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    order = 4
    n = 1 << order
    pts = [(x, y) for x in range(n) for y in range(n)]
    rows = (
        spark.createDataFrame(pts, ["x", "y"])
        .select("x", "y", hilbert_value("x", "y", bits=order).alias("h"))
        .collect()
    )
    by_d = {}
    for r in rows:
        assert r.h == xy2d(order, r.x, r.y), (r.x, r.y)
        by_d[r.h] = (r.x, r.y)
    assert sorted(by_d) == list(range(n * n))  # bijective
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps only


def test_hilbert_layout_prunes_both_dimensions(spark, tmp_path):
    """Hilbert-clustered files give both filter columns narrow per-file
    bands (same contract as z-order, tighter locality)."""
    from pulsar_message_filter_spark.layout import (
        file_value_bounds,
        write_hilbert,
    )

    li = load(spark, "lineitem", SF_SMOKE).select(
        (F.col("l_orderkey") % 128).alias("ka"),
        (F.col("l_partkey") % 128).alias("kb"),
        "l_quantity",
    )
    h_path = str(tmp_path / "h")
    write_hilbert(li, h_path, "ka", "kb", n_files=16, bits=7)

    def mean_band_frac(path, col, domain):
        bounds = [b for b in file_value_bounds(path, col) if b[1] is not None]
        return sum(hi - lo for _, lo, hi in bounds) / len(bounds) / domain

    dom = {
        c: (li.agg(F.max(c) - F.min(c)).collect()[0][0] or 1)
        for c in ("ka", "kb")
    }
    assert mean_band_frac(h_path, "ka", dom["ka"]) < 0.7
    assert mean_band_frac(h_path, "kb", dom["kb"]) < 0.7
    assert spark.read.parquet(h_path).count() == li.count()
