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
