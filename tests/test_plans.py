"""Physical-plan contract tests (SURVEY.md §4.2): the plans the engine
promises at scale, asserted on the real optimizer output — not vibes.
"""

from __future__ import annotations

import pytest

# plans all 397 queries (~1.5 min): slow tier — excluded from the default (driver-verify) run
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.plans import (
    has_broadcast_hash_join,
    has_cartesian_product,
    plan_str,
    pushed_filters,
    uses_take_ordered,
    whole_stage_codegen_spans,
)
from pulsar_message_filter_spark.selector import Selector
from tests.conftest import SF_SMOKE


def test_selector_native_predicates_push_to_scan(spark):
    """Selector terms on native columns must reach the parquet reader."""
    events = load(spark, "events", SF_SMOKE)
    sel = Selector("event_type IN ('purchase', 'error') AND value > 100")
    filtered = sel.apply(events)
    pushed = " ".join(pushed_filters(filtered))
    assert "event_type" in pushed and "value" in pushed, pushed


def test_selector_column_pruning(spark):
    """A two-column projection must not scan all six event columns."""
    events = load(spark, "events", SF_SMOKE)
    df = events.filter(F.col("value") > 100).select("event_id", "event_type")
    plan = plan_str(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "user_id" not in read_schema, read_schema


def test_q3_join_is_broadcast(spark):
    from pulsar_message_filter_spark.operators.relational import q3_top_revenue

    assert has_broadcast_hash_join(q3_top_revenue(spark, SF_SMOKE))


def test_global_topk_uses_take_ordered(spark):
    from pulsar_message_filter_spark.operators.relational import global_topk

    assert uses_take_ordered(global_topk(spark, SF_SMOKE))


def test_minhash_has_no_cartesian(spark):
    """LSH candidate generation must be an equi-join on band keys."""
    from pulsar_message_filter_spark.operators.dedup import minhash_candidates

    docs = load(spark, "documents", SF_SMOKE)
    assert not has_cartesian_product(minhash_candidates(docs, "text", "doc_id"))


def test_lsh_topk_has_no_cartesian(spark):
    from pulsar_message_filter_spark.operators.similarity import lsh_topk

    emb = load(spark, "embeddings", SF_SMOKE)
    assert not has_cartesian_product(lsh_topk(emb, k=3))


def test_all_non_udf_queries_stay_jvm_side(spark):
    """Sweeping UDF-free contract: every oracle-graded query outside the
    G-series (and the deliberate pandas-UDF ops) must contain no Python
    evaluation in its physical plan — the hot path stays in codegen."""
    from pulsar_message_filter_spark import registry

    allowed_python = {
        # G-series exist to exercise the Python surfaces
        "g1_scalar_udf", "g3_pandas_udaf", "g4_grouped_map",
        "g5_map_in_pandas", "g6_udtf_shingles",
        "g6b_udtf_chunker",  # second UDTF (round-14 G6 widening)
        "g4b_grouped_map_gap_rank",  # second grouped map (round-14 G4)
        # deliberate vectorized-UDF operators
        "f2_simhash", "f12_multimodal_features", "f4_topk_lsh", "f4_topk_ivf",
        "f4_topk_ivf_auto",  # auto-probed variant of f4_topk_ivf
        "g5b_map_in_arrow",  # the Arrow twin of g5
        # bloom membership test is a deliberate vectorized pandas UDF; the
        # filter build is mapInPandas by design (word packing)
        "f34_bloom_prefilter_dedup",
        # Jaro-Winkler has no Spark built-in: deliberate Arrow-batched
        # pandas UDF applied after JVM-side blocking (linkage.py)
        "fuzzy_jaro_winkler",
        # zlib compression-ratio quality score: no SQL zlib exists;
        # Arrow-batched pandas UDF over the scan (text.py)
        "f62_compression_ratio",
    }
    offenders = []
    for name, g in registry.all_graded().items():
        if name in allowed_python:
            continue
        plan = plan_str(g.fn(spark, SF_SMOKE))
        if "EvalPython" in plan or "PythonUDTF" in plan:
            offenders.append(name)
    assert not offenders, f"python eval leaked into hot paths: {offenders}"


def test_star_join_queries_broadcast_dims(spark):
    from pulsar_message_filter_spark.operators.relational import (
        q5_local_supplier_revenue,
        q7_volume_shipping,
        q10_returned_items,
    )

    for fn in (q5_local_supplier_revenue, q7_volume_shipping, q10_returned_items):
        assert has_broadcast_hash_join(fn(spark, SF_SMOKE)), fn.__name__


def test_q2_broadcasts_dims_and_pushes_filters(spark):
    """The Q2 shape must broadcast all four dims and push the part-size /
    region-name predicates into the parquet scans (dim filtering before the
    fact-side shuffle is what keeps the window partition small at scale)."""
    from pulsar_message_filter_spark.operators.workload import q2_min_cost_supplier

    df = q2_min_cost_supplier(spark, SF_SMOKE)
    assert has_broadcast_hash_join(df)
    pushed = " ".join(pushed_filters(df))
    assert "p_size" in pushed and "r_name" in pushed, pushed
    assert not has_cartesian_product(df)


def test_bucketed_join_avoids_shuffle(spark):
    """F14/§2 scale posture: pre-bucketing both join sides on the key makes
    the join co-located — the physical plan must contain NO Exchange.
    At 100 TB this is the difference between a full-fact shuffle and none."""
    import shutil

    orders = load(spark, "orders", SF_SMOKE).limit(500)
    lineitem = load(spark, "lineitem", SF_SMOKE).limit(2000)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables across sessions but their files
    # persist in the warehouse dir — clear stale locations
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem"))
    # disable auto-broadcast so the sort-merge path (the 100 TB shape —
    # neither side fits in memory) is what gets planned
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = plan_str(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """§4.2's partition-pruning row, demonstrated (fixtures are single files,
    so this writes a properly partitioned ingest layout): a date-partitioned
    events table queried for one day must show a PartitionFilters entry and
    scan only that day's directory — at 100 TB this is the difference
    between reading one day and reading three years."""
    events = load(spark, "events", SF_SMOKE)
    out = str(tmp_path / "events_by_day")
    (
        events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = plan_str(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "day" in pf[0] and "2024-01-05" in pf[0], plan
    # and the pruned count matches the unpartitioned predicate
    expected = events.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert df.count() == expected and expected > 0


def test_flagship_is_single_codegen_pipeline_per_stage(spark):
    """Selector + window agg should stay inside whole-stage codegen."""
    from pulsar_message_filter_spark.operators.selector_queries import flagship

    df = flagship(spark, SF_SMOKE)
    assert whole_stage_codegen_spans(df) >= 1
    # and no Python evaluation anywhere in the plan (UDF-free hot path)
    assert "BatchEvalPython" not in plan_str(df)
    assert "ArrowEvalPython" not in plan_str(df)


def test_weighted_sample_uses_take_ordered(spark):
    """A-ES weighted sampling must compile to partition-local top-k
    (TakeOrderedAndProject), never a global sort or single-partition
    window."""
    from pulsar_message_filter_spark.operators.sampling import (
        sample_weighted_deterministic,
    )

    assert uses_take_ordered(sample_weighted_deterministic(spark, SF_SMOKE))


def test_triangle_count_has_no_cartesian(spark):
    """Wedge join and closing join are equi-joins on node ids."""
    from pulsar_message_filter_spark.operators.graph import (
        cooccurrence_edges,
        triangle_count,
    )

    li = load(spark, "lineitem", SF_SMOKE)
    tri = triangle_count(cooccurrence_edges(li, "l_orderkey", "l_partkey"))
    assert not has_cartesian_product(tri)


def test_prefix_filter_has_no_cartesian(spark):
    """PPJoin candidate generation is an equi-join on prefix tokens."""
    from pulsar_message_filter_spark.operators.dedup import prefix_filter_jaccard

    docs = load(spark, "documents", SF_SMOKE)
    assert not has_cartesian_product(prefix_filter_jaccard(docs))


def test_global_dense_ids_has_no_global_window(spark):
    """The scalable zipWithIndex must range-partition and scan in
    parallel — never a row_number over an empty partition spec (the
    single-task global window it replaces)."""
    from pulsar_message_filter_spark.operators.relational import global_dense_ids

    plan = plan_str(global_dense_ids(spark, SF_SMOKE)).lower()
    # the range partitioning now lives INSIDE the localCheckpointed RDD
    # lineage (prefix.py's branch-consistency fix), so the visible plan
    # shows the checkpointed scan instead of the exchange
    assert "rangepartitioning" in plan or "existingrdd" in plan, plan[:500]
    # every window in the plan is keyed (partitionBy includes __pid/__g);
    # a global window renders as 'windowspecdefinition(' with no
    # partition columns before the ordering spec
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            spec = line.split("windowspecdefinition(", 1)[1]
            assert spec.lstrip().split(",")[0].strip() != "", line
