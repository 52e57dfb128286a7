"""Focused pins for the round-14 optimization changes (OPTIMIZATION_r14.md).

Each test pins the INTERNAL the optimization changed, so a regression
shows up here even where the oracle gate (value-level) would still pass:

* prefix scans: the range exchange is AQE-sized, not frozen at
  ``spark.sql.shuffle.partitions``;
* histogram_quantiles: one exploded pass, no per-quantile Union;
* int8_topk: the two-projection quantize is value-identical to the
  single-expression ``quantize_int8``;
* io.load: per-session metadata memoization (same lazy frame back), and
  io.widen's guard (no-op on already-wide input).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_prefix_scan_range_exchange_is_aqe_sized(spark):
    """With no explicit partition count, AQE coalesces the tiny range
    shuffle well below spark.sql.shuffle.partitions — the checkpointed
    frame's partition count is the observable."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sum,
    )

    df = spark.range(1000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v"), F.lit(1).alias("c")
    )
    out = distributed_prefix_sum(df, "g", ["v"], "c", "cum")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # materialize and read the actual partition count of the scan side
    n_parts = out.rdd.getNumPartitions()
    assert n_parts < shuffle_parts, (
        f"range exchange not AQE-coalesced: {n_parts} partitions "
        f"(shuffle.partitions={shuffle_parts})"
    )
    # exactness unchanged: global cum of ones == per-group rank
    rows = out.orderBy("g", "v").collect()
    seen: dict = {}
    for r in rows:
        seen[r["g"]] = seen.get(r["g"], 0) + 1
        assert r["cum"] == seen[r["g"]]


def test_histogram_quantiles_single_pass_no_union(spark):
    """The quantile read must not duplicate the prefix-scanned histogram
    per quantile: no Union in the plan, one Generate (the explode), and
    the rows match the old per-quantile-union construction."""
    from pulsar_message_filter_spark.operators.sketch import (
        histogram_bins,
        histogram_quantiles,
    )
    from pulsar_message_filter_spark.io import load

    li = load(spark, "lineitem", SF_SMOKE)
    hist = histogram_bins(li, "l_extendedprice")
    qs = [0.5, 0.9, 0.99]
    out = histogram_quantiles(hist, qs)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan, plan[:800]
    assert plan.count("Generate") == 1, plan[:800]
    got = sorted(map(tuple, out.collect()))
    # reference: the pre-round-14 unioned construction
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    c = distributed_prefix_sums(
        hist.withColumn("__g", F.lit(0)), "__g", ["bin"], {"cnt": "cum"},
        total_col="n",
    ).select("bin", "cnt", "cum", "n")
    ref = None
    for q in qs:
        part = c.select(F.lit(float(q)).alias("p"), "bin", "cnt", "cum", "n")
        ref = part if ref is None else ref.unionAll(part)
    target = F.col("p") * F.col("n")
    width = 4096
    ref = ref.filter(
        (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
    ).select(
        "p",
        (
            F.col("bin") * width
            + width * (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        ).alias("est"),
    )
    assert got == sorted(map(tuple, ref.collect()))


def test_int8_topk_quantize_split_matches_single_expression(spark):
    """int8_topk's two-projection quantize (amax/norm hoisted) must be
    value-identical to the public single-expression quantize_int8."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.similarity import (
        int8_cosine,
        int8_topk,
        quantize_int8,
    )
    from pyspark.sql import Window

    emb = load(spark, "embeddings", SF_SMOKE)
    got = sorted(
        map(tuple, int8_topk(emb.filter(F.col("vec_id") < 5), emb, k=3).collect())
    )
    # reference: the original one-expression construction
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        quantize_int8(F.col("embedding")).alias("qq"),
    ).localCheckpoint(eager=True)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        quantize_int8(F.col("embedding")).alias("cq"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), "neighbor_id")
    cands = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", "qe", "ce",
            int8_cosine(F.col("qq"), F.col("cq")).alias("approx_sim"),
        )
        .withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= 12)
    )
    from pulsar_message_filter_spark.operators.similarity import cosine

    wf = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    ref = (
        cands.select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= 3)
    )
    assert got == sorted(map(tuple, ref.collect()))


def test_load_memoizes_per_session_and_widen_guard(spark):
    from pulsar_message_filter_spark.io import load, widen

    a = load(spark, "nation", SF_SMOKE)
    b = load(spark, "nation", SF_SMOKE)
    assert a is b, "load() should return the memoized frame within a session"
    # different dir -> different entry
    c = load(spark, "nation", "/root/testdata/sf0.01")
    assert c is not a
    # widen: no-op when input is already at/above cluster width
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, numPartitions=par)
    assert widen(wide) is wide
    narrow = spark.range(0, 100, 1, numPartitions=1)
    assert widen(narrow, "id").rdd.getNumPartitions() >= min(par, 2)
