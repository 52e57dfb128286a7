"""Library-level invariants for the round-5 operators: degree-oriented
triangle counting, step-decay scoring, A-ES weighted sampling, histogram
quantiles, and unigram surprisal."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsar_message_filter_spark.operators.graph import (
    cooccurrence_edges,
    orient_by_degree,
    triangle_count,
)
from pulsar_message_filter_spark.operators.sketch import (
    histogram_bins,
    histogram_quantiles,
)
from pulsar_message_filter_spark.operators.text import unigram_surprisal


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long"
    ).distinct()


def test_triangle_count_known_graphs(spark):
    # K4 has C(4,3)=4 triangles; a pendant edge adds none.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _edges(spark, k4 + [(3, 9)])
    assert triangle_count(e).collect()[0].n_triangles == 4
    # a 5-cycle is triangle-free
    c5 = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)])
    assert triangle_count(c5).collect()[0].n_triangles == 0


def test_orientation_is_a_partial_order_bound(spark):
    # star graph: hub degree 5, leaves degree 1 → every edge must orient
    # leaf→hub, so the hub's OUT-degree is 0 (the skew-safety property).
    star = _edges(spark, [(0, i) for i in range(1, 6)])
    o = orient_by_degree(star)
    assert o.filter(F.col("src") == 0).count() == 0
    assert o.count() == 5


def test_cooccurrence_edges_within_group_only(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 11), (2, 20), (2, 21), (3, 30)],
        "g long, item long",
    )
    got = {(r.u, r.v) for r in cooccurrence_edges(df, "g", "item").collect()}
    assert got == {(10, 11), (20, 21)}


def test_histogram_quantiles_within_one_bin(spark):
    vals = spark.range(1, 1001).select(F.col("id").cast("double").alias("x"))
    hist = histogram_bins(vals, "x", width=16)
    est = {r.p: r.est for r in histogram_quantiles(hist, [0.5, 0.9], width=16).collect()}
    assert abs(est[0.5] - 500) <= 16
    assert abs(est[0.9] - 900) <= 16


def test_histogram_bins_merge_by_sum(spark):
    # mergeability: hist(A ∪ B) == groupBy-sum of hist(A) + hist(B)
    a = spark.range(0, 500).select(F.col("id").cast("double").alias("x"))
    b = spark.range(500, 1000).select(F.col("id").cast("double").alias("x"))
    merged = (
        histogram_bins(a, "x", 64)
        .unionAll(histogram_bins(b, "x", 64))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = histogram_bins(a.unionAll(b), "x", 64)
    assert {(r.bin, r.cnt) for r in merged.collect()} == {
        (r.bin, r.cnt) for r in whole.collect()
    }


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    rows = [(1, "the the the the"), (2, "the the the zyzzyva")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.avg_surprisal for r in unigram_surprisal(docs).collect()}
    assert s[2] > s[1]
    # doc 1: all 'the' (7 of 8 tokens) → surprisal log2(8/7)
    assert math.isclose(s[1], math.log2(8 / 7), abs_tol=1e-3)


def test_decay_score_matches_hand_computation(spark):
    from pulsar_message_filter_spark.operators.timeseries import decay_weight_x8

    df = spark.createDataFrame([(2,), (10,), (20,), (30,)], "d int")
    got = [r.w for r in df.select(decay_weight_x8(F.col("d")).alias("w")).collect()]
    assert got == [8, 4, 2, 1]


def test_weighted_sample_prefers_heavy_docs(spark):
    from pulsar_message_filter_spark.operators.sampling import (
        sample_weighted_deterministic,
    )

    out = sample_weighted_deterministic(spark, "/root/testdata/sf0.01").collect()
    assert len(out) == 60
    assert len({r.doc_id for r in out}) == 60
    # w=4 docs should be strongly overrepresented vs the corpus mix
    picked_heavy = sum(1 for r in out if r.weight == 4) / 60
    corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus_heavy = corpus.filter(F.col("n_chars") >= 300).count() / corpus.count()
    assert picked_heavy > corpus_heavy
