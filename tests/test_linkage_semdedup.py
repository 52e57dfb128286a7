"""Tests for linkage (Jaro-Winkler, sorted neighborhood), semantic dedup,
DSIR weights, Misra-Gries heavy hitters, and the argstats operators."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Jaro-Winkler: Python core pinned to DuckDB semantics
# ---------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb(duck):
    from pulsar_message_filter_spark.operators.linkage import jaro_winkler

    rng = random.Random(11)
    for _ in range(200):
        a = "".join(rng.choices("abcdef", k=rng.randint(0, 10)))
        b = "".join(rng.choices("abcdef", k=rng.randint(0, 10)))
        want = duck.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - want) < 1e-9, (a, b)


def test_jaro_winkler_known_values():
    from pulsar_message_filter_spark.operators.linkage import jaro_winkler

    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert jaro_winkler("", "") == 0.0  # DuckDB convention
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


# ---------------------------------------------------------------------------
# Sorted neighborhood: candidate bound and no self/dup pairs
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_bounds(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )

    docs = load(spark, "documents", SF_SMOKE)
    pairs = sorted_neighborhood_pairs(docs, window_size=3, max_dist=100)
    rows = pairs.collect()
    assert all(r.id_a != r.id_b for r in rows)
    # each doc emits at most window_size candidate pairs
    from collections import Counter

    per_doc = Counter(r.id_a for r in rows)
    assert max(per_doc.values(), default=0) <= 3
    assert len(rows) == len({(r.id_a, r.id_b) for r in rows})


# ---------------------------------------------------------------------------
# SemDeDup: census invariants
# ---------------------------------------------------------------------------


def test_semdedup_census_invariants(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.semdedup import (
        assign_to_anchors,
        f51_semantic_dedup,
    )

    emb = load(spark, "embeddings", SF_SMOKE)
    total = emb.count()
    census = f51_semantic_dedup(spark, SF_SMOKE).collect()
    assert sum(r.n_members for r in census) == total
    assert all(0 <= r.n_dropped <= r.n_members for r in census)
    # every vector assigned exactly once
    assigned = assign_to_anchors(emb)
    assert assigned.count() == total
    assert assigned.select("vec_id").distinct().count() == total
    # anchors self-assign (cosine with itself = 1, the max)
    self_rows = assigned.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") != F.col("anchor_id"))
    ).count()
    assert self_rows == 0


# ---------------------------------------------------------------------------
# DSIR: model shape and monotonicity
# ---------------------------------------------------------------------------


def test_dsir_en_sources_score_higher(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.semdedup import (
        dsir_bucket_logratios,
        f52_dsir_weights,
    )

    docs = load(spark, "documents", SF_SMOKE)
    model = dsir_bucket_logratios(docs, F.col("lang") == "en")
    assert model.count() <= 256
    out = f52_dsir_weights(spark, SF_SMOKE)
    rows = out.collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    # docs are tagged with lang per doc; an all-en source must out-score
    # an all-non-en source on the en-target importance weight
    per_src = docs.groupBy("source").agg(
        F.avg((F.col("lang") == "en").cast("int")).alias("en_frac")
    )
    joined = {r.source: r.en_frac for r in per_src.collect()}
    hi = [r.avg_doc_logweight for r in rows if joined[r.source] >= 0.9]
    lo = [r.avg_doc_logweight for r in rows if joined[r.source] <= 0.1]
    if hi and lo:
        assert min(hi) > max(lo)


# ---------------------------------------------------------------------------
# Misra-Gries: superset guarantee and exactness of the verified output
# ---------------------------------------------------------------------------


def test_mg_merge_guarantee():
    from pulsar_message_filter_spark.operators.heavy import make_mg_merge

    rng = random.Random(5)
    stream = [rng.randint(0, 50) for _ in range(5000)] + [99] * 600
    rng.shuffle(stream)
    counters: dict[int, int] = {}
    merge = make_mg_merge(16)
    for v in stream:
        merge(counters, [v], [1])
    # any key with frequency > n/(k+1) must survive
    n = len(stream)
    assert 99 in counters, f"heavy key evicted; n/(k+1)={n / 17:.0f}"
    assert len(counters) <= 16 + 1


def test_heavy_hitters_exact_vs_groupby(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.heavy import agg_heavy_hitters

    events = load(spark, "events", SF_SMOKE)
    n = events.count()
    exact = {
        (r.user_id, r.c)
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > int(0.006 * n))
        .collect()
    }
    got = {
        (r.user_id, r.n_events)
        for r in agg_heavy_hitters(spark, SF_SMOKE).collect()
    }
    assert got == exact


# ---------------------------------------------------------------------------
# argstats: ties-aware top-k and imputation invariants
# ---------------------------------------------------------------------------


def test_topk_with_ties_matches_window(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.argstats import topk_with_ties
    from pulsar_message_filter_spark.operators.parity import cents
    from pyspark.sql import Window

    li = load(spark, "lineitem", SF_SMOKE)
    w = Window.partitionBy("l_returnflag").orderBy(
        cents("l_extendedprice").desc()
    )
    naive = (
        li.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .groupBy("l_returnflag", cents("l_extendedprice").alias("price_cents"), "rnk")
        .agg(F.count("*").alias("n_at_value"))
    )
    want = {tuple(r) for r in naive.collect()}
    got = {tuple(r) for r in topk_with_ties(spark, SF_SMOKE).collect()}
    assert got == want


def test_impute_group_median_bounds(spark):
    from pulsar_message_filter_spark.operators.argstats import (
        impute_group_median,
    )

    rows = impute_group_median(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_missing < r.n  # the md5 mask hits a strict subset
        assert r.med_cents is not None


def test_rolling_corr_in_range(spark):
    from pulsar_message_filter_spark.operators.argstats import (
        window_rolling_corr,
    )

    rows = window_rolling_corr(spark, SF_SMOKE).collect()
    assert rows
    assert all(-1.0 <= r.roll_corr <= 1.0 for r in rows)
