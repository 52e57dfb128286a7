"""Tests for n-gram corpus operators (contamination / repetition / span dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.ngrams import (
    SPAN_WIDTH,
    f22_contamination,
    f23_repetition_profile,
    f24_span_dedup,
    span_pairs,
    token_ngrams,
)
from tests.conftest import SF_SMOKE


def test_token_ngrams_exact_and_short_text_guard(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",)], ["text"]
    ).select(token_ngrams(F.col("text"), 3).alias("g"))
    got = [r.g for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    # shorter than n: empty array, never a descending-sequence artifact
    assert got[1] == []
    assert got[2] == []


def test_repetition_profile_exact_counts(spark):
    # "x x x x y": bigrams = [x x, x x, x x, x y] -> top=3, dup=2 of 4
    spark.createDataFrame(
        [(1, "x x x x y", "en", "srcT", 9)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet("/tmp/ngrams_fixture/documents.parquet")
    row = f23_repetition_profile(spark, "/tmp/ngrams_fixture").collect()[0]
    assert (row.n_bigrams, row.n_distinct_bigrams) == (4, 2)
    assert (row.top_bigram_count, row.dup_bigrams) == (3, 2)
    assert row.flag_repetitive == 1  # 2*5 >= 4


def test_contamination_counts_against_recompute(spark):
    out = f22_contamination(spark, SF_SMOKE)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows, "fixture should contain contaminated docs"
    for r in rows.values():
        assert 0 < r.contaminated_grams <= r.total_grams
        assert r.flag_10pct == int(r.contaminated_grams * 10 >= r.total_grams)
    # benchmark docs themselves are never flagged as contaminated training docs
    bench_ids = {
        r.doc_id
        for r in load(spark, "documents", SF_SMOKE)
        .filter(F.col("source").isin("src0", "src1", "src2"))
        .select("doc_id")
        .collect()
    }
    assert not bench_ids & set(rows)


def test_span_dedup_finds_synthetic_near_dups(spark):
    pairs = f24_span_dedup(spark, SF_SMOKE).collect()
    assert pairs, "fixture near-dups share >=1 full span"
    for p in pairs:
        assert p.doc_a < p.doc_b and p.n_shared_spans >= 1


def test_span_pairs_hash_path_matches_string_join(spark):
    docs = load(spark, "documents", SF_SMOKE)
    hashed = {
        (r.doc_a, r.doc_b, r.n_shared_spans)
        for r in span_pairs(docs, SPAN_WIDTH).collect()
    }
    exact = {
        (r.doc_a, r.doc_b, r.n_shared_spans)
        for r in f24_span_dedup(spark, SF_SMOKE).collect()
    }
    assert hashed == exact


def test_neardup_degree_profile_accounts_every_doc(spark):
    from pulsar_message_filter_spark.operators.ngrams import (
        f31_neardup_degree_profile,
    )

    rows = f31_neardup_degree_profile(spark, SF_SMOKE).collect()
    docs = load(spark, "documents", SF_SMOKE)
    assert sum(r.n_docs for r in rows) == docs.count()  # degree-0 docs included
    assert all(r.degree >= 0 for r in rows)


def test_contamination_approx_agrees_with_exact(spark):
    from pulsar_message_filter_spark.operators.ngrams import (
        f22_contamination,
        f22b_contamination_approx,
    )

    exact = {r.doc_id: r for r in f22_contamination(spark, SF_SMOKE).collect()}
    approx = {r.doc_id: r for r in f22b_contamination_approx(spark, SF_SMOKE).collect()}
    assert set(approx) == set(exact)  # same docs surface (joins are exact)
    # HLL at 2% rsd: counts within 10% of exact for these cardinalities
    for d, e in exact.items():
        a = approx[d]
        assert abs(a.total_grams - e.total_grams) <= max(3, 0.1 * e.total_grams)
        assert abs(a.contaminated_grams - e.contaminated_grams) <= max(
            3, 0.1 * e.contaminated_grams
        )
    # flag agreement on non-borderline docs (>20% margin from threshold)
    for d, e in exact.items():
        margin = abs(e.contaminated_grams * 10 - e.total_grams)
        if margin > 0.2 * e.total_grams:
            assert approx[d].flag_10pct == e.flag_10pct


def test_survivor_pick_component_max_always_survives(spark):
    from pulsar_message_filter_spark.operators.ngrams import survivor_pick

    # chain component {1-2, 2-3} with quality 3>2>1, plus an equal-quality
    # pair {10, 11} where the smaller id must win the tie-break
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (10, 5), (11, 5)], ["doc_id", "n_chars"]
    )
    rows = {r.doc_id: r for r in survivor_pick(pairs, quality).collect()}
    assert rows[3].kept == 1 and rows[3].n_dominators == 0  # component max
    assert rows[1].kept == 0 and rows[2].kept == 0
    assert rows[10].kept == 1 and rows[11].kept == 0  # tie -> smaller id
    assert rows[2].n_partners == 2  # chain middle sees both neighbors


def test_survivor_pick_graded_marks_component_best(spark):
    from pulsar_message_filter_spark.operators.ngrams import (
        f33_dedup_survivor_pick,
    )

    docs = load(spark, "documents", SF_SMOKE)
    rows = f33_dedup_survivor_pick(spark, SF_SMOKE).collect()
    assert rows, "fixture near-dups populate the pair graph"
    kept = sum(r.kept for r in rows)
    assert 0 < kept < len(rows)  # at least one survivor, at least one removal
    # every removed doc names >=1 dominator; every kept doc names none
    for r in rows:
        assert (r.kept == 1) == (r.n_dominators == 0)
