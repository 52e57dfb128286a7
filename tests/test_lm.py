"""Library-level invariants for the LM-scoring operators: interpolated
bigram perplexity, vocab Pareto coverage, and n-gram novelty."""

from __future__ import annotations

import math

from pulsar_message_filter_spark.operators.lm import (
    bigram_perplexity,
    ngram_novelty,
    vocab_coverage,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bigram_perplexity_hand_computed(spark):
    # Corpus: "a b" repeated — the only bigram is (a,b), fully predictable.
    # c(a b)=2, c(a)=2, c(b)=2, N=4.
    # p = .75*(2/2) + .25*(2/4) = 0.875 → bits = -log2(0.875)
    got = {r.doc_id: r for r in bigram_perplexity(_docs(spark, ["a b", "a b"])).collect()}
    expect = round(-math.log2(0.875), 4)
    assert got[0].n_bigrams == 1 and got[0].avg_bits == expect
    assert got[1].avg_bits == expect


def test_bigram_perplexity_excludes_single_token_docs(spark):
    rows = bigram_perplexity(_docs(spark, ["solo", "a b"])).collect()
    assert {r.doc_id for r in rows} == {1}


def test_vocab_coverage_monotone_and_exact_cut(spark):
    # 'x' appears 90 times, 10 singletons: 50% and 90% need 1 term,
    # 99% needs 1 + 9 singletons = 10 terms.
    texts = [" ".join(["x"] * 90)] + [f"t{i}" for i in range(10)]
    cov = {r.target_pct: r for r in vocab_coverage(_docs(spark, texts)).collect()}
    assert cov[50].vocab_size == 1 and cov[90].vocab_size == 1
    assert cov[99].vocab_size == 10
    assert cov[50].coverage == 0.9
    # coverage is non-decreasing in the target
    assert cov[50].coverage <= cov[90].coverage <= cov[99].coverage


def test_ngram_novelty_duplicate_doc_scores_zero(spark):
    base = "one two three four five"
    got = {r.doc_id: r for r in ngram_novelty(_docs(spark, [base, base, "a b c"])).collect()}
    assert got[0].novelty_ratio == 1.0  # first copy introduces everything
    assert got[1].novelty_ratio == 0.0  # exact dup introduces nothing
    assert got[2].novelty_ratio == 1.0
    assert got[0].n_shingles == 3


def test_ngram_novelty_excludes_short_docs(spark):
    rows = ngram_novelty(_docs(spark, ["a b", "a b c"])).collect()
    assert {r.doc_id for r in rows} == {1}
