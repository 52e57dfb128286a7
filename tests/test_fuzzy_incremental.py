"""Tests for blocked fuzzy matching and incremental partial merging."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.cdc import (
    daily_partials,
    incremental_partial_merge,
)
from pulsar_message_filter_spark.operators.fuzzy import (
    fuzzy_pairs,
    fuzzy_vocab_pairs,
    vocabulary,
)
from pulsar_message_filter_spark.operators.parity import cents
from tests.conftest import SF_SMOKE


def test_fuzzy_pairs_finds_variants_within_blocks(spark):
    vocab = spark.createDataFrame(
        [("table", 10), ("cable", 3), ("tables", 2), ("zebra", 1)],
        ["word", "n_occurrences"],
    )
    # "table"/"cable": same length, different first char -> blocked out (by design)
    # "table"/"tables": length 5 vs 6 -> same len bucket (floor(5/2)=2, floor(6/2)=3) -> different
    pairs = fuzzy_pairs(vocab).collect()
    assert all(r.dist <= 2 and r.word_a < r.word_b for r in pairs)
    found = {(r.word_a, r.word_b) for r in pairs}
    assert ("cable", "table") not in found  # first-char block documents recall loss


def test_fuzzy_pairs_same_block_positive(spark):
    vocab = spark.createDataFrame(
        [("scan", 5), ("span", 4), ("scant", 1)], ["word", "n_occurrences"]
    )
    pairs = {(r.word_a, r.word_b): r.dist for r in fuzzy_pairs(vocab).collect()}
    assert pairs[("scan", "span")] == 1  # one substitution; same block
    assert ("scan", "scant") in pairs  # len 4 vs 5: floor(4/2)=2 = floor(5/2)


def test_graded_fuzzy_vocab_nonempty_and_canonical(spark):
    rows = fuzzy_vocab_pairs(spark, SF_SMOKE).collect()
    assert rows, "fixture vocabulary should contain near-pairs"
    assert all(0 < r.dist <= 2 for r in rows)
    assert all(r.word_a < r.word_b for r in rows)
    assert all(r.n_a > 0 and r.n_b > 0 for r in rows)


def test_vocabulary_counts_conserve_tokens(spark):
    docs = load(spark, "documents", SF_SMOKE)
    vocab = vocabulary(docs)
    n_tokens = docs.select(
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert vocab.agg(F.sum("n_occurrences")).collect()[0][0] == n_tokens


def test_partial_merge_equals_direct(spark):
    li = load(spark, "lineitem", SF_SMOKE)
    merged = incremental_partial_merge(spark, SF_SMOKE)
    direct = (
        li.groupBy(
            F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"),
            "l_returnflag",
        )
        .agg(F.sum(cents("l_extendedprice")).alias("sum_cents"), F.count("*").alias("n"))
    )
    m = {(r.month, r.l_returnflag): (r.sum_cents, r.n) for r in merged.collect()}
    d = {(r.month, r.l_returnflag): (r.sum_cents, r.n) for r in direct.collect()}
    assert m == d  # algebraic merge of daily partials == direct aggregation


def test_daily_partials_are_mergeable_state(spark):
    p = daily_partials(load(spark, "lineitem", SF_SMOKE))
    assert set(p.columns) == {"day", "l_returnflag", "sum_cents", "n"}
    assert p.filter(F.col("n") <= 0).count() == 0
