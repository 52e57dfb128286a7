"""BPE training contracts — third witness: a pure-Python reference BPE
(classic symbol-list formulation, no string replace) must produce the
same pair statistics, the same greedy merge schedule, and the same
encoded token totals as the relational pipeline.  The Spark-vs-DuckDB
oracle pair shares the replace-with-placeholder construction; this
reference does NOT, so it closes the triangle the two engine legs leave
open (same discipline as the sliding-spec random witness)."""

from __future__ import annotations

import re
from collections import Counter

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.bpe import (
    BPE_ROUNDS,
    bpe_train,
    expand_symbol,
    pair_counts,
    word_freqs,
)
from tests.conftest import SF_SMOKE


def _py_vocab(spark):
    docs = load(spark, "documents", SF_SMOKE).select("text").collect()
    vocab: Counter = Counter()
    for r in docs:
        for w in re.split(r"[^a-z]+", r.text.lower()):
            if w:
                vocab[w] += 1
    return vocab


def _py_pair_counts(vocab: dict) -> Counter:
    """Pair stats over symbol LISTS (not strings) — independent of the
    placeholder-rewrite trick the engine pipeline uses."""
    pc: Counter = Counter()
    for syms, freq in vocab.items():
        for a, b in zip(syms[:-1], syms[1:]):
            pc[(a, b)] += freq
    return pc


def _py_merge(vocab: dict, pair: tuple) -> dict:
    """Greedy left-to-right BPE merge on symbol tuples."""
    out = {}
    for syms, freq in vocab.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                merged.append(syms[i] + syms[i + 1])
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = freq
    return out


def test_pair_counts_match_python_reference(spark):
    vocab = _py_vocab(spark)
    ref = _py_pair_counts({tuple(w): f for w, f in vocab.items()})
    got = {
        r.pair: r.pair_count
        for r in pair_counts(word_freqs(load(spark, "documents", SF_SMOKE))).collect()
    }
    assert got == {a + b: c for (a, b), c in ref.items()}


def test_merge_schedule_matches_python_reference(spark):
    """The full greedy schedule: argmax pair (count desc, expanded pair
    string asc on the CONCATENATED symbols) per round, then re-merge."""
    vocab = {tuple(w): f for w, f in _py_vocab(spark).items()}
    _created.clear()
    expected = []
    for _ in range(BPE_ROUNDS):
        pc = _py_pair_counts(vocab)
        # engine tie-break: 2-char placeholder-pair string ascending.
        # In symbol-list space that is (left_sym, right_sym) ordered by
        # the ROUND each symbol was created (placeholders sort above
        # ascii and by creation order) — reproduce it via creation-rank
        # keys rather than expanded strings.
        pair = min(pc, key=lambda p: (-pc[p], _rank(p[0]), _rank(p[1])))
        expected.append((pair[0], pair[1], pc[pair]))
        _created.append(pair[0] + pair[1])
        vocab = _py_merge(vocab, pair)

    merges, _ = bpe_train(word_freqs(load(spark, "documents", SF_SMOKE)))
    got = [
        (
            expand_symbol(pair[0], merges[:r]),
            expand_symbol(pair[1], merges[:r]),
            cnt,
        )
        for r, (pair, cnt) in enumerate(merges)
    ]
    assert got == expected


#: Symbols created by merges, in creation order — later-created symbols
#: carry higher placeholder codepoints in the engine, so they sort AFTER
#: every ascii char and after earlier merges.
_created: list = []


def _rank(sym: str):
    if sym in _created:
        return (1, _created.index(sym))
    return (0, ord(sym))


def test_encode_totals_match_python_reference(spark):
    vocab = {tuple(w): f for w, f in _py_vocab(spark).items()}
    _created.clear()
    for _ in range(BPE_ROUNDS):
        pc = _py_pair_counts(vocab)
        pair = min(pc, key=lambda p: (-pc[p], _rank(p[0]), _rank(p[1])))
        _created.append(pair[0] + pair[1])
        vocab = _py_merge(vocab, pair)
    ref_tokens = sum(len(syms) * f for syms, f in vocab.items())

    _, encoded = bpe_train(word_freqs(load(spark, "documents", SF_SMOKE)))
    from pyspark.sql import functions as F

    got_tokens = encoded.agg(
        F.sum(F.col("freq") * F.length("w"))
    ).collect()[0][0]
    assert got_tokens == ref_tokens


def test_bpe_train_rejects_too_many_rounds(spark):
    import pytest as _pytest

    from pulsar_message_filter_spark.operators.bpe import _PLACEHOLDERS, bpe_train

    vocab = spark.createDataFrame([("ab", 1)], "w string, freq long")
    with _pytest.raises(ValueError):
        bpe_train(vocab, rounds=len(_PLACEHOLDERS) + 1)


def test_bpe_train_breaks_cleanly_when_merges_exhaust(spark):
    """A corpus whose pairs run out before BPE_ROUNDS: the loop stops
    early and the encoded vocab stays consistent (no NULLs, no crash) —
    the Spark twin of the oracle's coalesce hardening."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.bpe import _PLACEHOLDERS, bpe_train

    # single 2-char word: round 1 merges it to one symbol, then no pairs
    vocab = spark.createDataFrame([("ab", 3), ("x", 9)], "w string, freq long")
    merges, encoded = bpe_train(vocab)
    assert len(merges) == 1 and merges[0][0] == "ab"
    rows = {r.w: r.freq for r in encoded.collect()}
    assert rows == {_PLACEHOLDERS[0]: 3, "x": 9}  # merged word = 1 placeholder symbol
    assert encoded.filter(F.col("w").isNull()).count() == 0


def test_word_freqs_on_letterless_text(spark):
    from pulsar_message_filter_spark.operators.bpe import word_freqs

    docs = spark.createDataFrame(
        [("123 456 ---",), ("",), ("A b!",)], "text string"
    )
    got = {r.w: r.freq for r in word_freqs(docs).collect()}
    assert got == {"a": 1, "b": 1}
