"""ELEVENTH differential fuzz family: seeded BPE-training fuzz.

``tests/test_bpe.py`` pins the fixture corpus; this family draws SEEDED
RANDOM corpora (small alphabets force dense pair-count ties — the
tie-break stress; mixed-case text and punctuation separators stress the
word splitter) and checks three independent witnesses per corpus:

* the production Spark pipeline (``word_freqs`` → ``bpe_train`` →
  encode totals — the same callables the graded queries compose),
* the REAL graded oracle SQL of ``bpe_merge_rounds`` /
  ``bpe_encode_corpus`` run verbatim against a DuckDB view holding the
  same synthetic corpus (so the oracle TEXT itself is fuzzed, not a
  re-derivation), and
* a pure-Python symbol-LIST reference that shares no construction with
  either engine leg (no string replace, no placeholders).

Seeded ``random.Random`` via crc32 keeps every run deterministic.
"""

from __future__ import annotations

import random
import zlib
from collections import Counter

import duckdb
import pandas as pd
import pytest

from pulsar_message_filter_spark.operators.bpe import (
    BPE_ROUNDS,
    bpe_train,
    expand_symbol,
    word_freqs,
)

_SEPS = [" ", "  ", ", ", "; ", " - ", "7", "\n", "!?"]


def _corpus(alpha_n: int, seed: int, n_docs: int = 20) -> list[str]:
    rng = random.Random(zlib.crc32(f"bpe{alpha_n}".encode()) ^ seed)
    alphabet = "abcdefgh"[:alpha_n]
    docs = []
    for _ in range(n_docs):
        words = []
        for _ in range(rng.randint(5, 30)):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            # mixed case stresses the lower() in the splitter
            words.append(w.upper() if rng.random() < 0.2 else w)
        docs.append(rng.choice(_SEPS).join(words))
    return docs


def _py_train(docs: list[str]):
    """Symbol-list reference: greedy BPE, tie-break = (count desc,
    left-symbol creation rank asc, right-symbol creation rank asc) —
    the symbol-space mirror of the engines' placeholder-string order."""
    import re

    vocab: Counter = Counter()
    for text in docs:
        for w in re.split(r"[^a-z]+", text.lower()):
            if w:
                vocab[tuple(w)] += 1
    vocab = dict(vocab)
    created: list[str] = []

    def rank(sym: str):
        return (1, created.index(sym)) if sym in created else (0, ord(sym))

    merges = []
    for _ in range(BPE_ROUNDS):
        pc: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pc[(a, b)] += freq
        if not pc:
            break
        pair = min(pc, key=lambda p: (-pc[p], rank(p[0]), rank(p[1])))
        merges.append((pair[0], pair[1], pc[pair]))
        created.append(pair[0] + pair[1])
        nxt = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = freq
        vocab = nxt
    tokens = sum(len(syms) * f for syms, f in vocab.items())
    return merges, tokens


def _oracle(name: str) -> str:
    from pulsar_message_filter_spark import registry

    return registry.all_graded()[name].oracle


@pytest.mark.parametrize("alpha_n", [2, 3, 6])
@pytest.mark.parametrize("seed", [11, 12])
def test_bpe_three_witnesses_agree(spark, alpha_n, seed):
    docs = _corpus(alpha_n, seed)

    # --- python reference ---
    ref_merges, ref_tokens = _py_train(docs)

    # --- spark production path ---
    sdf = spark.createDataFrame([(d,) for d in docs], "text string")
    merges, encoded = bpe_train(word_freqs(sdf))
    got_merges = [
        (
            expand_symbol(pair[0], merges[:r]),
            expand_symbol(pair[1], merges[:r]),
            cnt,
        )
        for r, (pair, cnt) in enumerate(merges)
    ]
    from pyspark.sql import functions as F

    got_tokens = encoded.agg(F.sum(F.col("freq") * F.length("w"))).collect()[0][0]

    assert got_merges == ref_merges
    assert got_tokens == ref_tokens

    # --- the real graded oracle text, on the same corpus ---
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": docs}))
    duck_merges = [
        (r[1], r[2], r[3])
        for r in con.execute(_oracle("bpe_merge_rounds")).fetchall()
    ]
    assert duck_merges == ref_merges
    duck = con.execute(_oracle("bpe_encode_corpus")).fetchone()
    # columns: n_vocab, total_words, total_chars, total_tokens, ...
    assert duck[3] == ref_tokens
