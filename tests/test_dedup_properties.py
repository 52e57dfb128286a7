"""Property-based checks of the winnowing / span-detection machinery
against brute-force Python ground truth on randomized corpora.

Hypothesis drives ONLY the corpus construction (pure Python, no Spark per
example); each property then runs ONE Spark job over the full generated
corpus, so the suite stays fast while covering hundreds of random
documents.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _brute_winnow(tokens: list[str], k: int = 4, w: int = 4) -> set[str]:
    """Reference winnowing: min hash of every complete window of w grams."""
    grams = [
        _md5(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)
    ]
    return {
        min(grams[i : i + w]) for i in range(len(grams) - w + 1)
    } if len(grams) >= w else set()


def _brute_lcs_tokens(a: list[str], b: list[str]) -> int:
    """Longest common contiguous token run (O(n*m) DP, fine at test size)."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _random_corpus(seed: int, n_docs: int = 12) -> list[tuple[int, str]]:
    """Docs over a small vocabulary with planted shared runs between some
    pairs — guarantees both overlap-positive and overlap-negative cases."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    docs = []
    shared = [rng.choice(vocab) for _ in range(rng.randint(7, 14))]
    for d in range(n_docs):
        body = [rng.choice(vocab) for _ in range(rng.randint(8, 30))]
        if d % 3 == 0:  # every third doc embeds the shared run
            at = rng.randint(0, len(body))
            body = body[:at] + shared + body[at:]
        docs.append((d, " ".join(body)))
    return docs


def test_winnowing_matches_bruteforce_on_random_corpora(spark):
    """The Spark fingerprint set must equal the reference implementation
    exactly, for every document across several seeded random corpora."""
    from pulsar_message_filter_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    for seed in (7, 23, 99):
        corpus = _random_corpus(seed)
        docs = spark.createDataFrame(corpus, ["doc_id", "text"])
        got = {
            r.doc: set(r.fps)
            for r in winnowing_fingerprints(docs)
            .groupBy("doc")
            .agg(F.collect_set("fp").alias("fps"))
            .collect()
        }
        for doc_id, text in corpus:
            expect = _brute_winnow(text.split(" "))
            assert got.get(doc_id, set()) == expect, (seed, doc_id)


def test_span_detector_matches_bruteforce_lcs(spark):
    """f61's longest_run_tokens must equal the DP longest-common-run for
    every reported pair, and every pair with a true run >= 8 must be
    reported (no false negatives at anchor resolution k=4)."""
    import unittest.mock as mock

    import pulsar_message_filter_spark.operators.dedup as dedup_mod
    from pulsar_message_filter_spark.operators.dedup import (
        f61_common_substring_spans,
    )

    for seed in (11, 42):
        corpus = _random_corpus(seed)
        toks = {d: t.split(" ") for d, t in corpus}
        docs = spark.createDataFrame(corpus, ["doc_id", "text"])
        with mock.patch.object(dedup_mod, "load", lambda spark, t, d: docs):
            got = {
                (r.id_a, r.id_b): r.longest_run_tokens
                for r in f61_common_substring_spans(spark, "unused").collect()
            }
        ids = sorted(toks)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                true_run = _brute_lcs_tokens(toks[a], toks[b])
                if (a, b) in got:
                    assert got[(a, b)] == true_run, (seed, a, b)
                else:
                    assert true_run < 8, (seed, a, b, true_run)


def test_winnowing_df_cap_drops_only_hot_fingerprint_pairs(spark):
    """The max_df hot-key guard: with a boilerplate run shared by ALL
    docs, the uncapped join emits every pair; capping document frequency
    removes the ubiquitous fingerprints (and the pairs they alone
    created) while pairs that ALSO share rare content survive."""
    from pulsar_message_filter_spark.operators.dedup import (
        winnowing_candidates,
        winnowing_fingerprints,
    )

    boiler = " ".join(f"b{i}" for i in range(12))  # shared by all docs
    rare = " ".join(f"r{i}" for i in range(12))  # shared by docs 1,2 only
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {rare} unique one two"),
            (2, f"{rare} other tail {boiler}"),
            (3, f"{boiler} three four five six seven"),
            (4, f"{boiler} eight nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(docs)
    uncapped = {
        (r.id_a, r.id_b)
        for r in winnowing_candidates(fp, min_shared=1).collect()
    }
    assert (3, 4) in uncapped  # boilerplate alone links 3-4
    capped = {
        (r.id_a, r.id_b)
        for r in winnowing_candidates(fp, min_shared=1, max_df=2).collect()
    }
    assert (1, 2) in capped  # rare shared content survives the cap
    assert (3, 4) not in capped  # boilerplate-only pair is gone
