"""Fuzzy matching — blocked edit-distance pairs over a corpus vocabulary.

Entity-resolution / token-normalization primitive: find pairs of distinct
vocabulary tokens within a small Levenshtein distance (spelling variants,
OCR noise, tokenizer artifacts), without the all-pairs cartesian that a
naive fuzzy join implies.

The standard scale shape is **blocking**: self-join only within cheap
equality blocks (here: token length bucket × first character), then apply
the expensive distance predicate inside the block.  Blocking trades a
documented recall loss (a variant pair whose first characters differ is
missed) for join keys the engine can hash-partition — the same
candidate-generation idea as MinHash banding (`dedup.py`) and IVF cells
(`similarity.py`), with the oracle applying the identical blocks so the
contract is exact.

Scale notes (100 TB):

* The vocabulary of a corpus grows ~sub-linearly in corpus size (heaps'
  law) and is distinct-aggregated first — the fuzzy join runs on the
  vocab, not the corpus.  At 100 TB the vocab is millions of rows, and
  the blocked self-join shuffles on (len_bucket, first_char) — bounded
  fan-out per block, no cartesian (the plan guard asserts this class of
  join stays a hash join in tests/test_plans.py style).
* ``levenshtein`` evaluates JVM-side inside codegen; the block equality
  keys are computed in the scan projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def vocabulary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct whitespace tokens with corpus occurrence counts."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
    )


def fuzzy_pairs(
    vocab: DataFrame, max_dist: int = 2, len_bucket: int = 2
) -> DataFrame:
    """Token pairs within ``max_dist`` edits, blocked on (length bucket,
    first char).  ``word_a < word_b`` canonicalizes pair order."""
    keyed = vocab.select(
        "word",
        "n_occurrences",
        F.floor(F.length("word") / F.lit(len_bucket)).alias("len_b"),
        F.substring("word", 1, 1).alias("c0"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.len_b") == F.col("b.len_b"))
            & (F.col("a.c0") == F.col("b.c0"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.levenshtein("a.word", "b.word").alias("dist"),
            F.col("a.n_occurrences").alias("n_a"),
            F.col("b.n_occurrences").alias("n_b"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def noisy_vocabulary(docs: DataFrame) -> DataFrame:
    """Corpus vocabulary with deterministic OCR-style noise injected
    (last char -> 'x' on doc_id%7 docs, len>=4) — the shared fixture for
    the fuzzy-matching and entity-clustering graded queries (the organic
    fixture vocabulary has no near-pairs)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    clean = toks.filter(F.col("word") != "").select("word")
    noisy = toks.filter(
        (F.col("doc_id") % 7 == 0) & (F.length("word") >= 4)
    ).select(
        F.concat(
            F.expr("substring(word, 1, length(word) - 1)"), F.lit("x")
        ).alias("word")
    )
    return (
        clean.unionAll(noisy)
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
    )


@graded(
    "fuzzy_vocab_pairs",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ),
        noisy AS (
            SELECT word FROM toks WHERE word != ''
            UNION ALL
            SELECT substr(word, 1, len(word) - 1) || 'x' AS word
            FROM toks WHERE doc_id % 7 = 0 AND len(word) >= 4
        ),
        vocab AS (
            SELECT word, count(*) AS n_occurrences FROM noisy GROUP BY 1
        ),
        keyed AS (
            SELECT word, n_occurrences,
                   CAST(floor(len(word) / 2.0) AS BIGINT) AS len_b,
                   substr(word, 1, 1) AS c0
            FROM vocab
        )
        SELECT a.word AS word_a, b.word AS word_b,
               CAST(levenshtein(a.word, b.word) AS INT) AS dist,
               a.n_occurrences AS n_a, b.n_occurrences AS n_b
        FROM keyed a JOIN keyed b
          ON a.len_b = b.len_b AND a.c0 = b.c0 AND a.word < b.word
        WHERE levenshtein(a.word, b.word) <= 2
    """,
    section="F2,F6,D1",
    description="blocked fuzzy token matching: vocabulary pairs within 2 "
    "edits, self-joined only inside (length-bucket, first-char) blocks — "
    "the no-cartesian entity-resolution shape.  The fixture vocabulary has "
    "no organic near-pairs, so deterministic OCR-style noise (last char "
    "-> 'x' on doc_id%7 docs) is injected first, same scheme as f25's "
    "PII injection; exact blocked oracle",
)
def fuzzy_vocab_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return fuzzy_pairs(noisy_vocabulary(docs))


# ---------------------------------------------------------------------------
# Reciprocal best match — the high-precision tier above raw pair lists
# ---------------------------------------------------------------------------


@graded(
    "fuzzy_mutual_best",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ),
        noisy AS (
            SELECT word FROM toks WHERE word != ''
            UNION ALL
            SELECT substr(word, 1, len(word) - 1) || 'x' AS word
            FROM toks WHERE doc_id % 7 = 0 AND len(word) >= 4
        ),
        vocab AS (SELECT word, count(*) AS n_occurrences FROM noisy GROUP BY 1),
        keyed AS (
            SELECT word,
                   CAST(floor(len(word) / 2.0) AS BIGINT) AS len_b,
                   substr(word, 1, 1) AS c0
            FROM vocab
        ),
        pairs AS (
            SELECT a.word AS wa, b.word AS wb,
                   CAST(levenshtein(a.word, b.word) AS INT) AS dist
            FROM keyed a JOIN keyed b
              ON a.len_b = b.len_b AND a.c0 = b.c0 AND a.word < b.word
            WHERE levenshtein(a.word, b.word) <= 2
        ),
        sym AS (
            SELECT wa AS w, wb AS cand, dist FROM pairs
            UNION ALL SELECT wb, wa, dist FROM pairs
        ),
        best AS (
            SELECT w, cand, dist,
                   row_number() OVER (PARTITION BY w ORDER BY dist, cand) AS rn
            FROM sym
        )
        SELECT a.w AS word_a, a.cand AS word_b, a.dist
        FROM best a JOIN best b
          ON a.cand = b.w AND b.cand = a.w AND a.rn = 1 AND b.rn = 1
        WHERE a.w < a.cand
    """,
    section="F2,C18,C6",
    description="reciprocal best fuzzy match: keep (a, b) only when b is "
    "a's closest candidate AND a is b's (distance, then lexicographic "
    "tiebreak) — the mutual-nearest filter that turns a noisy candidate "
    "pair list into high-precision merge decisions (the same reciprocity "
    "idea as bidirectional-best bitext mining); per-word rank is a "
    "word-partitioned window over the blocked pair graph",
)
def fuzzy_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided best lists are skewed by dense neighborhoods (a hub
    variant is 'best' for many words that are not ITS best); requiring
    reciprocity removes exactly those asymmetric links.  Shape: symmetrize
    the pair list (narrow), per-word rank window, self-join of two rn=1
    streams on the reversed key — all keyed by word, no new shuffle
    classes beyond the pair generation itself."""
    docs = load(spark, "documents", sf_dir)
    pairs = fuzzy_pairs(noisy_vocabulary(docs)).select("word_a", "word_b", "dist")
    sym = pairs.select(
        F.col("word_a").alias("w"), F.col("word_b").alias("cand"), "dist"
    ).unionAll(
        pairs.select(
            F.col("word_b").alias("w"), F.col("word_a").alias("cand"), "dist"
        )
    )
    wbest = Window.partitionBy("w").orderBy("dist", "cand")
    best = (
        sym.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("w", "cand", "dist")
    )
    a = best.select(
        F.col("w").alias("word_a"), F.col("cand").alias("word_b"), "dist"
    )
    b = best.select(
        F.col("cand").alias("word_a"), F.col("w").alias("word_b")
    )
    return (
        a.join(b, ["word_a", "word_b"], "left_semi")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b", "dist")
    )
