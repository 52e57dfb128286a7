"""Statistical language-model scoring over the corpus — the likelihood
side of data curation that goes beyond per-token unigram surprisal
(``f38``): an interpolated **bigram perplexity** per document, the
**vocabulary Pareto-coverage curve** a tokenizer designer reads before
fixing a vocab size, and an **n-gram novelty score** (what fraction of a
document's shingles appear here first) for curriculum / dedup triage.

Everything is exact relational algebra on the whitespace token stream
(same tokenizer as ``operators/text.py``: ``split(text, ' ')``), so each
query carries a DuckDB oracle.  Float parity follows SURVEY §7.4.3:
integer counts everywhere, doubles only in the final scoring expression,
``round`` on both engines.  ``f54`` is the widest float surface here: it
sums count-weighted ``-log2(p)`` terms per document before ``round(4)``
— the same multi-term-double-sum tolerance class as
``f38_unigram_surprisal`` (summation order across partitions could in
principle flip a value sitting exactly on a 4th-decimal rounding
boundary; accepted risk, none observed across the parity gates).

Scale notes (100 TB):

* The n-gram explodes are narrow (scan-speed 1→N fan-out, no shuffle);
  the only shuffles are the count aggregations (map-side combinable) and
  hash equi-joins keyed by the n-gram string — the canonical distributed
  LM-counting shape (brants et al. style map-reduce LM).
* Nothing is broadcast that scales with corpus size: at real scale the
  vocab / bigram tables are huge, so the probability joins are plain
  shuffle hash joins on uniformly-distributed string keys.
* The coverage curve needs a GLOBAL rank over distinct terms by count —
  that is the repo's two-phase distributed prefix scan
  (:mod:`~pulsar_message_filter_spark.functions.prefix`), never a
  single-partition window (pinned plan contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sums
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

def _toks():
    """Whitespace token array (same tokenizer as operators/text.py)."""
    return F.split(F.col("text"), " ")


# ---------------------------------------------------------------------------
# F54 — interpolated bigram perplexity (bits/bigram) per document
# ---------------------------------------------------------------------------


def bigram_perplexity(docs: DataFrame, lam: float = 0.75) -> DataFrame:
    """Per-document average surprisal (bits) under a corpus-fit bigram LM
    with Jelinek–Mercer interpolation to the unigram model:

        p(w2 | w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N

    ``lam`` defaults to 0.75 (an exact binary fraction, so the double
    arithmetic is engine-portable).  Documents need >= 2 tokens to emit a
    bigram; shorter ones are excluded (mirrored in the oracle).

    Shape: explode unigrams + bigrams (narrow), three combinable count
    aggs, then equi-joins keyed by the n-gram string back onto the
    per-(doc, bigram) stream — no UDF, no broadcast of corpus-sized
    state."""
    toks = docs.select("doc_id", _toks().alias("t")).filter(F.size("t") >= 2)
    uni = docs.select(F.explode(_toks()).alias("term"))
    uni_cnt = uni.groupBy("term").agg(F.count("*").alias("cu"))
    total = uni.agg(F.count("*").alias("n_total"))

    bg_arr = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    doc_bg = (
        toks.select("doc_id", F.explode(bg_arr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
    )
    bg_cnt = (
        toks.select(F.explode(bg_arr).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("cb"))
    )
    p = (
        F.lit(lam) * (F.col("cb").cast("double") / F.col("cw1").cast("double"))
        + F.lit(1.0 - lam)
        * (F.col("cu2").cast("double") / F.col("n_total").cast("double"))
    )
    scored = (
        doc_bg.join(bg_cnt, "bg")
        .join(uni_cnt.withColumnRenamed("term", "w1").withColumnRenamed("cu", "cw1"), "w1")
        .join(uni_cnt.withColumnRenamed("term", "w2").withColumnRenamed("cu", "cu2"), "w2")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "cnt", (-F.log2(p)).alias("bits"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(
                F.sum(F.col("cnt") * F.col("bits")) / F.sum("cnt").cast("double"), 4
            ).alias("avg_bits"),
        )
        .select("doc_id", "n_bigrams", "avg_bits")
    )


@graded(
    "f54_bigram_perplexity",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        uni AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        uni_cnt AS (SELECT term, count(*) AS cu FROM uni GROUP BY 1),
        tot AS (SELECT count(*) AS n_total FROM uni),
        doc_bg AS (
            SELECT doc_id, t[i] || ' ' || t[i+1] AS bg,
                   t[i] AS w1, t[i+1] AS w2, count(*) AS cnt
            FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
            GROUP BY 1, 2, 3, 4
        ),
        bg_cnt AS (
            SELECT t[i] || ' ' || t[i+1] AS bg, count(*) AS cb
            FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
            GROUP BY 1
        )
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
               round(sum(cnt * -log2(
                   0.75 * (CAST(cb AS DOUBLE) / CAST(c1.cu AS DOUBLE))
                 + 0.25 * (CAST(c2.cu AS DOUBLE) / CAST(n_total AS DOUBLE))
               )) / CAST(sum(cnt) AS DOUBLE), 4) AS avg_bits
        FROM doc_bg
        JOIN bg_cnt USING (bg)
        JOIN uni_cnt c1 ON c1.term = doc_bg.w1
        JOIN uni_cnt c2 ON c2.term = doc_bg.w2
        CROSS JOIN tot
        GROUP BY 1
    """,
    section="F6,F11,C11,C4",
    description="interpolated bigram-LM perplexity per doc (bits/bigram, "
    "Jelinek-Mercer lambda=0.75): narrow n-gram explode, map-side-combinable "
    "counts, shuffle equi-joins keyed by n-gram string (Brants-style "
    "distributed LM counting) — the likelihood quality score one tier above "
    "unigram surprisal",
)
def f54_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    # lam pinned explicitly: the oracle SQL hardcodes 0.75/0.25, so a
    # changed library default must not silently desynchronize (ADVICE r03)
    return bigram_perplexity(docs, lam=0.75)


# ---------------------------------------------------------------------------
# F55 — vocabulary Pareto coverage (tokenizer-design curve)
# ---------------------------------------------------------------------------


def vocab_coverage(docs: DataFrame, targets: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """For each coverage target (percent of the token stream), the minimum
    vocabulary size when terms are taken in frequency order (count DESC,
    term ASC as the total-order tiebreak), plus the exact coverage
    achieved at that cut.

    The global frequency rank is a two-phase distributed prefix scan over
    distinct terms (one range partitioning, one tiny offsets broadcast) —
    NOT a single-partition window.  The threshold test is pure integer
    math (``cum*100 >= target*N``), so the cut is engine-exact; the only
    double is the final reported coverage ratio."""
    per_term = (
        docs.select(F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .withColumn("neg_c", -F.col("c"))
        .withColumn("one", F.lit(1).cast("long"))
        .withColumn("g", F.lit(0))
    )
    scanned = distributed_prefix_sums(
        per_term, "g", ["neg_c", "term"], {"c": "cum_tok", "one": "rnk"}
    )
    # n_total = the scan's final cumulative count — derived from `scanned`
    # (already referenced twice below) rather than a second full
    # explode+scan of the corpus, so the exchange is reusable (ADVICE r03)
    total = scanned.agg(F.max("cum_tok").alias("n_total"))
    targets_df = (
        scanned.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(t) for t in targets])).alias("target_pct"))
    )
    hit = (
        scanned.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(targets_df))
        .filter(F.col("cum_tok") * 100 >= F.col("target_pct") * F.col("n_total"))
        .groupBy("target_pct")
        .agg(F.min("rnk").alias("vocab_size"))
    )
    return (
        hit.join(scanned.select("rnk", "cum_tok"), hit.vocab_size == F.col("rnk"))
        .crossJoin(F.broadcast(total))
        .select(
            "target_pct",
            "vocab_size",
            F.round(
                F.col("cum_tok").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("coverage"),
        )
    )


@graded(
    "f55_vocab_coverage",
    oracle="""
        WITH uni AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
        tot AS (SELECT count(*) AS n_total FROM uni),
        ord AS (
            SELECT CAST(sum(c) OVER w AS BIGINT) AS cum_tok,
                   CAST(row_number() OVER w AS BIGINT) AS rnk
            FROM cnt WINDOW w AS (ORDER BY c DESC, term)
        ),
        tgt AS (SELECT unnest([50, 90, 99]) AS target_pct),
        hit AS (
            SELECT target_pct, min(rnk) AS vocab_size
            FROM ord CROSS JOIN tot CROSS JOIN tgt
            WHERE cum_tok * 100 >= target_pct * n_total
            GROUP BY 1
        )
        SELECT CAST(target_pct AS INTEGER) AS target_pct, vocab_size,
               round(CAST(cum_tok AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
                   AS coverage
        FROM hit JOIN ord ON ord.rnk = hit.vocab_size CROSS JOIN tot
    """,
    section="F6,F10,F14,C20",
    description="vocabulary Pareto-coverage curve: minimum vocab size "
    "reaching 50/90/99% token coverage in frequency order — global term "
    "rank via the two-phase distributed prefix scan (no single-partition "
    "window), integer-exact threshold cuts; the curve a tokenizer designer "
    "reads before fixing vocab size",
)
def f55_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    # targets pinned explicitly: the oracle SQL hardcodes [50, 90, 99]
    return vocab_coverage(docs, targets=(50, 90, 99))


# ---------------------------------------------------------------------------
# F56 — n-gram novelty (first-occurrence share) per document
# ---------------------------------------------------------------------------


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per document: the fraction of its DISTINCT ``n``-token shingles
    whose first corpus occurrence (minimum ``doc_id``) is this document —
    a novelty score for dedup triage and curriculum ordering (documents
    that introduce no new n-grams are near-pure rehash).

    Docs with fewer than ``n`` tokens emit no shingles and are excluded
    (mirrored in the oracle).  Shape: narrow shingle fan-out → distinct
    (the one shuffle, keyed by shingle) → combinable min-aggregation →
    equi-join back — the same keyed-by-content-hash shape as exact
    dedup, so it scales identically."""
    toks = docs.select("doc_id", _toks().alias("t")).filter(F.size("t") >= n)
    sh_arr = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("t"), i + k) for k in range(n)]
        ),
    )
    sh = toks.select("doc_id", F.explode(sh_arr).alias("s")).distinct()
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles").cast("double"), 6
            ).alias("novelty_ratio"),
        )
    )


@graded(
    "f56_ngram_novelty",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= 3
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
            FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        ),
        first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        SELECT doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(CAST(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS novelty_ratio
        FROM sh JOIN first USING (s)
        GROUP BY 1
    """,
    section="F6,F8,F1,F11",
    description="3-gram novelty score per doc: share of its distinct "
    "shingles first seen in this doc (min-doc_id attribution) — narrow "
    "shingle fan-out, one distinct shuffle keyed by shingle, combinable "
    "min-agg, equi-join back; the dedup-triage / curriculum-ordering "
    "signal",
)
def f56_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    # n pinned explicitly: the oracle SQL hardcodes trigram indexing
    return ngram_novelty(docs, n=3)
