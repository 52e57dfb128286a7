"""F-series: n-gram corpus operators — contamination, repetition, span dedup.

Three training-data-pipeline operators built on one shared primitive
(contiguous token n-grams as a generated array column):

* **f22 benchmark decontamination** — flag training documents whose
  n-grams overlap a held-out benchmark slice (the standard eval-leakage
  check run before LLM training).
* **f23 repetition profile** — within-document duplicate-n-gram ratios
  (the Gopher/C4 "repetitious text" signal at n-gram granularity).
* **f24 exact substring-span dedup** — document pairs sharing a
  fixed-width token span, the distributed approximation of suffix-array
  substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better").

Everything is built-in Column algebra (split / sequence / transform /
slice / explode) — no Python in the hot path, so n-gram generation stays
inside whole-stage codegen and rides the parquet scan.

Scale notes (100 TB):

* n-gram explosion is a generator, not a shuffle — rows fan out inside
  the scan stage; only the aggregations/joins shuffle.
* f22 broadcasts the benchmark n-gram set (a held-out benchmark is small
  by definition; for a multi-GB benchmark switch the hint to a shuffle
  join on the gram).
* f24's library form (:func:`span_pairs`) joins on ``xxhash64(span)`` so
  the shuffle carries 8-byte keys instead of ~100-byte strings; the
  graded query joins on the span string itself so the DuckDB oracle is
  bit-exact (at 64-bit hash width, collisions at corpus scale are
  ~n²/2⁶⁵ — acceptable for dedup, not for the correctness gate).
* All emitted metrics are exact int64s; threshold decisions are
  cross-multiplied integers (``cont*10 >= total``), never float ratios —
  bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

#: Benchmark slice for the graded decontamination query: a fixed set of
#: sources plays the role of the held-out eval suite.
BENCH_SOURCES = ("src0", "src1", "src2")
CONTAM_N = 4  # n-gram width for contamination
SPAN_WIDTH = 15  # token-span width for substring dedup


def token_ngrams(text: Column, n: int) -> Column:
    """Contiguous ``n``-token grams of a whitespace-tokenized text column.

    Pure Column algebra: ``sequence`` over start offsets + ``slice`` +
    ``concat_ws``.  Guarded so texts shorter than ``n`` tokens yield an
    empty array (Spark's ``sequence(1, k)`` is *descending* for k < 1,
    which would silently emit garbage grams).
    """
    toks = F.split(text, " ")
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _doc_grams(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """(doc_id, source, gram) — one row per n-gram occurrence.

    Widened (guide §2.5): the single-row-group fixture scan would
    otherwise run the split+slice n-gram generation in one task."""
    from pulsar_message_filter_spark.io import widen

    return (
        widen(load(spark, "documents", sf_dir), "doc_id")
        .select(
            "doc_id",
            "source",
            F.explode(token_ngrams(F.col("text"), n)).alias("gram"),
        )
    )


# ---------------------------------------------------------------------------
# F22 — benchmark decontamination
# ---------------------------------------------------------------------------


@graded(
    "f22_contamination",
    oracle=f"""
        WITH ng AS (
            SELECT doc_id, source,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text,' ')) - {CONTAM_N - 1}, 0)),
                       i -> array_to_string((string_split(text,' '))[i:i+{CONTAM_N - 1}], ' '))) AS gram
            FROM documents
        ),
        bench AS (
            SELECT DISTINCT gram FROM ng WHERE source IN {BENCH_SOURCES!r}
        ),
        train AS (
            SELECT doc_id, count(DISTINCT gram) AS total_grams
            FROM ng WHERE source NOT IN {BENCH_SOURCES!r} GROUP BY 1
        ),
        hits AS (
            SELECT n.doc_id, count(DISTINCT n.gram) AS contaminated_grams
            FROM ng n JOIN bench USING (gram)
            WHERE n.source NOT IN {BENCH_SOURCES!r}
            GROUP BY 1
        )
        SELECT t.doc_id,
               t.total_grams,
               h.contaminated_grams,
               CAST(h.contaminated_grams * 10 >= t.total_grams AS INT) AS flag_10pct
        FROM train t JOIN hits h USING (doc_id)
    """,
    section="F2,F6",
    description="benchmark decontamination: training docs sharing "
    f"{CONTAM_N}-grams with the held-out benchmark sources (broadcast "
    "benchmark-gram set; exact integer overlap counts)",
)
def f22_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs that leak benchmark n-grams.

    The benchmark's distinct-gram set is broadcast (eval suites are MBs,
    not TBs), so the only shuffle is the per-doc distinct aggregation —
    keyed by doc_id, uniform, map-side combinable.
    """
    grams = _doc_grams(spark, sf_dir, CONTAM_N)
    bench = (
        grams.filter(F.col("source").isin(*BENCH_SOURCES)).select("gram").distinct()
    )
    train = grams.filter(~F.col("source").isin(*BENCH_SOURCES))
    # ONE doc-keyed pass computes both distinct counts (total, and
    # contaminated via a broadcast membership mark), where the previous
    # shape ran two full aggregations over the exploded grams and joined
    # them — that was a third explode of the corpus plus an extra shuffle
    # (guide §2.3/§2.4).  The inner totals⋈hits join's row set is
    # recovered exactly by keeping only docs with ≥1 contaminated gram.
    marked = train.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "gram", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("total_grams"),
        F.countDistinct(
            F.when(F.col("__hit") == 1, F.col("gram"))
        ).alias("contaminated_grams"),
    )
    return per_doc.filter(F.col("contaminated_grams") > 0).select(
        "doc_id",
        "total_grams",
        "contaminated_grams",
        (F.col("contaminated_grams") * 10 >= F.col("total_grams"))
        .cast("int")
        .alias("flag_10pct"),
    )


@graded(
    "f22b_contamination_approx",
    oracle=None,  # HLL sketch counts are engine-specific -> rows-only
    section="F2,C12",
    description="f22's 100 TB escape hatch: approx_count_distinct (HLL) for "
    "the per-doc gram counts -- the exact countDistinct shuffle (scale "
    "exponent 0.45, SCALING.md) becomes a fixed-width sketch merge; "
    "rows-only by design, with the exact twin as pytest ground truth",
)
def f22b_contamination_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate decontamination for corpus scale.

    Identical pipeline to :func:`f22_contamination` with HLL sketches
    (2% rsd) replacing exact distinct counts: the per-doc aggregation
    becomes mergeable fixed-width state, eliminating the gram-value
    shuffle that dominates f22's scale exponent.  The 10% flag threshold
    tolerates the sketch error for every non-borderline doc; pytest
    bounds the disagreement against the exact twin."""
    grams = _doc_grams(spark, sf_dir, CONTAM_N)
    bench = (
        grams.filter(F.col("source").isin(*BENCH_SOURCES)).select("gram").distinct()
    )
    train = grams.filter(~F.col("source").isin(*BENCH_SOURCES))
    totals = train.groupBy("doc_id").agg(
        F.approx_count_distinct("gram", 0.02).alias("total_grams")
    )
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.approx_count_distinct("gram", 0.02).alias("contaminated_grams"))
    )
    return totals.join(hits, "doc_id").select(
        "doc_id",
        "total_grams",
        "contaminated_grams",
        (F.col("contaminated_grams") * 10 >= F.col("total_grams"))
        .cast("int")
        .alias("flag_10pct"),
    )


# ---------------------------------------------------------------------------
# F23 — within-document repetition profile
# ---------------------------------------------------------------------------


@graded(
    "f23_repetition_profile",
    oracle="""
        WITH bg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text,' ')) - 1, 0)),
                       i -> array_to_string((string_split(text,' '))[i:i+1], ' '))) AS gram
            FROM documents
        ),
        per_gram AS (
            SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               count(*) AS n_distinct_bigrams,
               CAST(max(c) AS BIGINT) AS top_bigram_count,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_bigrams,
               CAST((sum(c) - count(*)) * 5 >= sum(c) AS INT) AS flag_repetitive
        FROM per_gram GROUP BY 1
    """,
    section="F11,F6",
    description="Gopher-style within-doc repetition: duplicate-bigram mass "
    "and top-bigram share as exact integers (flag at dup fraction >= 20%)",
)
def f23_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-bigram profile.

    Two map-side-combinable aggregations keyed by (doc_id, gram) then
    doc_id — both uniform keys.  No joins; at 100 TB this is a single
    shuffle of (doc_id, gram) partial counts.
    """
    bg = _doc_grams(spark, sf_dir, 2).drop("source")
    per_gram = bg.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.max("c").alias("top_bigram_count"),
        (F.sum("c") - F.count("*")).alias("dup_bigrams"),
        ((F.sum("c") - F.count("*")) * 5 >= F.sum("c"))
        .cast("int")
        .alias("flag_repetitive"),
    )


# ---------------------------------------------------------------------------
# F24 — exact substring-span dedup (distributed suffix-dedup approximation)
# ---------------------------------------------------------------------------


def span_pairs(docs: DataFrame, width: int = SPAN_WIDTH) -> DataFrame:
    """Document pairs sharing >=1 exact ``width``-token span — scale path.

    Joins on ``xxhash64(span)`` so the shuffle carries 8-byte keys; the
    span string never leaves the map side.  Output: (doc_a, doc_b,
    n_shared_spans).  Collision risk at 64 bits is ~n²/2⁶⁵ — fine for
    dedup decisions.
    """
    spans = docs.select(
        "doc_id", F.explode(token_ngrams(F.col("text"), width)).alias("span")
    ).select("doc_id", F.xxhash64("span").alias("h"))
    a = spans.alias("a")
    b = spans.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.h").alias("h"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("h").alias("n_shared_spans"))
    )


@graded(
    "f24_span_dedup",
    oracle=f"""
        WITH spans AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text,' ')) - {SPAN_WIDTH - 1}, 0)),
                       i -> array_to_string((string_split(text,' '))[i:i+{SPAN_WIDTH - 1}], ' '))) AS span
            FROM documents
        )
        SELECT a.doc_id AS doc_a,
               b.doc_id AS doc_b,
               count(DISTINCT a.span) AS n_shared_spans
        FROM spans a JOIN spans b ON a.span = b.span AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    """,
    section="F1,F2",
    description=f"exact substring dedup: doc pairs sharing a {SPAN_WIDTH}-token "
    "span (distributed suffix-dedup approximation; graded form joins on the "
    "span string for oracle exactness, span_pairs() hashes for scale)",
)
def f24_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    spans = docs.select(
        "doc_id", F.explode(token_ngrams(F.col("text"), SPAN_WIDTH)).alias("span")
    )
    a = spans.alias("a")
    b = spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.span") == F.col("b.span"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.span").alias("span"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("span").alias("n_shared_spans"))
    )


@graded(
    "f31_neardup_degree_profile",
    oracle=f"""
        WITH spans AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text,' ')) - {SPAN_WIDTH - 1}, 0)),
                       i -> array_to_string((string_split(text,' '))[i:i+{SPAN_WIDTH - 1}], ' '))) AS span
            FROM documents
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM spans a JOIN spans b ON a.span = b.span AND a.doc_id < b.doc_id
        ),
        degrees AS (
            SELECT doc_id, count(*) AS degree FROM (
                SELECT doc_a AS doc_id, doc_b AS partner FROM pairs
                UNION ALL
                SELECT doc_b AS doc_id, doc_a AS partner FROM pairs
            ) GROUP BY 1
        )
        SELECT COALESCE(dg.degree, 0) AS degree,
               count(*) AS n_docs
        FROM documents d LEFT JOIN degrees dg USING (doc_id)
        GROUP BY 1
    """,
    section="F2,F1,C11",
    description="near-dup graph degree profile: per-doc partner counts over "
    "the shared-span pair graph (degree 0 = unique docs included) -- the "
    "triage report that decides whether dedup needs the transitive-"
    "closure pass (f20) or pairwise removal suffices",
)
def f31_neardup_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of near-dup graph degrees.

    High-degree nodes are template/boilerplate clusters (one survivor per
    cluster via f20's connected components); degree-1 tails are simple
    pair dedup.  The pair graph reuses the span equi-join; the degree agg
    is doc-keyed and uniform.  Docs with no partner appear as degree 0
    via the left join against the full corpus."""
    docs = load(spark, "documents", sf_dir)
    spans = docs.select(
        "doc_id", F.explode(token_ngrams(F.col("text"), SPAN_WIDTH)).alias("span")
    )
    a = spans.alias("a")
    b = spans.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.span") == F.col("b.span"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    edges = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    degrees = edges.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return (
        docs.select("doc_id")
        .join(degrees, "doc_id", "left")
        .groupBy(F.coalesce("degree", F.lit(0)).alias("degree"))
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# F33 — quality-dominated survivor pick over the near-dup pair graph
# ---------------------------------------------------------------------------


def survivor_pick(
    pairs: DataFrame, quality: DataFrame, id_col: str = "doc_id", q_col: str = "n_chars"
) -> DataFrame:
    """Per-doc keep/remove decision over an undirected near-dup pair graph.

    Rule (deterministic, single-pass, SQL-expressible): a doc is removed
    iff at least one partner *dominates* it — higher ``q_col``, or equal
    ``q_col`` with a smaller id (total order, so every connected pair
    removes at least one side and the per-component quality maximum always
    survives).  Unlike the transitive-closure pick
    (:func:`~pulsar_message_filter_spark.operators.dedup.connected_components`),
    this needs NO iteration: one edge expansion + one join to the quality
    column + one doc-keyed aggregation, all equi-shuffles on the doc id.

    Input ``pairs``: ``(doc_a, doc_b)``; ``quality``: ``(id_col, q_col)``.
    Output: ``(doc_id, n_partners, n_dominators, kept)`` for every doc
    that appears in the pair graph.
    """
    edges = pairs.select(
        F.col("doc_a").alias(id_col), F.col("doc_b").alias("partner")
    ).unionByName(
        pairs.select(F.col("doc_b").alias(id_col), F.col("doc_a").alias("partner"))
    )
    mine = quality.select(F.col(id_col), F.col(q_col).alias("_my_q"))
    theirs = quality.select(
        F.col(id_col).alias("partner"), F.col(q_col).alias("_partner_q")
    )
    dominated = (
        F.col("_partner_q") > F.col("_my_q")
    ) | ((F.col("_partner_q") == F.col("_my_q")) & (F.col("partner") < F.col(id_col)))
    return (
        edges.join(mine, id_col)
        .join(theirs, "partner")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_partners"),
            F.sum(dominated.cast("long")).alias("n_dominators"),
            (F.sum(dominated.cast("long")) == 0).cast("int").alias("kept"),
        )
    )


@graded(
    "f33_dedup_survivor_pick",
    oracle=f"""
        WITH spans AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(string_split(text,' ')) - {SPAN_WIDTH - 1}, 0)),
                       i -> array_to_string((string_split(text,' '))[i:i+{SPAN_WIDTH - 1}], ' '))) AS span
            FROM documents
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM spans a JOIN spans b ON a.span = b.span AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS doc_id, doc_b AS partner FROM pairs
            UNION ALL
            SELECT doc_b AS doc_id, doc_a AS partner FROM pairs
        ),
        j AS (
            SELECT e.doc_id,
                   CASE WHEN p.n_chars > d.n_chars
                         OR (p.n_chars = d.n_chars AND e.partner < e.doc_id)
                        THEN 1 ELSE 0 END AS dom
            FROM edges e
            JOIN documents d ON e.doc_id = d.doc_id
            JOIN documents p ON e.partner = p.doc_id
        )
        SELECT doc_id,
               count(*) AS n_partners,
               CAST(sum(dom) AS BIGINT) AS n_dominators,
               CAST(sum(dom) = 0 AS INT) AS kept
        FROM j GROUP BY 1
    """,
    section="F1,F2,C4,C11",
    description="dedup survivor pick: docs in the shared-span pair graph "
    "keep/remove by quality domination (longer n_chars wins, smaller id "
    "breaks ties) — the non-iterative alternative to the f20 "
    "connected-components pick; one edge expansion + doc-keyed agg",
)
def f33_dedup_survivor_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded form over the f24 span-pair graph with ``n_chars`` quality.

    The per-component quality maximum is never dominated, so at least one
    doc per near-dup component survives; every other doc with a dominating
    partner is dropped in one pass.  Residual chains (B removed for A,
    C removed for B but not A) err on the *remove* side — acceptable for
    dedup, and the reason the iterative f20 pick also exists."""
    docs = load(spark, "documents", sf_dir)
    spans = docs.select(
        "doc_id", F.explode(token_ngrams(F.col("text"), SPAN_WIDTH)).alias("span")
    )
    a = spans.alias("a")
    b = spans.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.span") == F.col("b.span"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return survivor_pick(pairs, docs.select("doc_id", "n_chars"))


# ---------------------------------------------------------------------------
# F53 — BPE-style tokenizer induction: first-round pair-merge statistics
# ---------------------------------------------------------------------------

_BPE_TOP = 20


@graded(
    "f53_bpe_pair_merges",
    oracle=f"""
        WITH words AS (
            SELECT word, count(*) AS wc FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE length(word) >= 2 GROUP BY word
        ),
        pairs AS (
            SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                          i -> substr(word, i, 2))) AS pair,
                   wc
            FROM words
        )
        SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count
        FROM pairs GROUP BY pair
        ORDER BY pair_count DESC, pair ASC
        LIMIT {_BPE_TOP}
    """,
    section="F6,F8,D5,C22",
    description="BPE tokenizer induction, round one: corpus-weighted "
    "adjacent-character pair counts (the argmax pair is the first BPE "
    "merge) via higher-order array functions — no UDF; top-20 with "
    "deterministic (count desc, pair asc) tiebreak",
)
def f53_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First iteration of byte-pair-encoding vocabulary induction: the
    frequency table of adjacent symbol pairs, weighted by word frequency.
    A full BPE trainer loops argmax-merge N times on the driver over this
    (small) pair table; the expensive corpus pass below is the part that
    must scale, and it is pure map-side-combinable relational algebra —
    explode of a ``transform(sequence(...))`` pair array computed in
    codegen, then one groupBy.

    Guard: 1-char words are filtered BEFORE ``sequence(1, len-1)`` —
    Spark's sequence infers a NEGATIVE step when start > stop, so an
    unguarded len=1 word would yield [1, 0], not an empty list."""
    docs = load(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(_BPE_TOP)
    )
