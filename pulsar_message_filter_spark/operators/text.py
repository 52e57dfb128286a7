"""F-series: text analysis over the document corpus (SURVEY.md §2.F6–F11).

Everything is built-in Column algebra (split / explode / higher-order
lambdas) — no UDFs in the hot path, so at 100 TB these stay inside
whole-stage codegen and the only shuffles are the final aggregations.

Integer-ratio outputs (token counts, distinct ratios) divide exact int64s,
which is bit-identical across engines — no rounding gymnastics needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

STOPWORDS = ("the", "a", "of", "and")


def tokens(col: Column) -> Column:
    return F.split(col, " ")


# ---------------------------------------------------------------------------
# F6 — tokenization + corpus token statistics
# ---------------------------------------------------------------------------


@graded(
    "f6_token_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens,
               max(len(string_split(text, ' '))) AS max_tokens
        FROM documents GROUP BY 1
    """,
    section="F6",
    description="token counts per language (exact integer ratios)",
)
def f6_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).withColumn(
        "n_tok", F.size(tokens(F.col("text")))
    )
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_tok").cast("double") / F.count("*")).alias("avg_tokens"),
        F.max("n_tok").cast("long").alias("max_tokens"),
    )


# ---------------------------------------------------------------------------
# F7 — stopword removal (higher-order filter, no UDF)
# ---------------------------------------------------------------------------


@graded(
    "f7_stopword_filter",
    oracle=f"""
        SELECT lang,
               CAST(sum(len(list_filter(string_split(text, ' '),
                       t -> t NOT IN {STOPWORDS!r}))) AS BIGINT) AS content_tokens,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS all_tokens
        FROM documents GROUP BY 1
    """,
    section="F7",
    description="stopword removal via array filter lambda; content vs total tokens",
)
def f7_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens(F.col("text"))
    content = F.filter(toks, lambda t: ~t.isin(*STOPWORDS))
    return (
        load(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            F.sum(F.size(content)).alias("content_tokens"),
            F.sum(F.size(toks)).alias("all_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# F8 — n-grams (bigram frequency table)
# ---------------------------------------------------------------------------


def ngrams(toks: Column, n: int) -> Column:
    """Token n-grams via an index-sequence transform (1-indexed element_at)."""
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), joined)
    )


@graded(
    "f8_top_bigrams",
    oracle="""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
             bi AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1])) AS bigram
                    FROM toks WHERE len(t) >= 2)
        SELECT bigram, count(*) AS n FROM bi
        GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20
    """,
    section="F8",
    description="top-20 bigrams corpus-wide (deterministic tiebreak)",
)
def f8_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(ngrams(tokens(F.col("text")), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# F9 — TF-IDF (pure DataFrame algebra; no HashingTF, for oracle parity)
# ---------------------------------------------------------------------------


@graded(
    "f9_tfidf",
    oracle="""
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term,
               round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
        ORDER BY tfidf DESC, term, doc_id LIMIT 25
    """,
    section="F9",
    description="TF-IDF (smoothed idf) top-25 terms, pure relational algebra",
)
def f9_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "term", "doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# F10 — corpus profiling
# ---------------------------------------------------------------------------


@graded(
    "f10_corpus_profile",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
               round(quantile_cont(n_chars, 0.5), 2) AS median_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY 1, 2
    """,
    section="F10,C11,C14",
    description="per (lang, source) corpus profile: counts + length distribution",
)
def f10_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "documents", sf_dir)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 2).alias("median_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# F11 — heuristic quality filters (C4/Gopher-style, public heuristics)
# ---------------------------------------------------------------------------


def quality_flags(text: Column) -> dict[str, Column]:
    """Boolean quality heuristics over a text column (all Column algebra)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    avg_word_len = (F.length(text) - (n_tok - 1)).cast("double") / n_tok
    return {
        "len_ok": (n_tok >= 5) & (n_tok <= 500),
        "word_len_ok": (avg_word_len >= 2.0) & (avg_word_len <= 12.0),
        "diversity_ok": (n_distinct.cast("double") / n_tok) > 0.3,
    }


@graded(
    "f11_quality_filter",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct,
                   CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                     / len(string_split(text, ' ')) AS avg_word_len
            FROM documents
        )
        SELECT doc_id,
               (n_tok >= 5 AND n_tok <= 500) AS len_ok,
               (avg_word_len >= 2.0 AND avg_word_len <= 12.0) AS word_len_ok,
               (CAST(n_distinct AS DOUBLE) / n_tok > 0.3) AS diversity_ok,
               ((n_tok >= 5 AND n_tok <= 500)
                AND (avg_word_len >= 2.0 AND avg_word_len <= 12.0)
                AND (CAST(n_distinct AS DOUBLE) / n_tok > 0.3)) AS quality_pass
        FROM scored
    """,
    section="F11",
    description="heuristic quality flags per document (length / word-length / "
    "lexical-diversity bounds)",
)
def f11_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    flags = quality_flags(F.col("text"))
    passes = flags["len_ok"] & flags["word_len_ok"] & flags["diversity_ok"]
    return docs.select(
        "doc_id",
        flags["len_ok"].alias("len_ok"),
        flags["word_len_ok"].alias("word_len_ok"),
        flags["diversity_ok"].alias("diversity_ok"),
        passes.alias("quality_pass"),
    )


# ---------------------------------------------------------------------------
# F6c — BPE-ish regex token counting (subword-shaped segmentation)
# ---------------------------------------------------------------------------

#: A BPE-ish segmentation regex (public GPT-2-style shape, simplified to the
#: corpus alphabet): word pieces of up to 4 chars — a cheap, deterministic
#: proxy for subword token counts.
_PIECE_RE = "[a-z]{1,4}"


@graded(
    "f6c_subword_counts",
    oracle=f"""
        SELECT lang,
               CAST(sum(len(regexp_extract_all(text, '{_PIECE_RE}'))) AS BIGINT) AS n_pieces,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
               CAST(sum(len(regexp_extract_all(text, '{_PIECE_RE}'))) AS DOUBLE)
                 / sum(len(string_split(text, ' '))) AS pieces_per_word
        FROM documents GROUP BY 1
    """,
    section="F6",
    description="token counting via a BPE-ish segmentation regex "
    "(regexp_count; exact integer ratios)",
)
def f6c_subword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pieces = F.regexp_count("text", F.lit(_PIECE_RE))
    words = F.size(tokens(F.col("text")))
    return (
        load(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            F.sum(pieces).alias("n_pieces"),
            F.sum(words).alias("n_words"),
            (F.sum(pieces).cast("double") / F.sum(words)).alias("pieces_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# F6d — document fingerprint (polynomial rolling hash, SQL-expressible)
# ---------------------------------------------------------------------------

_FP_MOD = 1_000_000_007


@graded(
    "f6d_rolling_fingerprint",
    oracle=f"""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                                      t -> CAST(7 * length(t) + ascii(t) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % {_FP_MOD}
               ) AS fingerprint
        FROM documents WHERE doc_id < 200
    """,
    section="F6,F1",
    description="order-sensitive document fingerprint: polynomial rolling hash "
    "over token features — pure fold, identical on both engines",
)
def f6d_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    token_feature = F.transform(
        tokens(F.col("text")),
        lambda t: (F.lit(7) * F.length(t) + F.ascii(t)).cast("long"),
    )
    fingerprint = F.aggregate(
        token_feature,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _FP_MOD,
    )
    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", fingerprint.alias("fingerprint"))
    )


# ---------------------------------------------------------------------------
# F11b — Gopher-style repetition/composition ratios (public heuristics)
# ---------------------------------------------------------------------------


@graded(
    "f11b_gopher_ratios",
    oracle=f"""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                        t -> t IN {STOPWORDS!r})) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(len(string_split(text, ' '))
                    - len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS repeated_token_ratio
        FROM documents WHERE doc_id < 300
    """,
    section="F11",
    description="Gopher-style composition ratios: stopword fraction + "
    "repeated-token fraction (exact int ratios)",
)
def f11b_gopher_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens(F.col("text"))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_rep = n - F.size(F.array_distinct(toks))
    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            (n_stop.cast("double") / n).alias("stopword_ratio"),
            (n_rep.cast("double") / n).alias("repeated_token_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# F6e — language-ID heuristic (marker-word scoring, argmax with tiebreak)
# ---------------------------------------------------------------------------

#: Deterministic marker sets (the heuristic's shape is what matters; on this
#: synthetic shared-vocabulary corpus the scores tie often — the tiebreak
#: makes the argmax deterministic and oracle-checkable anyway).
_LANG_MARKERS = {
    "en": ("the", "fast", "join"),
    "de": ("der", "und", "batch"),
    "es": ("el", "la", "stream"),
    "fr": ("le", "et", "vector"),
    "zh": ("data", "big", "hash"),
}


def _marker_score(lang: str):
    toks = tokens(F.col("text"))
    return F.size(F.filter(toks, lambda t: t.isin(*_LANG_MARKERS[lang])))


@graded(
    "f6e_langid_heuristic",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text,' '), t -> t IN ('the','fast','join'))) AS s_en,
                   len(list_filter(string_split(text,' '), t -> t IN ('der','und','batch'))) AS s_de,
                   len(list_filter(string_split(text,' '), t -> t IN ('el','la','stream'))) AS s_es,
                   len(list_filter(string_split(text,' '), t -> t IN ('le','et','vector'))) AS s_fr,
                   len(list_filter(string_split(text,' '), t -> t IN ('data','big','hash'))) AS s_zh
            FROM documents WHERE doc_id < 300
        )
        SELECT doc_id, lang AS true_lang,
               CASE greatest(s_en, s_de, s_es, s_fr, s_zh)
                    WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
                    WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
        FROM scored
    """,
    section="F6",
    description="language-ID heuristic: marker-word scores, deterministic "
    "argmax (alphabetical tiebreak)",
)
def f6e_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    scores = {lang: _marker_score(lang) for lang in sorted(_LANG_MARKERS)}
    best = F.greatest(*scores.values())
    pred = F.when(scores["de"] == best, "de")
    for lang in ("en", "es", "fr"):
        pred = pred.when(scores[lang] == best, lang)
    pred = pred.otherwise("zh")
    return docs.select(
        "doc_id", F.col("lang").alias("true_lang"), pred.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# F6b — language-ID heuristic (stopword-profile n-gram scoring)
# ---------------------------------------------------------------------------


@graded(
    "f6b_char_profile",
    oracle="""
        SELECT lang,
               round(CAST(sum(length(replace(text, ' ', ''))) AS DOUBLE)
                     / sum(len(string_split(text, ' '))), 6) AS chars_per_token,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    section="F6",
    description="per-language character profile (chars/token — the language-ID "
    "heuristic's core feature, exact int ratio)",
)
def f6b_char_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        F.round(
            F.sum(F.length(F.regexp_replace("text", " ", ""))).cast("double")
            / F.sum(F.size(tokens(F.col("text")))),
            6,
        ).alias("chars_per_token"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# F11/F1/C26 composite — the end-to-end curation pipeline
# ---------------------------------------------------------------------------


@graded(
    "f15_curation_pipeline",
    oracle=r"""
        WITH scored AS (
            SELECT *,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct,
                   CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                     / len(string_split(text, ' ')) AS avg_word_len
            FROM documents
        ),
        q AS (
            SELECT * FROM scored
            WHERE n_tok >= 5 AND n_tok <= 500
              AND avg_word_len >= 2.0 AND avg_word_len <= 12.0
              AND CAST(n_distinct AS DOUBLE) / n_tok > 0.3
        ),
        d AS (
            SELECT * FROM q
            WHERE doc_id IN (
                SELECT min(doc_id) FROM q
                GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        ),
        s AS (
            SELECT * FROM d
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        FROM s GROUP BY 1
    """,
    section="F11,F1,C26,F6,F10",
    description="end-to-end curation pipeline: quality filter -> exact dedup "
    "keep-first -> deterministic 50% content-hash sample -> per-language "
    "corpus stats — the LLM-data operators composing, every stage "
    "oracle-checkable (the production shape: each stage is a pure "
    "DataFrame->DataFrame transform, so the chain scales like its worst "
    "stage, the content-hash-keyed dedup shuffle)",
)
def f15_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pulsar_message_filter_spark.operators.dedup import canonical_text
    from pulsar_message_filter_spark.operators.sampling import hash_sample

    # (measured this round: widening the narrow doc scan here was SLOWER —
    # quality_flags is a few splits per row, cheaper than the raw-text
    # exchange widening adds; contrast f22's n-gram explode where widen wins)
    docs = load(spark, "documents", sf_dir)
    flags = quality_flags(F.col("text"))
    q = docs.filter(flags["len_ok"] & flags["word_len_ok"] & flags["diversity_ok"])
    w = Window.partitionBy(canonical_text(F.col("text"))).orderBy("doc_id")
    d = q.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    s = hash_sample(d, "doc_id", "80")
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# F36 — token-entropy quality signal
# ---------------------------------------------------------------------------


def token_entropy(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon entropy (nats) of the token distribution.

    ``H = ln(n) - Σ c·ln(c) / n`` over exact int64 token counts — the two
    float ops (ln, divide) run on identical integers in any engine, so the
    6-dp rounding is stable.  Low entropy = repetitive/boilerplate text
    (the SlimPajama/Gopher "mostly the same token" signal); high entropy
    on short docs = noise.  One explode + two doc-keyed aggregations, no
    UDFs — at 100 TB this is a map-side-combinable shuffle on doc_id.
    """
    counts = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct_tokens"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double"),
            6,
        ).alias("entropy_nats"),
    )


@graded(
    "f36_token_entropy",
    oracle="""
        WITH counts AS (
            SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ) GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct_tokens,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE), 6) AS entropy_nats
        FROM counts GROUP BY 1
    """,
    section="F6,F11,C11",
    description="token-entropy quality signal: per-doc Shannon entropy of "
    "the token distribution from exact integer counts (ln/divide on "
    "identical int64s on both engines, 6-dp rounded) — the repetitive-"
    "boilerplate detector entropy-thresholded pipelines use",
)
def f36_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_entropy(load(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# Unigram LM surprisal — likelihood-based quality scoring
# ---------------------------------------------------------------------------


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document average unigram surprisal (bits/token): fit a unigram
    LM on the corpus itself (token counts / total) in one grouped pass,
    then score every document by ``avg(log2(N / c_term))`` — the cheap,
    fully-relational stand-in for perplexity filtering in LLM-data
    curation (high surprisal ⇒ rare-token-heavy docs: gibberish, boiler-
    plate explosions, wrong-language fragments).

    Scale: one explode + vocab groupBy (map-side combined), then a
    token→count join that Spark broadcasts while the vocab fits (natural-
    language vocab grows ~O(corpus^0.5), Heaps' law, so it fits far longer
    than the corpus does), and a final doc-keyed agg.  No UDF anywhere."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = toks.agg(F.count("*").alias("n"))
    return (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))  # 1-row aggregate: always broadcast
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(F.avg(F.log2(F.col("n").cast("double") / F.col("c"))), 4).alias(
                "avg_surprisal"
            ),
        )
    )


@graded(
    "f38_unigram_surprisal",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        tot AS (SELECT count(*) AS n FROM toks)
        SELECT doc_id, count(*) AS n_tok,
               round(avg(log2(CAST(n AS DOUBLE) / c)), 4) AS avg_surprisal
        FROM toks JOIN cnt USING (term) CROSS JOIN tot
        GROUP BY 1
    """,
    section="F6,F11,C11",
    description="unigram-LM surprisal per doc (bits/token): corpus-fit "
    "token probabilities, then avg log2(N/c) — the relational perplexity "
    "proxy for likelihood-based quality filtering; explode + broadcast "
    "vocab join + doc-keyed agg, no UDF",
)
def f38_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    return unigram_surprisal(docs)


# ---------------------------------------------------------------------------
# F42 — overlapping-window document chunking (RAG / context packing)
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame, window_tokens: int = 12, stride: int = 8
) -> DataFrame:
    """Split each document into overlapping token windows (``window_tokens``
    wide, ``stride`` apart) — the retrieval/chunk-embedding preprocessing
    step.  Pure generator algebra: ``sequence`` makes the start offsets,
    ``explode`` fans out, ``slice`` cuts the window — 1→N row expansion
    with NO shuffle (narrow transformation on the scan), so at 100 TB it
    runs at scan speed and the downstream chunk-keyed ops (dedup by
    chunk hash, embedding fan-out) inherit clean keys.

    Every document yields at least one chunk (short docs produce one
    truncated window).  Chunks carry a deterministic md5 so identity is
    content-addressed across engines and re-runs."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(n - (window_tokens - 1), F.lit(1)), F.lit(stride)
    )
    chunk = F.slice(toks, F.col("start"), window_tokens)
    return (
        docs.select("doc_id", toks.alias("__t"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            F.size(F.slice("__t", F.col("start"), window_tokens))
            .cast("long")
            .alias("n_tok"),
            F.md5(F.concat_ws(" ", F.slice("__t", F.col("start"), window_tokens))).alias(
                "chunk_md5"
            ),
        )
    )


@graded(
    "f42_doc_chunking",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        )
        SELECT doc_id, start,
               len(t[start:start+11]) AS n_tok,
               md5(array_to_string(t[start:start+11], ' ')) AS chunk_md5
        FROM toks,
             unnest(generate_series(1, greatest(len(t) - 11, 1), 8)) AS u(start)
    """,
    section="F6,F14,D5,D8",
    description="RAG-style document chunking: overlapping 12-token windows "
    "at stride 8 via sequence+explode+slice (scan-speed 1-to-N fan-out, "
    "no shuffle), content-addressed chunk md5 — the chunk-embedding / "
    "chunk-dedup preprocessing primitive",
)
def f42_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    return chunk_documents(docs)


# ---------------------------------------------------------------------------
# F10/F14 — Zipf rank-frequency fit (corpus-law profiling)
# ---------------------------------------------------------------------------


@graded(
    "corpus_zipf_slope",
    oracle="""
        WITH uni AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        cnt AS (
            SELECT term, count(*) AS c FROM uni WHERE term != '' GROUP BY 1
        ),
        top AS (
            SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rnk
            FROM cnt ORDER BY c DESC, term LIMIT 100
        ),
        pts AS (
            SELECT log10(CAST(rnk AS DOUBLE)) AS x,
                   log10(CAST(c AS DOUBLE)) AS y
            FROM top
        ),
        s AS (
            SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4) AS zipf_slope,
               round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 4)
                   AS intercept,
               round(((sxy - sx * sy / n) * (sxy - sx * sy / n))
                     / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 4) AS r2
        FROM s
    """,
    section="F10,F14,C13",
    description="Zipf law fit: OLS slope of log10(freq) on log10(rank) "
    "over the top-100 vocabulary terms — a natural-language corpus shows "
    "slope near -1; a template/boilerplate-heavy or synthetic corpus "
    "deviates, making this a one-number corpus-health probe next to "
    "f10's profile (float sums over a FIXED 100 points, f38's tolerance "
    "class)",
)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy lifting is the term count (map-side-combinable agg); the fit
    runs on a bounded top-100 frame (TakeOrderedAndProject), ranked by
    the two-phase distributed row_number rather than an unpartitioned
    window, so the plan carries no single-partition stage even though
    the frame is tiny.  Rank ties break on term asc in both engines."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_row_number,
    )

    cnt = (
        load(spark, "documents", sf_dir)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "term").limit(100)
    pts = distributed_row_number(top, [F.desc("c"), "term"], "rk").select(
        F.log10(F.col("rk").cast("double")).alias("x"),
        F.log10(F.col("c").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cxy / cxx
    return s.select(
        n.cast("long").alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 4).alias("intercept"),
        F.round(cxy * cxy / (cxx * cyy), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# F11/G2 — compression-ratio quality signal (deliberate pandas UDF)
# ---------------------------------------------------------------------------


def compression_ratio_col():
    """Arrow-batched pandas UDF: zlib-compressed size / raw size per text.

    The compression-ratio filter is a standard LLM corpus-quality
    heuristic (highly repetitive or templated text compresses far below
    natural prose; random noise barely compresses) used by public
    pipelines in the CCNet/RefinedWeb family.  zlib has no Spark/DuckDB
    SQL builtin, so this is a LEGITIMATE vectorized-UDF surface (G2, same
    class as Jaro-Winkler): level pinned to 6, ratio rounded to 6dp in
    Python so the value is platform-stable.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    # no parameter annotations: this module uses postponed annotation
    # evaluation, which pandas_udf's signature sniffing rejects — the
    # return type is declared explicitly instead
    def _ratio(texts):
        def one(t):
            raw = (t or "").encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return texts.map(one)

    return pandas_udf(_ratio, "double")


@graded(
    "f62_compression_ratio",
    oracle=None,  # zlib has no SQL twin -> rows-only; pytest pins ground truth
    section="F11,G2,F14",
    description="zlib compression-ratio quality score per document "
    "(level 6, the CCNet/RefinedWeb-family repetition heuristic) + "
    "per-source profile: deliberate Arrow-batched pandas UDF (no SQL "
    "zlib), scan-side — repetitive/templated docs sit far below natural "
    "prose; rows-only with exact pytest ground truth vs Python zlib",
)
def f62_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the UDF is a pure map over the scan (Arrow batches, no
    shuffle); the aggregate is a per-source combinable mean.  The flag
    threshold (< 0.4) marks the repetitive tail a curation chain would
    drop or re-weight."""
    ratio = compression_ratio_col()
    scored = (
        load(spark, "documents", sf_dir)
        .select("doc_id", "source", ratio(F.col("text")).alias("zratio"))
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("zratio"), 4).alias("mean_ratio"),
        F.sum((F.col("zratio") < 0.4).cast("long")).alias("n_repetitive"),
    )
