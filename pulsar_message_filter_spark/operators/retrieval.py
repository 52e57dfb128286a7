"""Retrieval-index operators — BM25 ranking, inverted-index construction,
and chi-squared token/label association (feature selection).

These are the text-retrieval half of a training-data pipeline: BM25 is
the lexical baseline every hybrid retrieval stack keeps next to its
embedding index (see ``ops/similarity.py`` for the dense side and
``f41_rrf_fusion`` for the fusion), the postings build is the batch job
that materializes that index, and the chi-squared scan is the classic
supervised token-selection statistic.

Float parity: scores stay in integer counts until one final double
expression per row; logs are rounded at 6 dp on both engines (same
convention as ``f9_tfidf``).  The chi-squared statistic is an exact
integer cross-ratio until the last division — at fixture scale the
products fit int64 comfortably; at 100 TB row counts the same formula
needs decimal(38,0) partials (the ``agg_gini_exact`` lesson: bound the
SUM, not the term).

Scale notes (100 TB):

* Every aggregation here (tf, df, doc-length, contingency cells) is a
  map-side-combinable groupBy keyed by term or (term, doc) — uniform
  hash keys, no skew beyond stopword terms, which the df band filter
  drops before any wide row forms.
* The document-count / avgdl scalars ride a broadcast, never a shuffle.
* BM25 scoring joins the (doc, term) tf table to a TINY query-term
  frame — broadcast — then aggregates per doc; top-k is
  TakeOrderedAndProject, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.text import tokens
from pulsar_message_filter_spark.registry import graded

_BM25_K1 = 1.2
_BM25_B = 0.75
_QUERY_TERMS = ("hash", "vector", "stream")


def bm25_scores(
    docs: DataFrame,
    query_terms: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Robertson–Spärck
    Jones form, always positive), tf saturation ``tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl))``.  All counts integer; ``avgdl`` is
    one exact int-sum / int-count division broadcast to every scorer."""
    terms = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    scalars = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        terms.agg(F.count("*").alias("total_tokens"))
    )
    q = docs.sparkSession.createDataFrame(
        [(t,) for t in query_terms], ["term"]
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
    )
    return (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(df_.join(F.broadcast(q), "term")), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_part), 6).alias("bm25"))
    )


@graded(
    "f43_bm25_topk",
    oracle=f"""
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM terms GROUP BY 1, 2
        ),
        df AS (
            SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM terms GROUP BY 1
        ),
        dl AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM terms GROUP BY 1
        ),
        scalars AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
                   (SELECT CAST(count(*) AS BIGINT) FROM terms) AS total_tokens
        ),
        q AS (SELECT unnest(['hash', 'vector', 'stream']) AS term)
        SELECT tf.doc_id,
               round(sum(
                   ln(CAST(1.0 AS DOUBLE)
                      + (n_docs - df + CAST(0.5 AS DOUBLE))
                        / (df + CAST(0.5 AS DOUBLE)))
                   * (tf * ({_BM25_K1} + CAST(1.0 AS DOUBLE)))
                     / (tf + {_BM25_K1} * (CAST(1.0 AS DOUBLE) - {_BM25_B}
                        + {_BM25_B} * dl
                          / (CAST(total_tokens AS DOUBLE) / n_docs)))
               ), 6) AS bm25
        FROM tf
        JOIN q USING (term)
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN scalars
        GROUP BY tf.doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    section="F6,F9,C11,C22",
    description="BM25 top-20 documents for a 3-term query (k1=1.2, b=0.75, "
    "RSJ idf): tf/df/doclen as combinable integer aggregates, query terms "
    "and corpus scalars broadcast, TakeOrdered top-k -- the lexical "
    "baseline of a hybrid retrieval stack",
)
def f43_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        bm25_scores(docs, list(_QUERY_TERMS))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@graded(
    "f44_inverted_index",
    oracle="""
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        presence AS (SELECT DISTINCT term, doc_id FROM terms),
        postings AS (
            SELECT term,
                   CAST(count(*) AS BIGINT) AS df,
                   array_to_string(
                       list_slice(list(doc_id ORDER BY doc_id), 1, 8), ','
                   ) AS postings_head
            FROM presence GROUP BY term
        ),
        cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM terms GROUP BY 1)
        SELECT term, df, cf, postings_head
        FROM postings JOIN cf USING (term)
    """,
    section="F6,C15,C11",
    description="inverted-index build: per-term document frequency, "
    "collection frequency, and the first 8 sorted postings rendered as a "
    "string -- the batch job that materializes a lexical index; postings "
    "assembled per term with sort_array(collect_list), head-sliced so no "
    "unbounded row forms",
)
def f44_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    presence = terms.distinct()
    postings = presence.groupBy("term").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 8),
                lambda x: x.cast("string"),
            ),
        ).alias("postings_head"),
    )
    cf = terms.groupBy("term").agg(F.count("*").alias("cf"))
    return postings.join(cf, "term").select("term", "df", "cf", "postings_head")


@graded(
    "f45_chi2_token_label",
    oracle="""
        WITH presence AS (
            SELECT DISTINCT doc_id,
                   unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        labeled AS (
            SELECT p.term,
                   CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_en
            FROM presence p JOIN documents d USING (doc_id)
        ),
        cells AS (
            SELECT term,
                   CAST(sum(is_en) AS BIGINT) AS a,
                   CAST(sum(1 - is_en) AS BIGINT) AS b
            FROM labeled GROUP BY 1
        ),
        lab_totals AS (
            SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_en,
                   CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_other
            FROM documents
        ),
        scored AS (
            SELECT term, a, b,
                   n_en - a AS c, n_other - b AS d,
                   CAST((n_en + n_other)
                        * (a * (n_other - b) - b * (n_en - a))
                        * (a * (n_other - b) - b * (n_en - a)) AS DOUBLE)
                   / (CAST((a + b) AS BIGINT)
                      * ((n_en - a) + (n_other - b))
                      * (a + (n_en - a)) * (b + (n_other - b))) AS chi2
            FROM cells CROSS JOIN lab_totals
            WHERE a + b < n_en + n_other
        )
        SELECT term, a, b, c, d, round(chi2, 6) AS chi2
        FROM scored
        ORDER BY chi2 DESC, term LIMIT 20
    """,
    section="F6,C11,F14",
    description="chi-squared token/label association (token presence vs "
    "lang='en'): 2x2 contingency cells as combinable integer aggregates, "
    "label totals broadcast, exact integer cross-product numerator with "
    "one final double division, top-20 by statistic -- supervised feature "
    "selection over the corpus (decimal(38) partials at 100 TB counts)",
)
def f45_chi2_token_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    presence = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    labeled = presence.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("is_en")),
        "doc_id",
    )
    cells = labeled.groupBy("term").agg(
        F.sum("is_en").alias("a"), F.sum(1 - F.col("is_en")).alias("b")
    )
    lab_totals = docs.agg(
        F.sum((F.col("lang") == "en").cast("int")).alias("n_en"),
        F.sum((F.col("lang") != "en").cast("int")).alias("n_other"),
    )
    # terms present in EVERY document have an empty absent-row (c+d = 0):
    # the statistic is undefined (0/0) — drop them before the division
    scored = cells.crossJoin(F.broadcast(lab_totals)).filter(
        F.col("a") + F.col("b") < F.col("n_en") + F.col("n_other")
    ).select(
        "term",
        "a",
        "b",
        (F.col("n_en") - F.col("a")).alias("c"),
        (F.col("n_other") - F.col("b")).alias("d"),
        (
            (
                (F.col("n_en") + F.col("n_other"))
                * (
                    F.col("a") * (F.col("n_other") - F.col("b"))
                    - F.col("b") * (F.col("n_en") - F.col("a"))
                )
                * (
                    F.col("a") * (F.col("n_other") - F.col("b"))
                    - F.col("b") * (F.col("n_en") - F.col("a"))
                )
            ).cast("double")
            / (
                (F.col("a") + F.col("b"))
                * ((F.col("n_en") - F.col("a")) + (F.col("n_other") - F.col("b")))
                * (F.col("a") + (F.col("n_en") - F.col("a")))
                * (F.col("b") + (F.col("n_other") - F.col("b")))
            )
        ).alias("chi2_raw"),
    )
    return (
        scored.select(
            "term", "a", "b", "c", "d", F.round("chi2_raw", 6).alias("chi2")
        )
        .orderBy(F.desc("chi2"), "term")
        .limit(20)
    )


@graded(
    "f46_pmi_token_pairs",
    oracle="""
        WITH presence AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        pair_counts AS (
            SELECT a.term AS u, b.term AS v, CAST(count(*) AS BIGINT) AS n_ab
            FROM presence a JOIN presence b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2 HAVING count(*) >= 50
        ),
        term_counts AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM presence GROUP BY 1
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        SELECT u, v, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
               round(ln((n_ab * n_docs) / (ta.n_t * tb.n_t)), 6) AS pmi
        FROM pair_counts
        JOIN term_counts ta ON ta.term = u
        JOIN term_counts tb ON tb.term = v
        CROSS JOIN n
        ORDER BY pmi DESC, u, v LIMIT 25
    """,
    section="F6,F8,C4,C11",
    description="pointwise mutual information of token pairs co-occurring "
    "in >= 50 documents: doc-keyed presence self-join with min-support "
    "pruning before the count join, broadcast term marginals, ln of an "
    "exact integer cross-ratio -- the word-association statistic feeding "
    "collocation extraction and embedding sanity checks",
)
def f46_pmi_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    presence = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    a, b = presence.alias("a"), presence.alias("b")
    pair_counts = (
        a.join(b, "doc_id")
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(F.col("a.term").alias("u"), F.col("b.term").alias("v"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 50)
    )
    term_counts = presence.groupBy("term").agg(F.count("*").alias("n_t"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        pair_counts.join(
            F.broadcast(
                term_counts.select(F.col("term").alias("u"), F.col("n_t").alias("n_a"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                term_counts.select(F.col("term").alias("v"), F.col("n_t").alias("n_b"))
            ),
            "v",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "u", "v", "n_ab", "n_a", "n_b",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_docs"))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "u", "v")
        .limit(25)
    )


@graded(
    "f47_js_divergence_sources",
    oracle="""
        WITH terms AS (
            SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
        ),
        src_counts AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS n_st
            FROM terms GROUP BY 1, 2
        ),
        corpus_counts AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM terms GROUP BY 1
        ),
        src_totals AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM terms GROUP BY 1
        ),
        corpus_total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM terms),
        spine AS (
            SELECT s.source, c.term, s.n_s, c.n_t
            FROM src_totals s CROSS JOIN corpus_counts c
        ),
        probs AS (
            SELECT sp.source, sp.term,
                   CAST(coalesce(sc.n_st, 0) AS DOUBLE) / sp.n_s AS p,
                   CAST(sp.n_t AS DOUBLE) / n AS q
            FROM spine sp
            LEFT JOIN src_counts sc
              ON sc.source = sp.source AND sc.term = sp.term
            CROSS JOIN corpus_total
        )
        SELECT source,
               round(sum(
                   CASE WHEN p > 0
                        THEN CAST(0.5 AS DOUBLE) * p * ln(p / ((p + q) / 2))
                        ELSE 0 END
                   + CAST(0.5 AS DOUBLE) * q * ln(q / ((p + q) / 2))
               ), 6) AS js_divergence
        FROM probs
        GROUP BY source
        ORDER BY source
    """,
    section="F10,C11,C5,D3",
    description="Jensen-Shannon divergence of each source's unigram "
    "distribution from the corpus distribution: vocabulary spine so "
    "zero-count terms still carry corpus mass, integer counts to the last "
    "double division, per-source KL halves summed over the (bounded) "
    "vocabulary -- the domain-shift score a mixture balancer reads",
)
def f47_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    terms = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    src_counts = terms.groupBy("source", "term").agg(F.count("*").alias("n_st"))
    corpus_counts = terms.groupBy("term").agg(F.count("*").alias("n_t"))
    src_totals = terms.groupBy("source").agg(F.count("*").alias("n_s"))
    corpus_total = terms.agg(F.count("*").alias("n"))
    spine = src_totals.crossJoin(F.broadcast(corpus_counts))
    probs = (
        spine.join(src_counts, ["source", "term"], "left")
        .crossJoin(F.broadcast(corpus_total))
        .select(
            "source",
            (
                F.coalesce("n_st", F.lit(0)).cast("double") / F.col("n_s")
            ).alias("p"),
            (F.col("n_t").cast("double") / F.col("n")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    contrib = (
        F.when(F.col("p") > 0, F.lit(0.5) * F.col("p") * F.log(F.col("p") / m))
        .otherwise(F.lit(0.0))
        + F.lit(0.5) * F.col("q") * F.log(F.col("q") / m)
    )
    return (
        probs.groupBy("source")
        .agg(F.round(F.sum(contrib), 6).alias("js_divergence"))
        .orderBy("source")
    )
