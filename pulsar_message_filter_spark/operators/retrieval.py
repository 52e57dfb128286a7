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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.similarity import _cosine_sql
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


# ---------------------------------------------------------------------------
# Retrieval evaluation: MRR / recall@k / nDCG@k against label relevance
# ---------------------------------------------------------------------------


@graded(
    "f59_retrieval_metrics",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, label AS qlabel, embedding AS qe
            FROM embeddings WHERE vec_id < 20
        ),
        ranked AS (
            SELECT q.query_id, q.qlabel, c.label AS clabel,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_cosine_sql('q.qe', 'c.embedding')}, 6) DESC, c.vec_id
                   ) AS rank
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ),
        top AS (SELECT * FROM ranked WHERE rank <= 10),
        rel_total AS (
            SELECT q.query_id, count(*) AS n_rel
            FROM q JOIN embeddings c
              ON c.vec_id <> q.query_id AND c.label = q.qlabel
            GROUP BY 1
        ),
        per_q AS (
            SELECT query_id,
                   min(CASE WHEN clabel = qlabel THEN rank END) AS first_rel,
                   sum(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS n_rel_top,
                   sum(CASE WHEN clabel = qlabel
                            THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg
            FROM top GROUP BY 1
        ),
        ideal AS (
            SELECT r.query_id,
                   sum(1.0 / log2(i + 1)) AS idcg
            FROM rel_total r,
                 unnest(generate_series(1, least(r.n_rel, 10))) AS u(i)
            GROUP BY 1
        )
        SELECT p.query_id,
               round(COALESCE(1.0 / p.first_rel, 0.0), 6) AS mrr,
               round(CAST(p.n_rel_top AS DOUBLE)
                     / least(r.n_rel, 10), 6) AS recall_at_10,
               round(p.dcg / i.idcg, 6) AS ndcg_at_10
        FROM per_q p
        JOIN rel_total r ON r.query_id = p.query_id
        JOIN ideal i ON i.query_id = p.query_id
    """,
    section="F4,F14,C11,C18",
    description="retrieval evaluation per query (20 queries, top-10 brute "
    "cosine run, relevance = same label): reciprocal rank of the first "
    "relevant hit, recall@10 against the capped relevant-set size, and "
    "binary nDCG@10 with exact log2 discounts — the measurement layer "
    "that turns the f4/f43 retrieval family into tunable systems",
)
def f59_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation reuses the production ranking path (same rounded-cosine
    + id tiebreak as brute_topk, so metrics grade EXACTLY what the
    retrieval op serves), then three query-keyed aggregations.  Scale:
    metrics cost is the retrieval run itself; the per-query aggs are
    20-group combinable sums, and the ideal-DCG spine is a sequence
    explode over min(n_rel, 10) — bounded."""
    from pulsar_message_filter_spark.operators.similarity import brute_topk

    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    qlabels = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    clabels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clabel")
    )
    top = (
        brute_topk(queries, emb, k=10)
        .join(F.broadcast(qlabels), "query_id")
        .join(clabels, "neighbor_id")
        .withColumn("rel", (F.col("clabel") == F.col("qlabel")).cast("int"))
    )
    rel_total = (
        F.broadcast(qlabels)
        .join(
            clabels,
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("clabel") == F.col("qlabel")),
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_rel"))
    )
    per_q = top.groupBy("query_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum("rel").alias("n_rel_top"),
        F.sum(
            F.when(
                F.col("rel") == 1, F.lit(1.0) / F.log2(F.col("rank") + 1)
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    ideal = rel_total.select(
        "query_id",
        "n_rel",
        F.aggregate(
            F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(10))),
            F.lit(0.0),
            lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
        ).alias("idcg"),
    )
    return (
        per_q.join(ideal, "query_id")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.col("n_rel_top").cast("double") / F.least(F.col("n_rel"), F.lit(10)),
                6,
            ).alias("recall_at_10"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# Classifier evaluation: per-label precision / recall / F1 for the KNN vote
# ---------------------------------------------------------------------------


@graded(
    "f60_knn_eval",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, label AS true_label, embedding AS qe
            FROM embeddings WHERE vec_id < 50
        ),
        ranked AS (
            SELECT q.query_id, q.true_label, c.label AS clabel,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_cosine_sql('q.qe', 'c.embedding')}, 6) DESC, c.vec_id
                   ) AS rank
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ),
        votes AS (
            SELECT query_id, true_label, clabel, count(*) AS n_votes
            FROM ranked WHERE rank <= 5
            GROUP BY 1, 2, 3
        ),
        pred AS (
            SELECT query_id, true_label, clabel AS pred_label
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY n_votes DESC, clabel
                ) AS rv
                FROM votes
            ) WHERE rv = 1
        ),
        labels AS (
            SELECT true_label AS label FROM pred
            UNION SELECT pred_label FROM pred
        ),
        m AS (
            SELECT l.label,
                   sum(CASE WHEN p.pred_label = l.label
                            AND p.true_label = l.label THEN 1 ELSE 0 END) AS tp,
                   sum(CASE WHEN p.pred_label = l.label
                            AND p.true_label <> l.label THEN 1 ELSE 0 END) AS fp,
                   sum(CASE WHEN p.pred_label <> l.label
                            AND p.true_label = l.label THEN 1 ELSE 0 END) AS fn
            FROM labels l CROSS JOIN pred p
            GROUP BY 1
        )
        SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               round(CASE WHEN tp + fp = 0 THEN 0.0
                          ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
               round(CASE WHEN tp + fn = 0 THEN 0.0
                          ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
               round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                          ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END, 6)
                   AS f1
        FROM m
    """,
    section="F5,F14,C11",
    description="per-label precision/recall/F1 of the 5-NN cosine vote "
    "over 50 held-out queries (same deterministic ranking as f5): the "
    "confusion-count aggregation every labeler/classifier pipeline needs "
    "before its output is trusted as training signal — tp/fp/fn from one "
    "broadcast label-spine pass, F1 from integer counts",
)
def f60_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: predictions reuse the f5 vote path (brute top-5, count
    votes, deterministic tiebreak); metrics are one small cross join of
    the prediction table against the distinct label spine (labels ×
    queries — both bounded; at corpus scale the spine is still just the
    label set) aggregated to confusion counts."""
    from pulsar_message_filter_spark.operators.similarity import brute_topk

    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 50)
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    clabels = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clabel")
    )
    votes = (
        brute_topk(queries, emb, k=5)
        .join(clabels, "neighbor_id")
        .groupBy("query_id", "clabel")
        .agg(F.count("*").alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), "clabel")
    pred = (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select("query_id", F.col("clabel").alias("pred_label"))
        .join(F.broadcast(truth), "query_id")
    )
    labels = (
        pred.select(F.col("true_label").alias("label"))
        .union(pred.select(F.col("pred_label").alias("label")))
        .distinct()
    )
    m = (
        F.broadcast(labels)
        .crossJoin(pred)
        .groupBy("label")
        .agg(
            F.sum(
                (
                    (F.col("pred_label") == F.col("label"))
                    & (F.col("true_label") == F.col("label"))
                ).cast("long")
            ).alias("tp"),
            F.sum(
                (
                    (F.col("pred_label") == F.col("label"))
                    & (F.col("true_label") != F.col("label"))
                ).cast("long")
            ).alias("fp"),
            F.sum(
                (
                    (F.col("pred_label") != F.col("label"))
                    & (F.col("true_label") == F.col("label"))
                ).cast("long")
            ).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(tp + fp == 0, 0.0).otherwise(tp.cast("double") / (tp + fp)), 6
        ).alias("precision"),
        F.round(
            F.when(tp + fn == 0, 0.0).otherwise(tp.cast("double") / (tp + fn)), 6
        ).alias("recall"),
        F.round(
            F.when(2 * tp + fp + fn == 0, 0.0).otherwise(
                (2 * tp).cast("double") / (2 * tp + fp + fn)
            ),
            6,
        ).alias("f1"),
    )
