"""F-series: corpus scrubbing — PII detection/redaction and domain profiling.

Two training-data-curation operators every large-scale pipeline runs before
pretraining (reference scope: the engine's document-processing surface,
SURVEY.md §2.F6/F11 family):

* **f25 PII scrub** — detect and redact email / phone-shaped spans,
  emitting both the redacted text and exact per-document match counts
  (the audit trail a compliance pass needs).
* **f26 domain profile** — extract URL hostnames and aggregate corpus
  mass per domain (the standard "which sources dominate my crawl"
  curation report, and the input to per-domain quality weighting).

The fixture corpus is synthetic word-salad with no organic PII/URLs, so
each graded query first *injects* pattern-bearing spans derived
deterministically from fixture columns (doc_id/source/lang) with plain
string concatenation — identical SQL on both engines — then runs the real
extraction/redaction machinery on the result.  The operators themselves
(:func:`pii_scrub`, :func:`domain_profile`) are generic: hand them any
DataFrame with a text column.

Regex portability (Spark = Java regex, DuckDB = RE2): patterns here stick
to the common subset — character classes, bounded quantifiers, one capture
group; no lookaround, no backreferences.  DuckDB's ``regexp_replace``
needs the ``'g'`` flag to match Spark's replace-all default — the oracle
SQL carries it.

Scale notes (100 TB):

* Both operators are pure per-row column expressions inside whole-stage
  codegen — they ride the parquet scan, shuffle nothing (f25) or shuffle
  only (domain, partial-count) pairs after map-side combine (f26).
* Redaction rewrites the text column in place; at scale this runs as a
  read→scrub→write pass whose output is re-partitioned by the downstream
  key (see ``mixture.py``), never collected.
* Regex matching is the hot loop: anchored literal prefixes (``https://``,
  ``555-``) let the engine's regex engine bail fast on non-matching rows;
  fully unanchored catastrophic patterns (nested ``.*``) are the known
  anti-pattern and appear nowhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

#: Conservative Java∩RE2 patterns (no lookaround, no backreferences).
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
PHONE_RE = r"555-[0-9][0-9][0-9][0-9]"
URL_HOST_RE = r"https://([a-z0-9.-]+)/"


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact every ``patterns`` match in ``text_col`` and append exact
    per-row match counts.

    ``patterns`` maps a label (e.g. ``"EMAIL"``) to a regex; each match is
    replaced by ``[LABEL]`` and counted into ``n_<label.lower()>``.
    Counting uses ``regexp_extract_all`` + ``size`` (portable; Spark's
    ``regexp_count`` has no DuckDB twin with identical NULL semantics).
    Pure column algebra — no UDF, no shuffle.
    """
    pats = patterns if patterns is not None else {"EMAIL": EMAIL_RE, "PHONE": PHONE_RE}
    out = df
    redacted: Column = F.col(text_col)
    for label, pat in pats.items():
        out = out.withColumn(
            f"n_{label.lower()}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
        redacted = F.regexp_replace(redacted, pat, f"[{label}]")
    return out.withColumn(text_col, redacted)


def domain_profile(
    df: DataFrame, text_col: str = "text", host_re: str = URL_HOST_RE
) -> DataFrame:
    """Per-domain corpus mass: explode every URL hostname in ``text_col``
    and aggregate document and occurrence counts per domain.

    One generator (no shuffle) + one uniform-key aggregation with map-side
    combine — the 100 TB shape for a crawl-composition report."""
    hosts = df.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(host_re), 1)).alias(
            "domain"
        ),
    )
    return hosts.groupBy("domain").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_urls"),
    )


# ---------------------------------------------------------------------------
# Deterministic PII/URL injection (fixture corpus carries no organic spans)
# ---------------------------------------------------------------------------


def _inject_pii(docs: DataFrame) -> DataFrame:
    """Append email/phone spans to a deterministic subset of documents.

    doc_id % 3 != 0 gains an email built from (doc_id, source); doc_id % 5
    != 0 gains a phone with a zero-padded doc_id-derived extension.  Plain
    concat/CASE — byte-identical on Spark and DuckDB — so roughly a third
    of rows exercise the no-email negative path and a fifth the no-phone
    path."""
    email = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com"),
    )
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 != 0, email).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 != 0, phone).otherwise(F.lit("")),
        ).alias("text"),
    )


_INJECT_PII_SQL = """
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 3 != 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                        || source || '.example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 5 != 0
                   THEN ' call 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS text
    FROM documents
"""


@graded(
    "f25_pii_scrub",
    oracle=f"""
        WITH aug AS ({_INJECT_PII_SQL})
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phone,
               regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                              '{PHONE_RE}', '[PHONE]', 'g') AS text
        FROM aug
    """,
    section="F6,F11,B8",
    description="PII scrub: redact email/phone spans and emit exact "
    "per-document match counts (deterministically injected spans; pure "
    "codegen column algebra, no shuffle)",
)
def f25_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _inject_pii(load(spark, "documents", sf_dir))
    return pii_scrub(aug, "text").select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        "text",
    )


@graded(
    "f26_domain_profile",
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' see https://www.' || source || '.example-' || lang
                        || '.com/p/' || CAST(doc_id AS VARCHAR)
                        || CASE WHEN doc_id % 4 = 0
                                THEN ' and https://mirror.' || source || '.example.org/x'
                                ELSE '' END AS text
            FROM documents
        ),
        hosts AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, 'https://([a-z0-9.-]+)/', 1)) AS domain
            FROM aug
        )
        SELECT domain,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_urls
        FROM hosts GROUP BY 1
    """,
    section="F6,F10,B8",
    description="crawl-composition report: URL hostnames extracted per doc, "
    "aggregated to per-domain document/occurrence mass (generator + one "
    "uniform-key agg)",
)
def f26_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://www."),
            F.col("source"),
            F.lit(".example-"),
            F.col("lang"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" and https://mirror."),
                    F.col("source"),
                    F.lit(".example.org/x"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return domain_profile(aug, "text")


# ---------------------------------------------------------------------------
# Privacy audit — k-anonymity / l-diversity over quasi-identifier groups
# ---------------------------------------------------------------------------

_K_ANON = 5  # groups smaller than this are re-identification risks


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = _K_ANON,
) -> DataFrame:
    """Per-quasi-identifier-group privacy audit: group size (k-anonymity)
    and distinct sensitive values (l-diversity).

    A record is k-anonymous iff at least ``k`` records share its full
    quasi-identifier combination; a group is l-diverse iff its sensitive
    attribute takes multiple values (a size-k group with ONE sensitive
    value still leaks it).  Before shipping a corpus with user-derived
    metadata, this is the standard re-identification sweep (Sweeney's
    k-anonymity, public literature).

    Scale (100 TB): ONE hash aggregation keyed on the quasi-identifier
    tuple — map-side combinable for both the count and the distinct
    (partial distinct-sets merge); the k/l verdicts are row-local flags
    on the aggregated (small) group table.  Suppression is then a
    broadcast semi-join of the failing groups back against the corpus.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").alias("group_n"),
            F.count_distinct(F.col(sensitive_col)).alias("l_diversity"),
        )
        .select(
            *quasi_cols,
            "group_n",
            "l_diversity",
            (F.col("group_n") >= k).cast("int").alias("k_anonymous"),
        )
    )


@graded(
    "privacy_k_anonymity",
    oracle=f"""
        SELECT c_nationkey,
               c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               count(*) AS group_n,
               count(DISTINCT c_acctbal) AS l_diversity,
               CASE WHEN count(*) >= {_K_ANON} THEN 1 ELSE 0 END AS k_anonymous
        FROM customer
        GROUP BY 1, 2, 3
    """,
    section="C11,C12,F11",
    description="k-anonymity/l-diversity privacy audit: group sizes and "
    "distinct sensitive values per quasi-identifier combination "
    "(nation, segment, balance bucket) — one map-side-combinable hash agg",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return k_anonymity_audit(
        cust,
        ["c_nationkey", "c_mktsegment", "bal_bucket"],
        "c_acctbal",
        k=_K_ANON,
    )


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = _K_ANON,
    min_l: int = 2,
) -> DataFrame:
    """Generalization step after the audit: drop every record whose
    quasi-identifier group fails k-anonymity OR l-diversity.

    Scale (100 TB): the audit table is tiny (one row per QI combo), so the
    failing groups broadcast and suppression is a broadcast LEFT-ANTI join
    against the corpus — one scan, no corpus-keyed shuffle.
    """
    failing = (
        k_anonymity_audit(df, quasi_cols, sensitive_col, k=k)
        .filter((F.col("group_n") < k) | (F.col("l_diversity") < min_l))
        .select(*quasi_cols)
    )
    return df.join(F.broadcast(failing), quasi_cols, "left_anti")


@graded(
    "privacy_suppression",
    oracle=f"""
        WITH audit AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                   count(*) AS group_n,
                   count(DISTINCT c_acctbal) AS l_diversity
            FROM customer GROUP BY 1, 2, 3
        ),
        kept AS (
            SELECT c.c_mktsegment, c.c_custkey
            FROM (SELECT *, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
                  FROM customer) c
            JOIN audit a
              ON c.c_nationkey = a.c_nationkey
             AND c.c_mktsegment = a.c_mktsegment
             AND c.bal_bucket = a.bal_bucket
            WHERE a.group_n >= {_K_ANON} AND a.l_diversity >= 2
        )
        SELECT c_mktsegment,
               count(*) AS n_kept,
               (SELECT count(*) FROM customer c2
                WHERE c2.c_mktsegment = kept.c_mktsegment) - count(*)
                   AS n_suppressed
        FROM kept GROUP BY c_mktsegment
    """,
    section="C6,C8,F11",
    description="privacy suppression join-back: records in groups failing "
    "k-anonymity or l-diversity are dropped via a broadcast anti-join; "
    "per-segment kept/suppressed census (hash-exact)",
)
def privacy_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).withColumn(
        "bal_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    kept = suppress_small_groups(
        cust, ["c_nationkey", "c_mktsegment", "bal_bucket"], "c_acctbal"
    )
    totals = cust.groupBy("c_mktsegment").agg(F.count("*").alias("n_total"))
    return (
        kept.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_kept"))
        .join(F.broadcast(totals), "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_suppressed"),
        )
    )
