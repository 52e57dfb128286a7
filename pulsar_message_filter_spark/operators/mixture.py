"""Training-mixture builder (SURVEY §2.F extension surface; C26/F11 kin).

A pretraining corpus is rarely consumed at its natural domain/language
proportions: the pipeline owner specifies a *target mixture* (e.g. 50% en,
20% zh, ...) and the builder derives per-stratum sampling rates that hit it
— downsampling abundant strata, keeping scarce binding strata whole — then
selects rows deterministically.

Everything here is exact relational algebra + content-hash selection:

* rates come from per-stratum counts and the target weights (the binding
  stratum — the one with the least headroom — caps the achievable total);
* selection reuses the md5-prefix threshold pattern from
  ``operators/sampling.py``: a doc is kept iff the first 4 hex chars of
  ``md5(doc_id)`` sort below the stratum's rate threshold.  No RNG state,
  so the mixture is reproducible across engines, re-runs, and cluster
  topologies — and therefore oracle-checkable, unlike RNG mixtures.

At 100 TB: the counts pass is one map-side-combinable aggregate; the rates
frame is k rows (broadcast); selection is a scan-side filter.  No shuffle
of the corpus at any point, and the same doc set is selected no matter how
the corpus is partitioned — the property that makes mixtures resumable and
auditable in production.

Reference parity note: the snapshot at /root/reference contains only
README.md:1 (project title); this operator follows the public data-mixture
methodology of LLM-corpus papers (e.g. weighted domain sampling), not
ported code.
"""

from __future__ import annotations

# (round 3) f32_quality_weighted_keep lives at the end of this module:
# measure-then-sample in one plan, thresholds derived from the data.

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

#: The graded query's target mixture over ``documents.lang`` — en-heavy with
#: zh as the binding stratum at sf0.01 (rate 1.0; everything else downsampled).
DEFAULT_TARGETS: dict[str, float] = {
    "en": 0.50,
    "zh": 0.20,
    "es": 0.15,
    "de": 0.10,
    "fr": 0.05,
}


def mixture_rates(
    df: DataFrame, strata_col: str, targets: dict[str, float]
) -> DataFrame:
    """Per-stratum keep rates ``(stratum, n, rate)`` for a target mixture.

    The achievable total is capped by the binding stratum:
    ``n_total = min_s(n_s / t_s)``; then ``rate_s = n_total * t_s / n_s``
    (≤ 1 by construction, = 1 for the binding stratum up to float
    rounding).  Strata not in ``targets`` get rate 0 (excluded).
    """
    spark = df.sparkSession
    t = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{strata_col} string, t double",
    )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n"))
    with_t = counts.join(F.broadcast(t), strata_col)
    # the cap is ONE scalar over a k-row aggregate — collect it and inline
    # as a literal (the same legitimate O(1) driver collect as a centroid
    # matrix).  Leaving it as a crossJoin'd subplan makes every consumer of
    # the rates frame re-run the entire upstream pipeline for the cap
    # branch — for a curated stream that is a full extra corpus pass.
    n_total = with_t.agg(
        F.min(F.col("n") / F.col("t")).alias("n_total")
    ).collect()[0]["n_total"]
    return with_t.select(
        strata_col,
        "n",
        (F.lit(float(n_total)) * F.col("t") / F.col("n")).alias("rate"),
    )


def build_training_mixture(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Select the deterministic row set realizing the target mixture.

    A row survives iff the first 4 hex chars of ``md5(id)`` sort below
    ``floor(rate * 65536)`` rendered as 4-char lowercase hex — the same
    engine-portable threshold trick as :func:`sampling.hash_sample`, at
    1/65536 granularity.  A stratum whose rate reaches 1.0 (the binding
    stratum when the cap divides out exactly) is kept whole — its threshold
    would be the 5-hex-char 65536, which no 4-char prefix comparison can
    express.
    """
    rates = mixture_rates(df, strata_col, targets)
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * 65536).cast("bigint"))), 4, "0"
    )
    key_col = F.col(id_col) if isinstance(id_col, str) else id_col
    keep = (F.col("rate") >= 1.0) | (
        F.substring(F.md5(key_col.cast("string")), 1, 4) < thr
    )
    return df.join(F.broadcast(rates), strata_col).filter(keep).drop("n", "rate")


@graded(
    "f16_training_mixture",
    oracle="""
        WITH targets(lang, t) AS (
            -- CAST: bare 0.10 is DECIMAL in DuckDB; rate math must be the
            -- same IEEE double ops as the Spark side or thresholds drift
            VALUES ('de', CAST(0.10 AS DOUBLE)), ('en', CAST(0.50 AS DOUBLE)),
                   ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.05 AS DOUBLE)),
                   ('zh', CAST(0.20 AS DOUBLE))
        ),
        counts AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY 1
        ),
        cap AS (
            SELECT min(c.n / tg.t) AS n_total
            FROM counts c JOIN targets tg USING (lang)
        ),
        rates AS (
            SELECT c.lang, (cap.n_total * tg.t / c.n) AS rate
            FROM counts c JOIN targets tg USING (lang) CROSS JOIN cap
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r USING (lang)
        WHERE r.rate >= 1.0   -- binding stratum kept whole
           OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
              -- lower(): DuckDB to_hex is uppercase, md5 output is lowercase
              lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS BIGINT))), 4, '0')
    """,
    section="C26,F11,F14",
    description="training-mixture builder: target lang proportions -> "
    "per-stratum keep rates (binding stratum whole) -> md5-prefix "
    "deterministic selection; oracle-checked exactly — the reproducible "
    "corpus-mixing primitive",
)
def f16_training_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return build_training_mixture(docs, "lang", DEFAULT_TARGETS).select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# Sequence packing — token-budget binning for training batches
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col=None,
    budget: int = 1024,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (training sequences).

    The packing rule is *contiguous fill in id order within a hash bucket*:
    docs land in ``n_buckets`` deterministic buckets (``id % n_buckets``),
    and within a bucket the running token total assigns pack boundaries —
    ``pack_id = floor(exclusive_cumsum / budget)``.  A doc whose tokens
    straddle a boundary starts in its computed pack (packs can overflow by
    at most one doc — the standard greedy-fill approximation; truncation/
    splitting is the tokenizer's concern downstream).

    Why this shape at 100 TB: optimal bin packing is inherently sequential,
    but bucketed greedy fill is *embarrassingly parallel* — each bucket's
    cumsum is an independent window over its own partition (one shuffle by
    bucket, no global ordering), and determinism (id order + hash buckets)
    makes packs reproducible across runs and engines, so the packing is
    oracle-checkable and resumable like every other selection step here.
    """
    toks = tokens_col if tokens_col is not None else F.size(F.split(F.col("text"), " "))
    from pyspark.sql import Window

    bucket = (F.col(id_col) % n_buckets).alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(F.col(id_col), bucket, toks.cast("bigint").alias("n_tokens"))
        .withColumn(
            "pack_id",
            F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget),
        )
    )


@graded(
    "f17_sequence_packing",
    oracle="""
        SELECT doc_id,
               doc_id % 32 AS bucket,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(floor(
                   COALESCE(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
                       PARTITION BY doc_id % 32 ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 1024.0
               ) AS BIGINT) AS pack_id
        FROM documents
    """,
    section="F6,F14,C20",
    description="sequence packing: deterministic token-budget bins via "
    "per-hash-bucket exclusive running sum (1024-token packs) — the "
    "parallel greedy-fill batch builder; oracle-checked exactly",
)
def f17_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return pack_sequences(docs, budget=1024, n_buckets=32)


@graded(
    "f19_curation_to_packing",
    oracle="""
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
                GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        ),
        targets(lang, t) AS (
            VALUES ('de', CAST(0.10 AS DOUBLE)), ('en', CAST(0.50 AS DOUBLE)),
                   ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.05 AS DOUBLE)),
                   ('zh', CAST(0.20 AS DOUBLE))
        ),
        counts AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
        cap AS (SELECT min(c.n / tg.t) AS n_total
                FROM counts c JOIN targets tg USING (lang)),
        rates AS (SELECT c.lang, (cap.n_total * tg.t / c.n) AS rate
                  FROM counts c JOIN targets tg USING (lang) CROSS JOIN cap),
        m AS (
            SELECT d.* FROM d JOIN rates r USING (lang)
            WHERE r.rate >= 1.0
               OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
                  lpad(lower(to_hex(CAST(floor(r.rate * 65536) AS BIGINT))), 4, '0')
        ),
        p AS (
            SELECT doc_id,
                   doc_id % 32 AS bucket,
                   CAST(n_tok AS BIGINT) AS n_tokens,
                   CAST(floor(
                       COALESCE(sum(CAST(n_tok AS BIGINT)) OVER (
                           PARTITION BY doc_id % 32 ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) / 1024.0
                   ) AS BIGINT) AS pack_id
            FROM m
        )
        SELECT bucket, pack_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        FROM p GROUP BY 1, 2
    """,
    section="F11,F1,C26,F6,F14,C20",
    description="curation-to-batches chain: quality filter -> exact dedup "
    "keep-first -> target-lang mixture -> 1024-token sequence packing -> "
    "per-pack stats; every stage deterministic and the whole chain "
    "oracle-checked — the full training-data preparation shape",
)
def f19_curation_to_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production pipeline in one plan: each stage is a pure
    DataFrame→DataFrame transform, so Catalyst fuses the filters/projections
    and the only shuffles are the dedup window (content-hash keyed), the
    mixture's k-row counts aggregate, and the pack window (bucket keyed)."""
    from pyspark.sql import Window

    from pulsar_message_filter_spark.operators.dedup import canonical_text
    from pulsar_message_filter_spark.operators.text import quality_flags

    # (measured this round: widening the narrow doc scan here was SLOWER —
    # see f15_curation_pipeline; the checkpoint below is the win)
    docs = load(spark, "documents", sf_dir)
    flags = quality_flags(F.col("text"))
    q = docs.filter(flags["len_ok"] & flags["word_len_ok"] & flags["diversity_ok"])
    w = Window.partitionBy(canonical_text(F.col("text"))).orderBy("doc_id")
    # checkpoint the curated+deduped frame: the mixture stage reads it
    # three times (counts collect, rates frame, selection join) — without
    # the barrier each read re-runs the quality filter and dedup window
    # (guide §2.4: duplicated subtrees; measured 2x ~470 ms per run here)
    d = (
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    m = build_training_mixture(d, "lang", DEFAULT_TARGETS)
    p = pack_sequences(m, budget=1024, n_buckets=32)
    return p.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality-weighted adaptive keep — measure-then-sample in one plan
# ---------------------------------------------------------------------------


def md5_byte(key) -> "F.Column":
    """First md5 byte of ``key`` as an integer 0–255, via hex-alphabet
    position lookup — pure string ops, identical on Spark and DuckDB
    (no engine-specific hex→int cast dialects)."""
    hexs = "0123456789abcdef"
    h = F.md5((F.col(key) if isinstance(key, str) else key).cast("string"))
    hi = F.instr(F.lit(hexs), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(hexs), F.substring(h, 2, 1)) - 1
    return hi * 16 + lo


@graded(
    "f32_quality_weighted_keep",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 500
                         AND len(list_distinct(string_split(text, ' '))) * 10
                             > len(string_split(text, ' ')) * 3
                        THEN 1 ELSE 0 END AS q
            FROM documents
        ),
        rates AS (
            SELECT source,
                   (sum(q) * 256) // count(*) AS thr
            FROM scored GROUP BY 1
        ),
        kept AS (
            SELECT s.doc_id, s.source
            FROM scored s JOIN rates r USING (source)
            WHERE (strpos('0123456789abcdef', substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(s.doc_id AS VARCHAR)), 2, 1)) - 1)
                  < r.thr
        )
        SELECT source, count(*) AS n_kept FROM kept GROUP BY 1
    """,
    section="F14,C26,F11",
    description="closed-loop adaptive sampling: per-source keep rate DERIVED "
    "from that source's measured quality-pass rate (integer threshold = "
    "pass*256//total), selection by md5-byte compare -- measure-then-"
    "sample in one plan, fully deterministic, oracle-exact",
)
def f32_quality_weighted_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources with higher quality keep more of their documents.

    The per-source threshold is derived *from the data itself* (integer
    arithmetic over exact counts, no float rates), broadcast back onto
    the corpus, and applied as a content-addressed hash-byte filter —
    the adaptive version of `build_training_mixture`'s fixed targets.
    Two passes over the corpus (score+count, then filter), both
    scan-shaped; the rates frame is one row per source."""
    docs = load(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    q = (
        ((F.size(toks) >= 5) & (F.size(toks) <= 500))
        & (F.size(F.array_distinct(toks)) * 10 > F.size(toks) * 3)
    ).cast("int")
    scored = docs.select("doc_id", "source", q.alias("q"))
    rates = scored.groupBy("source").agg(
        F.expr("(sum(q) * 256) div count(*)").alias("thr")
    )
    kept = (
        scored.join(F.broadcast(rates), "source")
        .filter(md5_byte("doc_id") < F.col("thr"))
    )
    return kept.groupBy("source").agg(F.count("*").alias("n_kept"))


# ---------------------------------------------------------------------------
# F16/F14 — temperature-scaled mixture allocation (multilingual sampling)
# ---------------------------------------------------------------------------


@graded(
    "mixture_temperature_weights",
    oracle="""
        WITH src AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
        ),
        wtd AS (
            SELECT source, n_docs,
                   CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000)
                        AS BIGINT) AS w
            FROM src
        ),
        staged AS (
            SELECT source, n_docs, w,
                   (10000 * w) // sum(w) OVER () AS base,
                   (10000 * w) % sum(w) OVER () AS rem
            FROM wtd
        ),
        ranked AS (
            SELECT *,
                   sum(base) OVER () AS base_sum,
                   row_number() OVER (ORDER BY rem DESC, source) AS r
            FROM staged
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(base + CASE WHEN r <= 10000 - base_sum THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_docs,
               round(CAST(base + CASE WHEN r <= 10000 - base_sum
                                      THEN 1 ELSE 0 END AS DOUBLE)
                     / n_docs, 6) AS epochs_per_doc
        FROM ranked
    """,
    section="F14,C11,C18",
    description="temperature-scaled sampling allocation (alpha=0.5, the "
    "XLM-R-style exponent smoothing, public): per-source budget share "
    "proportional to n^alpha, integerized (sqrt scaled 1e6) and settled "
    "by largest-remainder rounding so allocations sum EXACTLY to the "
    "10000-doc budget — up-weights tail sources against head domination; "
    "epochs_per_doc > 1 flags sources the schedule would repeat",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The allocation math runs on the per-source aggregate (source
    cardinality rows — tiny at any corpus scale) through the shared
    largest-remainder machinery: broadcast totals + distributed rank, no
    global window at all.  IEEE sqrt is identical across
    engines, and everything after the 1e6 integerization is exact integer
    arithmetic, so the oracle is exact rather than tolerance-classed."""
    budget = 10_000
    scale = 1_000_000
    src = (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "w",
            F.round(F.sqrt(F.col("n_docs").cast("double")) * scale).cast("long"),
        )
    )
    from pulsar_message_filter_spark.functions.prefix import (
        largest_remainder_allocate,
    )

    staged = largest_remainder_allocate(src, "w", budget, "source")
    alloc = F.col("base") + F.when(
        F.col("r") <= F.lit(budget) - F.col("base_sum"), 1
    ).otherwise(0)
    return staged.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        alloc.cast("long").alias("alloc_docs"),
        F.round(alloc.cast("double") / F.col("n_docs"), 6).alias("epochs_per_doc"),
    )


# ---------------------------------------------------------------------------
# F16/F11 — nucleus (top-p) selection per source on the quality mass
# ---------------------------------------------------------------------------


@graded(
    "mixture_nucleus_topp",
    oracle="""
        WITH scored AS (
            SELECT source, doc_id, CAST(n_chars AS BIGINT) AS score
            FROM documents
        ),
        scanned AS (
            SELECT source, doc_id, score,
                   sum(score) OVER (PARTITION BY source
                                    ORDER BY score DESC, doc_id) AS cum,
                   sum(score) OVER (PARTITION BY source) AS total
            FROM scored
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN (cum - score) * 100 < 80 * total
                        THEN 1 ELSE 0 END AS kept
            FROM scanned
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(sum(kept * score) AS BIGINT) AS kept_chars,
               CAST(sum(score) AS BIGINT) AS total_chars
        FROM flagged
        GROUP BY 1
    """,
    section="F11,C20,F14",
    description="nucleus (top-p) selection per source: take documents in "
    "score order (n_chars desc, doc_id tiebreak) until 80% of the "
    "source's score mass is covered — the smallest prefix crossing the "
    "mass threshold, decided by the EXCLUSIVE prefix sum (cum - score) so "
    "the crossing document is kept; integer cross-multiplied threshold, "
    "source-partitioned windows",
)
def mixture_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p on the quality mass keeps whole high-value documents rather
    than a fixed count or fixed fraction — budget follows where the score
    concentrates.  Source-partitioned windows parallelize per source;
    for low-cardinality-source corpora at extreme scale, swap the window
    pair for the two-phase distributed prefix scan (same contract as
    f55)."""
    from pyspark.sql import Window

    w_scan = Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    w_all = Window.partitionBy("source")
    scanned = (
        load(spark, "documents", sf_dir)
        .select("source", "doc_id", F.col("n_chars").cast("long").alias("score"))
        .withColumn("cum", F.sum("score").over(w_scan))
        .withColumn("total", F.sum("score").over(w_all))
        .withColumn(
            "kept",
            ((F.col("cum") - F.col("score")) * 100 < 80 * F.col("total")).cast(
                "int"
            ),
        )
    )
    return scanned.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum(F.col("kept") * F.col("score")).cast("long").alias("kept_chars"),
        F.sum("score").cast("long").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# F-series — preference-pair construction (DPO/RLHF prep, round 10)
# ---------------------------------------------------------------------------

_PREF_MAX_PAIRS = 3


def preference_pairs(
    docs: DataFrame, group_cols: list, score, max_pairs: int = _PREF_MAX_PAIRS
) -> DataFrame:
    """(chosen, rejected) training pairs per group: the i-th best document
    paired with the i-th worst, i = 1..min(max_pairs, n//2).

    The quantile-extremes pairing is the standard preference-data recipe
    when only a scalar score exists (no human ranking): maximal margin
    pairs first, and pairing i-th best with i-th worst guarantees the two
    sides never overlap (i <= n//2).  One shuffle on the group key; both
    rank directions come from the SAME sorted run (Spark computes the
    descending rank and derives the ascending one from the group size, so
    no second sort).  Ties break on doc_id so replays are deterministic.
    """
    from pyspark.sql import Window

    w_desc = Window.partitionBy(*group_cols).orderBy(
        F.desc("__score"), F.asc("doc_id")
    )
    w_grp = Window.partitionBy(*group_cols)
    ranked = docs.select(
        *group_cols, "doc_id", score.alias("__score")
    ).select(
        *group_cols,
        "doc_id",
        "__score",
        F.row_number().over(w_desc).alias("rk_best"),
        F.count("*").over(w_grp).alias("n"),
    )
    # i-th worst = rank (n - i + 1) in the SAME descending order (the
    # ascending rank is derived, not re-sorted), and a row is never both
    # best- and worst-eligible (rk <= n/2 and n-rk+1 <= n/2 cannot both
    # hold), so chosen and rejected collapse into one row per (group,
    # pair_idx) via conditional aggregation — ONE scan, no self-join
    rk_worst = F.col("n") - F.col("rk_best") + 1
    half = F.col("n") / 2
    pair_idx = F.when(
        (F.col("rk_best") <= max_pairs) & (F.col("rk_best") <= half),
        F.col("rk_best"),
    ).when((rk_worst <= max_pairs) & (rk_worst <= half), rk_worst)
    is_best = F.col("rk_best") * 2 <= F.col("n")
    paired = ranked.withColumn("pair_idx", pair_idx).filter(
        F.col("pair_idx").isNotNull()
    )
    return (
        paired.groupBy(*group_cols, "pair_idx")
        .agg(
            F.max(F.when(is_best, F.col("doc_id"))).alias("chosen_doc"),
            F.max(F.when(is_best, F.col("__score"))).alias("chosen_score"),
            F.max(F.when(~is_best, F.col("doc_id"))).alias("rejected_doc"),
            F.max(F.when(~is_best, F.col("__score"))).alias("rejected_score"),
        )
        .select(
            *group_cols,
            F.col("pair_idx").cast("long").alias("pair_idx"),
            F.col("chosen_doc").cast("long").alias("chosen_doc"),
            F.col("rejected_doc").cast("long").alias("rejected_doc"),
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("long")
            .alias("margin"),
        )
    )


@graded(
    "f71_preference_pairs",
    oracle=f"""
        WITH scored AS (
            SELECT lang, source, doc_id,
                   len(string_split(text, ' ')) AS s
            FROM documents
        ),
        ranked AS (
            SELECT lang, source, doc_id, s,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY s DESC, doc_id) AS rk_best,
                   count(*) OVER (PARTITION BY lang, source) AS n
            FROM scored
        ),
        best AS (
            SELECT lang, source, rk_best AS pair_idx, doc_id AS chosen_doc,
                   s AS cs
            FROM ranked
            WHERE rk_best <= {_PREF_MAX_PAIRS} AND rk_best <= n / 2.0
        ),
        worst AS (
            SELECT lang, source, n - rk_best + 1 AS pair_idx,
                   doc_id AS rejected_doc, s AS rs
            FROM ranked
            WHERE n - rk_best + 1 <= {_PREF_MAX_PAIRS}
              AND n - rk_best + 1 <= n / 2.0
        )
        SELECT b.lang AS lang, b.source AS source,
               CAST(b.pair_idx AS BIGINT) AS pair_idx,
               CAST(chosen_doc AS BIGINT) AS chosen_doc,
               CAST(rejected_doc AS BIGINT) AS rejected_doc,
               CAST(cs - rs AS BIGINT) AS margin
        FROM best b JOIN worst w
          ON b.lang = w.lang AND b.source = w.source
         AND b.pair_idx = w.pair_idx
        ORDER BY b.lang, b.source, pair_idx
    """,
    section="F14,C18",
    description="DPO/RLHF preference pairs: i-th best vs i-th worst per "
    "(lang, source) by token-count score, margins emitted, ascending rank "
    "DERIVED from the descending one (one sort per group, no second "
    "window) — hash-graded",
)
def f71_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.operators.text import tokens

    docs = load(spark, "documents", sf_dir)
    return preference_pairs(
        docs, ["lang", "source"], F.size(tokens(F.col("text")))
    ).orderBy("lang", "source", "pair_idx")


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle — reproducible training order without a
# global sort
# ---------------------------------------------------------------------------

_SHUFFLE_SHARDS = 8


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, n_shards: int = _SHUFFLE_SHARDS
) -> DataFrame:
    """Reproducible pseudo-random training order for one epoch:
    ``(id, shard, pos)`` where the permutation is a pure function of
    ``(id, epoch)`` — re-running the epoch (or recovering a failed job)
    regenerates the identical order, and changing the epoch reshuffles.

    Order key is the first 32 bits of ``md5(epoch:id)`` (cross-engine
    exact, no engine RNG); shard = key mod ``n_shards``.  Scale shape
    (100 TB): there is NO global sort — the writer path is
    ``repartition(shard)`` + ``sortWithinPartitions(key)`` (each shard
    sorts independently; readers consume shards in any order, which is
    exactly how sharded training data is packed).  The graded form uses
    the equivalent per-shard rank window so position is a checkable
    column; id is the tiebreak for 32-bit hash collisions.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"e{epoch}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(id_col, h.alias("h"))
        .withColumn("shard", F.col("h") % n_shards)
        .select(
            id_col,
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


_EPOCH_HEX32 = """CAST(list_sum(list_transform(generate_series(1, 8), i ->
    (strpos('0123456789abcdef', substr(md5({key}), i, 1)) - 1)
    * (16 ** (8 - i)))) AS BIGINT)"""


@graded(
    "epoch_shuffle_order",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   {_EPOCH_HEX32.format(key="'e7:' || CAST(doc_id AS VARCHAR)")} AS h
            FROM documents
        )
        SELECT doc_id,
               h % {_SHUFFLE_SHARDS} AS shard,
               CAST(row_number() OVER (PARTITION BY h % {_SHUFFLE_SHARDS}
                                       ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM h
    """,
    section="C18,D8,F14",
    description="deterministic epoch shuffle: md5(epoch:id)-keyed shard + "
    "in-shard rank gives a reproducible training permutation with no "
    "global sort (writer path: repartition(shard) + sortWithinPartitions)",
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return epoch_shuffle(docs, "doc_id", epoch=7)
