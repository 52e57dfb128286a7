"""Round-9 widening of thin SURVEY §2 rows (VERDICT r08 items #3/#4).

Rows that carried a single graded query each get the variants a real user
of the selector/stream surface would reach for next:

* **E7 stream–stream join** — the reversed time bound (followups AFTER the
  anchor) and the left-outer first-match form with its NULL surface
  preserved, both expressed as the batch form of the watermarked
  range-join (identical condition under ``readStream``).
* **B14 fan-out** — N=5 subscriptions evaluated in ONE scan and unpivoted
  to per-subscription rows, graded against the N-separate-sinks SQL
  (single-pass ≡ N-pass equivalence, the whole point of fan-out).
* **B15 params** — several ``${param}`` placeholders of mixed types bound
  from one subscription-properties dict, including inside BETWEEN and IN.
* **F3 pairwise cosine** — a similarity-graph degree profile (thresholded
  pairs) and the label×label mean-similarity matrix, both pure Column
  algebra (no UDF).
* **F5 KNN vote** — the distance-WEIGHTED vote (sum of similarities per
  label, not ballot counts).
* **B13 RESCHEDULE** — the retry-topic loop graded END-TO-END: rescheduled
  messages are re-enqueued with ``attempt+1`` and a ``not_before``
  visibility timestamp, re-evaluated past it, and either accepted by a
  later attempt, or exhausted to DLQ — per-message delivery counts graded
  against the closed-form oracle.

Late-round widening in the same spirit: a composite selector over the
DOCUMENTS schema (B1/B2/B4/B6 compiler generality), a second grouped-agg
pandas UDAF (G3, exact int64 weighted cents), a broadcast RANGE-dimension
enrichment (E6/C9 value-band theta join), the sliding-window revenue
leader (E2/C21, 4-hop oracle), and TF-IDF document-to-document cosine
(F9/F3, term-keyed sparse dot product).

Scale notes are on each query; nothing here introduces a new shuffle
shape — range joins are user-keyed equi-joins with range residuals,
fan-out is one scan + booleans, the retry loop is ``max_attempts`` (a
small constant) passes over a monotonically shrinking subset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.filtering import RESCHEDULE, fan_out, with_verdict
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.selector import Schema, Selector
from pulsar_message_filter_spark.operators.similarity import _cosine_sql, cosine

# ---------------------------------------------------------------------------
# E7 — stream–stream join variants (batch form of the watermarked range join)
# ---------------------------------------------------------------------------

_FOLLOW_WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes
_OUTER_WINDOW_US = 15 * 60 * 1_000_000  # 15 minutes


@graded(
    "stream_stream_join_followup",
    oracle=f"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'click')
        SELECT p.event_id AS purchase_id,
               count(*) AS n_followup_clicks,
               min(c.ts_us - p.ts_us) AS first_click_delay_us
        FROM p JOIN c
          ON p.user_id = c.user_id
         AND c.ts_us >  p.ts_us
         AND c.ts_us <= p.ts_us + {_FOLLOW_WINDOW_US}
        GROUP BY 1
    """,
    section="E7",
    description="time-bounded stream-stream join, REVERSED bound: clicks "
    "within 10 min AFTER each purchase (inner join — only purchases with "
    "followups).  Under readStream: same equi+range condition, watermark "
    "on both sides, state bounded by the 10-min horizon",
)
def stream_stream_join_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r08-graded ``stream_stream_join`` looks BACKWARD from the
    anchor; real attribution pipelines also need the forward direction
    (conversion → engagement).  Scale shape is identical: the range
    residual rides on the ``user_id`` equi-join, so the shuffle is keyed
    and the per-key state a streaming execution holds is one window's
    worth of clicks."""
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_us").alias("c_ts")
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") > F.col("p_ts"))
            & (F.col("c_ts") <= F.col("p_ts") + _FOLLOW_WINDOW_US),
        )
        .groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_followup_clicks"),
            F.min(F.col("c_ts") - F.col("p_ts")).alias("first_click_delay_us"),
        )
    )


@graded(
    "stream_stream_join_outer_first",
    oracle=f"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id AS purchase_id,
               count(v.ts_us) > 0 AS matched,
               min(v.ts_us) - p.ts_us AS first_view_gap_us
        FROM p LEFT JOIN v
          ON p.user_id = v.user_id
         AND v.ts_us >  p.ts_us
         AND v.ts_us <= p.ts_us + {_OUTER_WINDOW_US}
        GROUP BY p.event_id, p.ts_us
    """,
    section="E7",
    description="left-outer time-bounded stream-stream join: EVERY purchase "
    "row survives, with the gap to its first subsequent view within 15 min "
    "or NULL — the outer-join null surface the inner variants never "
    "exercise.  Under readStream: left-outer stream-stream join, unmatched "
    "lefts emitted when the watermark passes the join horizon",
)
def stream_stream_join_outer_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts_us").alias("v_ts")
    )
    return (
        purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") > F.col("p_ts"))
            & (F.col("v_ts") <= F.col("p_ts") + _OUTER_WINDOW_US),
            "left",
        )
        .groupBy("purchase_id", "p_ts")
        .agg(
            (F.count("v_ts") > 0).alias("matched"),
            (F.min("v_ts") - F.col("p_ts")).alias("first_view_gap_us"),
        )
        .select("purchase_id", "matched", "first_view_gap_us")
    )


# ---------------------------------------------------------------------------
# B14 — N-way fan-out, single pass vs N sinks
# ---------------------------------------------------------------------------

_NWAY_SUBS = {
    "purchases": Selector("event_type = 'purchase'"),
    "big_values": Selector("value > 150"),
    "key_band": Selector("props.k BETWEEN 40 AND 60"),
    "weekend_errs": Selector("event_type = 'error' AND value < 50"),
    "early_signups": Selector("event_type = 'signup' AND user_id < 75"),
}


@graded(
    "selector_fanout_nway",
    # GROUP BY + HAVING so a zero-match subscription emits NO row, matching
    # the Spark side's filter(matched) — an ungrouped aggregate would emit
    # (0, NULL) for an empty branch and break the compare (ADVICE r09).
    oracle="\n        UNION ALL\n".join(
        f"""
        SELECT '{name}' AS subscription,
               count(*) AS n_matched,
               round(sum(value), 2) AS total_value
        FROM events WHERE {sel.duckdb_sql()}
        GROUP BY 1 HAVING count(*) > 0"""
        for name, sel in sorted(_NWAY_SUBS.items())
    ),
    section="B14",
    description="N=5 subscriptions in ONE scan (fan_out booleans + stack "
    "unpivot), graded against the N-separate-sinks SQL (5 independent "
    "filtered aggregates UNION ALL) — single-pass/N-pass equivalence, the "
    "fan-out contract itself",
)
def selector_fanout_nway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB this is the difference between one corpus scan and five:
    ``fan_out`` adds one boolean per subscription in the same whole-stage
    codegen pass, ``stack`` unpivots rows only for matching subscriptions
    (≤5 small rows out per input row), and the aggregate is keyed on the
    5-value subscription name — broadcast-scale."""
    events = load(spark, "events", sf_dir)
    tagged = fan_out(events, _NWAY_SUBS)
    pairs = ", ".join(f"'{n}', sub_{n}" for n in sorted(_NWAY_SUBS))
    stacked = tagged.selectExpr(
        "value", f"stack({len(_NWAY_SUBS)}, {pairs}) AS (subscription, matched)"
    )
    return (
        stacked.filter(F.col("matched"))
        .groupBy("subscription")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# B15 — multi-param subscription properties (mixed types, BETWEEN + IN)
# ---------------------------------------------------------------------------

_PARAMS_SEL = Selector(
    "value BETWEEN ${lo} AND ${hi} AND event_type IN (${kind1}, ${kind2}) "
    "AND user_id % ${mod} = 0",
    params={"lo": 40, "hi": 180, "kind1": "view", "kind2": "error", "mod": 3},
)


@graded(
    "selector_params_multi",
    oracle=f"""
        SELECT event_type, count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events WHERE {_PARAMS_SEL.duckdb_sql()}
        GROUP BY 1
    """,
    section="B15,B12",
    description="five ${param} placeholders of mixed types from ONE "
    "subscription-properties dict, bound inside BETWEEN, IN and modulo "
    "arithmetic at compile time (numeric + string params)",
)
def selector_params_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    return (
        events.filter(_PARAMS_SEL.column())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# F3 — pairwise-cosine widening: threshold graph + label similarity matrix
# ---------------------------------------------------------------------------


@graded(
    "f3_cosine_threshold_graph",
    oracle=f"""
        WITH sims AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 40 AND b.vec_id < 40
        ), edges AS (
            SELECT * FROM sims WHERE cos_sim >= 0.1
        ), ends AS (
            SELECT id_a AS vec_id, cos_sim FROM edges
            UNION ALL
            SELECT id_b AS vec_id, cos_sim FROM edges
        )
        SELECT vec_id, count(*) AS degree,
               round(avg(cos_sim), 6) AS mean_sim
        FROM ends GROUP BY 1
    """,
    section="F3",
    description="similarity-graph degree profile: thresholded pairwise "
    "cosine (>= 0.1) over a 40-vector window, per-node edge degree + mean "
    "similarity — pure Column algebra, no UDF",
)
def f3_cosine_threshold_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F2 near-dup pair graph, embedding-flavored: the degree profile
    is what an embedding-dedup or diversity pass inspects before choosing
    a threshold.  The pair window is the demo bound; the 100 TB form is
    LSH/IVF candidate generation (f4_topk_lsh/ivf) feeding the same
    Column-algebra cosine."""
    emb = load(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 40)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    edges = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.1)
    )
    ends = edges.select(F.col("id_a").alias("vec_id"), "cos_sim").unionByName(
        edges.select(F.col("id_b").alias("vec_id"), "cos_sim")
    )
    return ends.groupBy("vec_id").agg(
        F.count("*").alias("degree"),
        F.round(F.avg("cos_sim"), 6).alias("mean_sim"),
    )


@graded(
    "f3_cosine_label_matrix",
    oracle=f"""
        WITH sims AS (
            SELECT least(a.label, b.label) AS label_lo,
                   greatest(a.label, b.label) AS label_hi,
                   round({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 60 AND b.vec_id < 60
        )
        SELECT label_lo, label_hi, count(*) AS n_pairs,
               round(avg(cos_sim), 6) AS mean_sim,
               round(max(cos_sim), 6) AS max_sim
        FROM sims GROUP BY 1, 2
    """,
    section="F3,C11",
    description="label x label mean-cosine matrix over a 60-vector window: "
    "the intra- vs inter-class similarity profile an embedding-quality "
    "audit starts from (unordered label pairs via least/greatest)",
)
def f3_cosine_label_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 60)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            F.least("la", "lb").cast("long").alias("label_lo"),
            F.greatest("la", "lb").cast("long").alias("label_hi"),
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .groupBy("label_lo", "label_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("cos_sim"), 6).alias("mean_sim"),
            F.round(F.max("cos_sim"), 6).alias("max_sim"),
        )
    )


# ---------------------------------------------------------------------------
# F5 — distance-weighted KNN vote
# ---------------------------------------------------------------------------


@graded(
    "f5_knn_weighted_vote",
    oracle=f"""
        WITH sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
                   round({_cosine_sql('q.embedding', 'c.embedding')}, 6) AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 10
        ), knn AS (
            SELECT query_id, label, cos_sim FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos_sim DESC, neighbor_id) AS rn
                FROM sims
            ) WHERE rn <= 5
        ), votes AS (
            SELECT query_id, label,
                   round(sum(cos_sim), 6) AS weight
            FROM knn GROUP BY 1, 2
        )
        SELECT query_id, label AS predicted_label, weight FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY weight DESC, label) AS rv
            FROM votes
        ) WHERE rv = 1
    """,
    section="F5",
    description="distance-WEIGHTED 5-NN vote: labels score by SUMMED cosine "
    "similarity, not ballot count — near neighbors outvote far ones (rank "
    "on the rounded weight so both engines agree at float midpoints)",
)
def f5_knn_weighted_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.operators.similarity import brute_topk

    emb = load(spark, "embeddings", sf_dir)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    knn = brute_topk(emb.filter(F.col("vec_id") < 10), emb, k=5).join(
        labels, "neighbor_id"
    )
    votes = knn.groupBy("query_id", "label").agg(
        F.round(F.sum("cos_sim"), 6).alias("weight")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("weight"), "label")
    return (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "weight")
    )


# ---------------------------------------------------------------------------
# B13/E10 — the RESCHEDULE retry-topic loop, graded end-to-end
# ---------------------------------------------------------------------------

_MAX_ATTEMPTS = 4
_RETRY_DELAY_MS = 60_000

_RETRY_SCHEMA = Schema(
    columns={
        "event_id": "long",
        "ts": "timestamp",
        "user_id": "long",
        "event_type": "string",
        "value": "double",
        "attempt": "long",
    },
    props_col="props",
)
# ACCEPT: high-value messages immediately; view-events once backoff has
# given downstream capacity time to free up (attempt >= 3).  RESCHEDULE:
# the retriable classes.  Anything else: REJECT on first delivery.
_RETRY_ACCEPT = Selector(
    "value > 120 OR (attempt >= 3 AND event_type = 'view')", schema=_RETRY_SCHEMA
)
_RETRY_RESCHED = Selector(
    "event_type IN ('view', 'click')", schema=_RETRY_SCHEMA
)


def retry_topic_loop(
    df: DataFrame,
    max_attempts: int = _MAX_ATTEMPTS,
    delay_ms: int = _RETRY_DELAY_MS,
) -> DataFrame:
    """B13's third verdict executed end-to-end as a batch twin: the
    retry-topic pattern (SURVEY §7.4.6 / streaming/pipeline.py's
    redelivery counter, extended one hop to the re-enqueue).

    Attempt 1 evaluates every message; RESCHEDULE rows are re-enqueued
    with ``attempt + 1`` and ``visible_ms += delay_ms`` (the ``not_before``
    visibility timestamp a retry topic stamps); each later pass models the
    micro-batch that runs after the visibility horizon and re-evaluates
    ONLY the re-enqueued subset.  A message still RESCHEDULE-classed on
    its ``max_attempts``-th delivery is exhausted to ``DLQ``.

    Returns one row per message: ``(event_id, event_type, final_verdict,
    n_deliveries, final_visible_ms)``.

    Scale shape: ``max_attempts`` is a small constant, each pass is a
    narrow filter+project over a monotonically shrinking subset (no
    shuffle until the caller aggregates), and the union is
    ``max_attempts`` branches of one scan — at 100 TB the retry topic is
    a separate (much smaller) table and each pass is one micro-batch.
    """
    pending = df.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).withColumns(
        {
            "attempt": F.lit(1).cast("long"),
            "visible_ms": F.unix_millis("ts"),
        }
    )
    finished: list[DataFrame] = []
    for attempt in range(1, max_attempts + 1):
        tagged = with_verdict(
            pending, _RETRY_ACCEPT, _RETRY_RESCHED, schema=_RETRY_SCHEMA
        )
        is_last = attempt == max_attempts
        done = tagged.filter(
            F.lit(is_last) | (F.col("verdict") != RESCHEDULE)
        ).select(
            "event_id",
            "event_type",
            F.when(F.col("verdict") == RESCHEDULE, F.lit("DLQ"))
            .otherwise(F.col("verdict"))
            .alias("final_verdict"),
            F.col("attempt").alias("n_deliveries"),
            F.col("visible_ms").alias("final_visible_ms"),
        )
        finished.append(done)
        if not is_last:
            pending = (
                tagged.filter(F.col("verdict") == RESCHEDULE)
                .drop("verdict")
                .withColumns(
                    {
                        "attempt": F.col("attempt") + 1,
                        "visible_ms": F.col("visible_ms") + delay_ms,
                    }
                )
            )
    out = finished[0]
    for part in finished[1:]:
        out = out.unionByName(part)
    return out


@graded(
    "reschedule_retry_loop",
    oracle=f"""
        WITH final AS (
            SELECT event_type,
                   CASE WHEN value > 120 THEN 'ACCEPT'
                        WHEN event_type = 'view' THEN 'ACCEPT'
                        WHEN event_type = 'click' THEN 'DLQ'
                        ELSE 'REJECT' END AS final_verdict,
                   CASE WHEN value > 120 THEN 1
                        WHEN event_type = 'view' THEN 3
                        WHEN event_type = 'click' THEN {_MAX_ATTEMPTS}
                        ELSE 1 END AS n_del,
                   epoch_ms(ts) AS ts_ms
            FROM events
        )
        SELECT event_type, final_verdict,
               count(*) AS n_messages,
               CAST(sum(n_del) AS BIGINT) AS n_deliveries,
               max(ts_ms + (n_del - 1) * {_RETRY_DELAY_MS}) AS max_visible_ms
        FROM final GROUP BY 1, 2
    """,
    section="B13,E10,B15",
    description="RESCHEDULE retry-topic loop end-to-end: re-enqueue with "
    "attempt+1 and not_before visibility, re-evaluate past the horizon, "
    "accept-on-backoff (view events at attempt 3) or exhaust to DLQ "
    "(click events at the attempt cap); per-class message/delivery counts "
    "and the max visibility horizon, graded against the closed-form "
    "oracle of the selector chain",
)
def reschedule_retry_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is the CLOSED FORM of the loop (the verdict chain is
    deterministic per message class), so the hash compare checks the
    loop's actual re-enqueue bookkeeping: attempt counters, visibility
    stamps, exhaustion-to-DLQ — exactly the accounting a retry topic must
    get right."""
    events = load(spark, "events", sf_dir)
    per_message = retry_topic_loop(events)
    return per_message.groupBy("event_type", "final_verdict").agg(
        F.count("*").alias("n_messages"),
        F.sum("n_deliveries").alias("n_deliveries"),
        F.max("final_visible_ms").alias("max_visible_ms"),
    )


# ---------------------------------------------------------------------------
# B1/B2/B4/B6 on a second schema — selector-compiler generality composite
# ---------------------------------------------------------------------------

_DOCS_SCHEMA = Schema(
    columns={
        "doc_id": "long",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "long",
    },
    props_col=None,
)
_DOCS_COMPOSITE = Selector(
    "(n_chars BETWEEN 200 AND 2000) AND n_chars % 7 > 2 "
    "AND NOT (lang = 'und') AND text LIKE '%the%'",
    schema=_DOCS_SCHEMA,
)


@graded(
    "selector_documents_composite",
    oracle=f"""
        SELECT lang, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE {_DOCS_COMPOSITE.duckdb_sql()}
        GROUP BY 1
    """,
    section="B1,B2,B4,B6,B12",
    description="composite selector over the DOCUMENTS schema (compiler "
    "generality beyond events): comparison + modulo arithmetic + BETWEEN "
    "+ NOT + LIKE in one predicate, per-lang aggregate",
)
def selector_documents_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.filter(_DOCS_COMPOSITE.column())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# G3 — second pandas UDAF: exact weighted sum (grouped agg, long-exact)
# ---------------------------------------------------------------------------


@graded(
    "g3b_pandas_udaf_weighted",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * (user_id % 3 + 1)) AS BIGINT) AS weighted_cents,
               count(*) AS n
        FROM events GROUP BY 1
    """,
    section="G3,G2",
    description="second grouped-agg pandas UDAF: exact weighted cents sum "
    "(weight = user_id%3+1) — int64 arithmetic stays order-independent, "
    "so the Arrow-batched aggregate remains hash-gradable",
)
def g3b_pandas_udaf_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def weighted_cents(value: pd.Series, user_id: pd.Series) -> int:
        # Half-AWAY-from-zero cents, matching DuckDB/Spark round();
        # pandas .round() is banker's half-to-even and diverges on exact
        # .5-cent ties (ADVICE r09 — same rule as pipeline._cents_half_up).
        scaled = value * 100
        cents_ = (np.floor(np.abs(scaled) + 0.5) * np.sign(scaled)).astype(
            "int64"
        )
        w = (user_id % 3 + 1).astype("int64")
        return int((cents_ * w).sum())

    @F.pandas_udf("long")
    def n_rows(value: pd.Series) -> int:
        return len(value)

    return (
        load(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(
            weighted_cents("value", "user_id").alias("weighted_cents"),
            n_rows("value").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# E6/C9 — stream-static enrichment against a broadcast RANGE dimension
# ---------------------------------------------------------------------------

_VALUE_BANDS = [
    ("micro", 0.0, 25.0),
    ("small", 25.0, 75.0),
    ("medium", 75.0, 150.0),
    ("large", 150.0, 300.0),
    ("jumbo", 300.0, 1e9),
]


@graded(
    "e6b_band_enrichment",
    oracle=f"""
        WITH bands(band, lo, hi) AS (VALUES
            {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _VALUE_BANDS)}
        )
        SELECT b.band, count(*) AS n_events,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events e JOIN bands b
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY 1
    """,
    section="E6,C9,C8",
    description="stream-static enrichment against a broadcast RANGE "
    "dimension (theta join: value >= lo AND value < hi) — the static-dim "
    "band lookup every metering/billing stream does; identical plan under "
    "readStream with the dim re-broadcast per micro-batch",
)
def e6b_band_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the dim is 5 literal rows → BroadcastNestedLoopJoin is
    the RIGHT plan (each event row probes 5 broadcast rows, no shuffle of
    the fact side); at 100 TB the alternative — binning via a CASE
    expression — is available, but the join form is what generalizes to
    user-maintained band tables."""
    bands = spark.createDataFrame(_VALUE_BANDS, "band string, lo double, hi double")
    events = load(spark, "events", sf_dir)
    from pulsar_message_filter_spark.operators.parity import cents

    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# E2/C21 — sliding-window top revenue type (4-hop 2h/30min windows)
# ---------------------------------------------------------------------------

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


@graded(
    "e2b_sliding_top_type",
    oracle=f"""
        WITH hopped AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                       - k.k * INTERVAL '30 minutes' AS w,
                   event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents_
            FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
        ), per AS (
            SELECT w, event_type, CAST(sum(cents_) AS BIGINT) AS cents
            FROM hopped GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY w
                                         ORDER BY cents DESC, event_type) AS rk
            FROM per
        )
        SELECT strftime(w, '{_TS_DUCK_FMT}') AS window_start,
               event_type AS top_type, cents AS top_cents
        FROM ranked WHERE rk = 1
    """,
    section="E2,C21",
    description="sliding 2h/30min windows (each event in exactly 4 hops), "
    "top revenue event type per window — the dashboard 'leader per "
    "sliding window' shape; oracle enumerates the 4 hops explicitly",
)
def e2b_sliding_top_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.operators.parity import cents

    per = (
        load(spark, "events", sf_dir)
        .groupBy(
            F.window("ts", "2 hours", "30 minutes").start.alias("w"),
            "event_type",
        )
        .agg(F.sum(cents("value")).alias("cents"))
    )
    wr = Window.partitionBy("w").orderBy(F.desc("cents"), "event_type")
    return (
        per.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.date_format("w", _TS_FMT).alias("window_start"),
            F.col("event_type").alias("top_type"),
            F.col("cents").alias("top_cents"),
        )
    )


# ---------------------------------------------------------------------------
# F9/F3 — TF-IDF document-to-document cosine (sparse dot over shared terms)
# ---------------------------------------------------------------------------


@graded(
    "f9b_tfidf_doc_cosine",
    oracle="""
        WITH terms AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        weights AS (
            SELECT t.doc_id, t.term,
                   count(*) * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)
                       AS w
            FROM terms t JOIN df USING (term) CROSS JOIN n
            WHERE t.doc_id < 25
            GROUP BY t.doc_id, t.term, df.df, n.n_docs
        ), norms AS (
            SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM weights GROUP BY 1
        ), dots AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
            FROM weights a JOIN weights b
              ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots
        JOIN norms na ON na.doc_id = id_a
        JOIN norms nb ON nb.doc_id = id_b
        ORDER BY cos_sim DESC, id_a, id_b LIMIT 15
    """,
    section="F9,F3,C22",
    description="TF-IDF document-to-document cosine: sparse dot product "
    "over SHARED terms only (term-keyed self-join — never a dense pair "
    "explosion), idf from the full corpus, top-15 most similar pairs in "
    "a 25-doc window",
)
def f9b_tfidf_doc_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lexical twin of embedding similarity (F3/F4): at 100 TB the
    term-keyed join IS the scalable form — each term's posting list joins
    only with itself (vocabulary-partitioned), so the cost is Σ df(term)²
    over shared terms, not |docs|² — the same inverted-index shape as
    f43/f44."""
    from pulsar_message_filter_spark.operators.text import tokens

    docs = load(spark, "documents", sf_dir)
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    df_ = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    weights = (
        terms.filter(F.col("doc_id") < 25)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )
    # weights feeds THREE consumers (norms + both self-join sides), so
    # Catalyst re-plans the explode+df-join chain per branch.  Both forms
    # were measured at gate scale (cold solo session): pipelined ~7.1 s,
    # persist() ~7.3 s — indistinguishable, because the subtree is small
    # and the dominant cost is session/footer warm-up; the pipelined form
    # ships for the simpler plan.  At 100 TB recompute means three full
    # corpus passes, and the right fix is materializing weights to
    # storage (the inverted-index table f44 builds), not an executor
    # cache.
    norms = weights.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") ** 2)).alias("nrm"))
    a = weights.select(
        F.col("doc_id").alias("id_a"), "term", F.col("w").alias("wa")
    )
    b = weights.select(
        F.col("doc_id").alias("id_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "id_a", "id_b")
        .limit(15)
    )
