"""Round-8 graded breadth — thin §2 rows widened (VERDICT r07 #2/#3).

Each query targets a §2 row that previously had ≤1 graded entry
(D6/D7 map+JSON, E2 sliding, E4 stream-dedup, E7/E8 twins, F7 stopwords,
C3 distinct, C7 cross join, C16 grouping flags, C17 multi-measure pivot,
A1/A2 partition-pruned read, A6 DLQ reasons) plus one LLM-pipeline
curation curve (F6/F14).  All oracle-checked — no new rows-only entries,
so the 22 never-driver-graded names stay inside the driver's 50-query
window this round.

Parity conventions per registry.py docstring: identical aliases both
sides, integer-cents for money aggregates, epoch-µs session detection
with ms outputs, no raw array/map output columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.filtering import with_verdict
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.operators.text import STOPWORDS, tokens
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.tmpdirs import run_scoped_dir
from pulsar_message_filter_spark.selector import Selector

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------------
# E3 × E8 — the session-TTL batch twin (VERDICT r07 #3): the graded form of
# the exact semantics streaming/pipeline.session_ttl_tws must reproduce.
# ---------------------------------------------------------------------------

_TTL_GAP_MS = 30 * 60 * 1000  # session_ttl_tws's default gap


@graded(
    "session_ttl_batch_twin",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {_TTL_GAP_MS * 1000}
                        OR lag(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), numbered AS (
            SELECT user_id, ts_us,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered
        )
        SELECT user_id,
               CAST(min(ts_us) // 1000 AS BIGINT) AS session_start_ms,
               CAST(max(ts_us) // 1000 AS BIGINT) AS session_end_ms,
               count(*) AS n_events
        FROM numbered GROUP BY user_id, sid
    """,
    section="E3,E8",
    description="batch-equivalence twin of session_ttl_tws (SAME 30-min gap, "
    "SAME emit schema incl. last-event end): one shared builder serves the "
    "TWS batch-equivalence pytest AND this driver-hash-checked query, so "
    "the streaming op's semantics carry oracle evidence",
)
def session_ttl_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs ``streaming.pipeline.session_ttl_batch`` — the function
    ``tests/test_streaming.py::test_tws_timer_session_expiry`` compares
    against live ``session_ttl_tws`` output — over the events table.
    Session detection happens at native µs precision (``session_window``);
    only the OUTPUT is ms, matching the TWS emit."""
    from pulsar_message_filter_spark.streaming.pipeline import session_ttl_batch

    return session_ttl_batch(load(spark, "events", sf_dir), gap_ms=_TTL_GAP_MS)


# ---------------------------------------------------------------------------
# E8 twins #2 and #3 — MapState/ListState profile and the value-state
# running counter, final/update-mode semantics graded relationally
# ---------------------------------------------------------------------------


@graded(
    "user_profile_batch_twin",
    oracle="""
        WITH tc AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY 1, 2
        ),
        modal AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY c DESC, event_type) AS rk
            FROM tc
        ),
        heads AS (
            SELECT t.user_id,
                   CAST(count(*) AS INTEGER) AS n_types,
                   sum(t.c) AS n_events,
                   max(CASE WHEN m.rk = 1 THEN m.event_type END) AS top_type
            FROM tc t JOIN modal m
              ON t.user_id = m.user_id AND t.event_type = m.event_type
            GROUP BY 1
        ),
        lastk AS (
            SELECT user_id, ts_us, event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts) DESC,
                                                   event_id DESC) AS rn
                FROM events
            ) WHERE rn <= 3
        ),
        recent AS (
            SELECT user_id,
                   string_agg(CAST(cents AS VARCHAR), ':'
                              ORDER BY ts_us, event_id) AS recent_csv
            FROM lastk GROUP BY 1
        )
        SELECT h.user_id, h.n_types, h.top_type,
               CAST(h.n_events AS BIGINT) AS n_events, r.recent_csv
        FROM heads h JOIN recent r ON h.user_id = r.user_id
    """,
    section="E8,C15,C18",
    description="batch twin of user_profile_tws (MapState + ListState): "
    "final per-user type counts, modal type with the processor's exact "
    "tiebreak, and the last-3 value buffer as the SAME cents-CSV string "
    "the streaming op emits — MapState/ListState semantics made "
    "driver-hash-checkable",
)
def user_profile_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs ``streaming.pipeline.user_profile_batch`` — the function the
    MapState/ListState pytest compares against live ``user_profile_tws``
    output — over the events table."""
    from pulsar_message_filter_spark.streaming.pipeline import user_profile_batch

    return user_profile_batch(load(spark, "events", sf_dir), keep_last=3)


@graded(
    "redelivery_counter_batch_twin",
    oracle="""
        WITH per_epoch AS (
            SELECT user_id, event_id % 3 AS epoch_id, count(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, epoch_id,
               CAST(sum(c) OVER (PARTITION BY user_id ORDER BY epoch_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_seen
        FROM per_epoch
    """,
    section="E8,C20",
    description="batch twin of redelivery_counter_tws update-mode output: "
    "per (user, emulated micro-batch) the RUNNING count the value-state "
    "processor would emit — deterministic event_id%3 epoch split, grouped "
    "count + cumulative window",
)
def redelivery_counter_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.streaming.pipeline import (
        redelivery_counter_batch,
    )

    return redelivery_counter_batch(load(spark, "events", sf_dir), epochs=3)


# ---------------------------------------------------------------------------
# E2 — sliding-window distinct reach (3h window / 1h slide)
# ---------------------------------------------------------------------------


@graded(
    "window_sliding_reach",
    oracle=f"""
        SELECT strftime(window_start, '{_DUCK_FMT}') AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS reach,
               count(*) AS n
        FROM (
            SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS window_start,
                   user_id
            FROM events, (VALUES (0), (1), (2)) AS offs(o)
        ) GROUP BY 1
    """,
    section="E2,C12",
    description="sliding 3h/1h windows with DISTINCT-user reach: each event "
    "lands in exactly three windows; distinct-in-window is the state the "
    "streaming form keeps per open window",
)
def window_sliding_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .groupBy(F.window("ts", "3 hours", "1 hour").start.alias("w"))
        .agg(
            F.countDistinct("user_id").alias("reach"),
            F.count("*").alias("n"),
        )
        .select(F.date_format("w", _FMT).alias("window_start"), "reach", "n")
    )


# ---------------------------------------------------------------------------
# E4 — keep-LAST dedup (the upsert twin of stream_dedup_first)
# ---------------------------------------------------------------------------


@graded(
    "stream_dedup_keep_last",
    oracle=f"""
        SELECT user_id, event_type,
               event_id AS last_event_id,
               {cents_sql('value')} AS last_value_cents,
               epoch_us(ts) AS last_ts_us
        FROM (
            SELECT user_id, event_type, event_id, value, ts,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY epoch_us(ts) DESC,
                                               event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    section="E4,C18",
    description="keep-LAST dedup per key (upsert semantics): the complement "
    "of stream_dedup_first — under streaming this is dropDuplicates on a "
    "changelog ordered by event time, i.e. the compacted-topic read",
)
def stream_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    return (
        load(spark, "events", sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            cents("value").alias("last_value_cents"),
            F.unix_micros("ts").alias("last_ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# D7 — JSON construct → parse round trip (to_json / from_json /
# get_json_object over a nested struct + array document)
# ---------------------------------------------------------------------------


@graded(
    "func_json_roundtrip",
    oracle=f"""
        SELECT o_orderkey AS okey,
               o_orderstatus AS status_rt,
               {cents_sql('o_totalprice')} AS price_cents_rt,
               strftime(o_orderdate, '%Y-%m-%d') AS d_rt,
               o_orderpriority AS tag2,
               {cents_sql('o_totalprice')} AS price_via_path
        FROM orders WHERE o_orderkey < 2000
    """,
    section="D7,D6",
    description="JSON round trip: build a nested doc (struct + sub-struct + "
    "array) with to_json, re-parse with a from_json schema, path-extract "
    "with get_json_object incl. an array index — every output equals the "
    "source column, so the oracle is direct selection (manual-twin)",
)
def func_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    js = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderstatus").alias("status"),
            F.struct(
                cents("o_totalprice").alias("price_cents"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            ).alias("meta"),
            F.array(F.lit("x"), F.col("o_orderpriority")).alias("tags"),
        )
    )
    parsed = F.from_json(
        F.col("js"),
        "okey long, status string, "
        "meta struct<price_cents: long, d: string>, tags array<string>",
    )
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < 2000)
        .withColumn("js", js)
        .withColumn("p", parsed)
        .select(
            F.col("p.okey").alias("okey"),
            F.col("p.status").alias("status_rt"),
            F.col("p.meta.price_cents").alias("price_cents_rt"),
            F.col("p.meta.d").alias("d_rt"),
            F.get_json_object("js", "$.tags[1]").alias("tag2"),
            F.get_json_object("js", "$.meta.price_cents")
            .cast("long")
            .alias("price_via_path"),
        )
    )


# ---------------------------------------------------------------------------
# D7 × D5 — JSON array document: serialize a per-user event log, re-parse as
# array<struct>, aggregate with array lambdas
# ---------------------------------------------------------------------------


@graded(
    "func_json_array_stats",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_items,
               CAST(sum({cents_sql('value')}) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase
        FROM events GROUP BY 1
    """,
    section="D7,D5",
    description="JSON array round trip: per-user event log serialized with "
    "to_json(collect_list(struct)), re-parsed as array<struct>, then reduced "
    "with aggregate/filter lambdas — outputs are order-insensitive so "
    "collect_list nondeterminism cannot leak (oracle aggregates directly)",
)
def func_json_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = F.from_json(
        F.to_json(F.col("items_raw")),
        "array<struct<vc: long, event_type: string>>",
    )
    return (
        load(spark, "events", sf_dir)
        .select("user_id", cents("value").alias("vc"), "event_type")
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("vc", "event_type")).alias("items_raw"))
        .withColumn("items", items)
        .select(
            "user_id",
            F.size("items").cast("long").alias("n_items"),
            F.aggregate(
                "items", F.lit(0).cast("long"), lambda acc, x: acc + x["vc"]
            ).alias("total_cents"),
            F.size(
                F.filter("items", lambda x: x["event_type"] == "purchase")
            )
            .cast("long")
            .alias("n_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# D6 — map construction from grouped entries + map-side aggregation
# ---------------------------------------------------------------------------


@graded(
    "func_map_entries_agg",
    oracle="""
        WITH hourly AS (
            SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS h,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_hours,
               CAST(coalesce(max(CASE WHEN h = 12 THEN c END), 0) AS BIGINT)
                   AS noon_events,
               CAST(max(c) AS BIGINT) AS peak_hour_events,
               CAST(sum(c) AS BIGINT) AS total_events
        FROM hourly GROUP BY 1
    """,
    section="D6,C11",
    description="map built from grouped entries (map_from_entries over "
    "collect_list) then consumed map-side: size, element_at lookup, "
    "array_max over map_values, aggregate-lambda sum — the hour→count "
    "profile map per event type",
)
def func_map_entries_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load(spark, "events", sf_dir)
        .groupBy("event_type", F.hour("ts").cast("long").alias("h"))
        .agg(F.count("*").alias("c"))
    )
    m = F.map_from_entries(F.collect_list(F.struct("h", "c")))
    return (
        hourly.groupBy("event_type")
        .agg(m.alias("m"))
        .select(
            "event_type",
            F.size("m").cast("long").alias("n_hours"),
            F.coalesce(F.element_at("m", F.lit(12)), F.lit(0))
            .cast("long")
            .alias("noon_events"),
            F.array_max(F.map_values("m")).cast("long").alias("peak_hour_events"),
            F.aggregate(
                F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("total_events"),
        )
    )


# ---------------------------------------------------------------------------
# F7 × F10 — stopword share per source (corpus-quality profile)
# ---------------------------------------------------------------------------


@graded(
    "f7b_stopword_share",
    oracle=f"""
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                       t -> t IN {STOPWORDS!r}))) AS BIGINT) AS stop_tokens,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS all_tokens,
               round(CAST(sum(len(list_filter(string_split(text, ' '),
                           t -> t IN {STOPWORDS!r}))) AS DOUBLE)
                     / sum(len(string_split(text, ' '))), 4) AS stop_share
        FROM documents GROUP BY 1
    """,
    section="F7,F10",
    description="per-source stopword share: the C4-style quality signal that "
    "flags boilerplate-heavy sources; same tokenizer + stopword list as "
    "f7_stopword_filter",
)
def f7b_stopword_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens(F.col("text"))
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(
            F.sum(F.size(stop)).alias("stop_tokens"),
            F.sum(F.size(toks)).alias("all_tokens"),
        )
        .select(
            "source",
            "stop_tokens",
            "all_tokens",
            F.round(
                F.col("stop_tokens").cast("double") / F.col("all_tokens"), 4
            ).alias("stop_share"),
        )
    )


# ---------------------------------------------------------------------------
# C3 × D2 — DISTINCT projection feeding an aggregate (active-days profile)
# ---------------------------------------------------------------------------


@graded(
    "distinct_event_days",
    oracle="""
        SELECT user_id,
               count(*) AS n_days,
               min(day) AS first_day,
               max(day) AS last_day
        FROM (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
              FROM events)
        GROUP BY 1
    """,
    section="C3,D2",
    description="distinct (user, day) pairs then per-user active-day count "
    "and first/last day — DISTINCT as a real pipeline stage, not a leaf",
)
def distinct_event_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_days"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
    )


# ---------------------------------------------------------------------------
# C7 × C8 — tiny-dim cross-join coverage grid (zero-filled contingency)
# ---------------------------------------------------------------------------


@graded(
    "cross_lang_source_grid",
    oracle="""
        SELECT g.lang AS lang, g.source AS source,
               CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
               CAST(coalesce(a.sum_chars, 0) AS BIGINT) AS sum_chars
        FROM (SELECT l.lang, s.source
              FROM (SELECT DISTINCT lang FROM documents) l
              CROSS JOIN (SELECT DISTINCT source FROM documents) s) g
        LEFT JOIN (SELECT lang, source, count(*) AS n_docs,
                          CAST(sum(n_chars) AS BIGINT) AS sum_chars
                   FROM documents GROUP BY 1, 2) a
          ON g.lang = a.lang AND g.source = a.source
    """,
    section="C7,C8,C5",
    description="full lang × source grid via cross join of two tiny DISTINCT "
    "dims, zero-filled by left join — the dense-contingency shape; both dim "
    "sides broadcast at any corpus scale",
)
def cross_lang_source_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    langs = docs.select("lang").distinct()
    sources = docs.select("source").distinct()
    actual = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs_raw"),
        F.sum("n_chars").cast("long").alias("sum_chars_raw"),
    )
    return (
        langs.crossJoin(F.broadcast(sources))
        .join(actual, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce("n_docs_raw", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("sum_chars_raw", F.lit(0)).cast("long").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# C16 — grouping flags: grouping() / grouping_id() over GROUPING SETS
# ---------------------------------------------------------------------------


@graded(
    "grouping_id_measures",
    oracle="""
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source,
               CAST(2 * GROUPING(lang) + GROUPING(source) AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
    """,
    section="C16",
    description="grouping()/grouping_id() flags over four grouping sets — "
    "the subtotal-provenance columns a rollup consumer needs to tell a real "
    "'ALL' value from an aggregated one (the oracle derives gid from the "
    "per-column flags, pinning Spark's documented bit order)",
)
def grouping_id_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, "documents", sf_dir).createOrReplaceTempView("docs_gid")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               CAST(grouping(lang) AS BIGINT) AS g_lang,
               CAST(grouping(source) AS BIGINT) AS g_source,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM docs_gid
        GROUP BY lang, source GROUPING SETS ((lang, source), (lang), (source), ())
        """
    )


# ---------------------------------------------------------------------------
# C17 — pivot with TWO measures per pivot value
# ---------------------------------------------------------------------------

_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def _pivot_two_oracle() -> str:
    cols = ",\n               ".join(
        f"CAST(sum(CASE WHEN lang = '{v}' THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS {v}_n,\n               "
        f"CAST(sum(CASE WHEN lang = '{v}' THEN n_chars END) AS BIGINT) "
        f"/ sum(CASE WHEN lang = '{v}' THEN 1 END) AS {v}_avg_chars"
        for v in _PIVOT_LANGS
    )
    return f"SELECT source,\n               {cols}\n        FROM documents GROUP BY 1"


@graded(
    "pivot_two_measures",
    oracle=_pivot_two_oracle(),
    section="C17",
    description="pivot on lang with TWO measures per value (count + exact "
    "average via identical int-sum/count division) — the multi-measure "
    "pivot shape; oracle is the conditional-aggregation twin",
)
def pivot_two_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        load(spark, "documents", sf_dir)
        .groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .agg(  # count(lit(1)): count(*) is rejected inside a pivot agg list
            F.count(F.lit(1)).alias("n"),
            (F.sum("n_chars").cast("long") / F.count(F.lit(1))).alias("avg_chars"),
        )
    )
    # pivot names columns {value}_{aggAlias}; keep them, but make the count
    # long and null-safe types explicit
    sel = [F.col("source")]
    for v in _PIVOT_LANGS:
        # empty pivot cell → NULL count from Spark's pivot; 0 from the
        # oracle's conditional sum — normalize to 0
        sel.append(
            F.coalesce(F.col(f"{v}_n"), F.lit(0)).cast("long").alias(f"{v}_n")
        )
        sel.append(F.col(f"{v}_avg_chars").alias(f"{v}_avg_chars"))
    return piv.select(*sel)


# ---------------------------------------------------------------------------
# A1 × A2 — partition-pruned read: hive-partitioned write, pruned scan back
# ---------------------------------------------------------------------------


@graded(
    "a_partition_pruned_read",
    oracle="""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE lang IN ('en', 'de')
        GROUP BY 1, 2
    """,
    section="A1,A2,C2",
    description="hive-partitioned parquet write (partitionBy lang) then a "
    "pruned read back: the lang filter resolves at PLANNING time to two "
    "partition directories — tests/test_plans.py asserts the scan's "
    "partition filters; oracle recomputes from the source table",
)
def a_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: partition pruning turns a full-corpus scan into a
    directory-listing subset — no file of a non-selected lang is opened.
    Deterministic per-sf fixture dir, overwritten in place (same hygiene
    as rollup_queries._store_dir)."""
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = run_scoped_dir(f"pmf_part_lang_{tag}")
    docs.write.mode("overwrite").partitionBy("lang").parquet(root)
    return (
        spark.read.parquet(root)
        .filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# A6 × B13 × B3 — DLQ reject-reason taxonomy (3VL-aware)
# ---------------------------------------------------------------------------

_DLQ_SELECTOR = Selector(
    "event_type IN ('purchase', 'signup') AND (value > 100 OR props.j < 10)"
)


@graded(
    "dlq_reject_reasons",
    oracle=f"""
        WITH tagged AS (
            SELECT CASE WHEN {_DLQ_SELECTOR.duckdb_sql()}
                        THEN 'ACCEPT' ELSE 'REJECT' END AS verdict,
                   CASE WHEN {_DLQ_SELECTOR.duckdb_sql()} THEN 'accepted'
                        WHEN ({_DLQ_SELECTOR.duckdb_sql()}) IS NULL
                        THEN 'rejected_unknown_3vl'
                        ELSE 'rejected_no_match' END AS reason,
                   value
            FROM events
        )
        SELECT verdict, reason, count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM tagged GROUP BY 1, 2
    """,
    section="A6,B13,B3",
    description="DLQ taxonomy: rejects split by REASON — predicate false vs "
    "JMS-3VL UNKNOWN (missing property ⇒ NULL comparison) — the breakdown a "
    "DLQ consumer needs to separate data bugs from selector bugs",
)
def dlq_reject_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = _DLQ_SELECTOR.column()
    return (
        with_verdict(load(spark, "events", sf_dir), _DLQ_SELECTOR)
        .withColumn(
            "reason",
            F.when(F.col("verdict") == "ACCEPT", F.lit("accepted"))
            .when(pred.isNull(), F.lit("rejected_unknown_3vl"))
            .otherwise(F.lit("rejected_no_match")),
        )
        .groupBy("verdict", "reason")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# D7 — VARIANT (Spark 4 semi-structured type): parse_json → variant_get
# ---------------------------------------------------------------------------


@graded(
    "func_variant_json",
    oracle=f"""
        SELECT o_orderkey AS okey,
               {cents_sql('o_totalprice')} AS price_cents,
               o_orderpriority AS tag2,
               o_orderstatus AS status,
               CAST(length(o_orderpriority) AS INTEGER) AS tag2_len
        FROM orders WHERE o_orderkey < 1500
    """,
    section="D7,D6",
    description="Spark-4 VARIANT type: build a nested JSON doc, parse_json "
    "into a VARIANT column, extract typed scalars with variant_get paths "
    "(incl. an array index) — every output equals the source column, so "
    "the oracle is direct selection (manual-twin, like func_json_roundtrip)",
)
def func_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT is the Spark-4-native answer to schemaless JSON columns:
    parse once into a binary-encoded tree, then typed path extraction
    without a declared schema — the open-ended twin of ``from_json``'s
    schema-first path.  DuckDB has no VARIANT, so the oracle recomputes
    the extracted scalars directly (round-trip identity)."""
    load(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") < 1500
    ).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH j AS (
            SELECT parse_json(
                to_json(named_struct(
                    'okey', o_orderkey,
                    'meta', named_struct(
                        'price_cents', CAST(round(o_totalprice * 100) AS BIGINT),
                        'status', o_orderstatus),
                    'tags', array('x', o_orderpriority)))) AS v
            FROM orders_v
        )
        SELECT variant_get(v, '$.okey', 'long') AS okey,
               variant_get(v, '$.meta.price_cents', 'long') AS price_cents,
               variant_get(v, '$.tags[1]', 'string') AS tag2,
               variant_get(v, '$.meta.status', 'string') AS status,
               length(variant_get(v, '$.tags[1]', 'string')) AS tag2_len
        FROM j
        """
    )


# ---------------------------------------------------------------------------
# G7 × D3 — SQL scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr)
# ---------------------------------------------------------------------------


@graded(
    "g7_sql_scalar_udf",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n
        FROM lineitem WHERE l_quantity < 25
        GROUP BY 1
    """,
    section="G7,D3,C11",
    description="SQL scalar UDF (Spark-4 CREATE FUNCTION ... RETURN expr): "
    "the discounted-revenue formula defined ONCE as a catalog function and "
    "applied in an aggregate — Catalyst inlines it, so the plan is "
    "identical to the written-out expression (no Python, no serialization); "
    "oracle inlines the same formula",
)
def g7_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale point: SQL UDFs are the ONLY UDF flavor with zero
    executor-side cost — they are macro-expanded into the plan, keeping
    whole-stage codegen intact (contrast G1's row-at-a-time Python UDF,
    kept as the documented anti-pattern demo)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION pmf_revenue_cents("
        "price DOUBLE, disc DOUBLE) RETURNS BIGINT "
        "RETURN CAST(round(price * (1 - disc) * 100) AS BIGINT)"
    )
    load(spark, "lineitem", sf_dir).filter(
        F.col("l_quantity") < 25
    ).createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(pmf_revenue_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS revenue_cents,
               count(*) AS n
        FROM lineitem_v GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# C20 × C19 × D2 — trailing TIME-range frame per key (rolling exposure)
# ---------------------------------------------------------------------------

_TRAIL_US = 3_600_000_000  # 1 hour


@graded(
    "window_trailing_hour",
    oracle=f"""
        SELECT event_id,
               CAST(sum({cents_sql('value')}) OVER w AS BIGINT)
                   AS trail_cents,
               CAST(count(*) OVER w AS BIGINT) AS trail_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
    """,
    section="C20,C19,D2",
    description="per-user trailing-1-hour RANGE frame at every event (value "
    "sum + count over [t-1h, t]) — the rolling-exposure / rate-limit "
    "window; value-defined frames make the result tie-order-independent, "
    "so it hashes exactly",
)
def window_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one shuffle on user_id + an in-partition ordered scan;
    the frame is bounded by TIME, so per-row state is the trailing hour's
    rows regardless of corpus size (contrast a global RANGE window, which
    serializes — see window_range_frame's distinct-value rewrite)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_TRAIL_US, 0)
    )
    return load(spark, "events", sf_dir).select(
        "event_id",
        F.sum(cents("value")).over(w).cast("long").alias("trail_cents"),
        F.count("*").over(w).cast("long").alias("trail_n"),
    )


# ---------------------------------------------------------------------------
# A1 × A2 — CSV round trip with quoting (the second ingest format)
# ---------------------------------------------------------------------------


@graded(
    "a_csv_roundtrip_read",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS sum_text_chars,
               CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
        FROM documents WHERE doc_id < 3000
        GROUP BY 1
    """,
    section="A1,A2,D1",
    description="CSV write→read round trip with quote/escape handling: free "
    "text (spaces, potential delimiters) survives the quoted CSV sink and "
    "the schema-first read byte-exactly — the oracle recomputes from the "
    "source table, so any quoting bug breaks the text-length hash",
)
def a_csv_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: CSV remains the interchange format the perimeter
    speaks; correctness there is quoting, not speed.  Deterministic per-sf
    fixture dir, overwritten in place (same hygiene as the other
    store-building queries)."""
    docs = (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 3000)
        .select("doc_id", "lang", "text", "n_chars")
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = run_scoped_dir(f"pmf_csv_rt_{tag}")
    docs.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(root)
    back = (
        spark.read.schema("doc_id long, lang string, text string, n_chars long")
        .option("header", "true")
        .option("escape", '"')
        .csv(root)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_text_chars"),
        F.sum("n_chars").cast("long").alias("sum_n_chars"),
    )


# ---------------------------------------------------------------------------
# F8 × F14 — cross-epoch vocabulary novelty (training-data freshness)
# ---------------------------------------------------------------------------


@graded(
    "f80_epoch_vocab_novelty",
    oracle="""
        WITH tok AS (
            SELECT doc_id % 4 AS epoch_id,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        first_seen AS (
            SELECT tok, min(epoch_id) AS first_epoch
            FROM tok GROUP BY 1
        ),
        per_epoch AS (
            SELECT epoch_id, count(DISTINCT tok) AS vocab
            FROM tok GROUP BY 1
        )
        SELECT p.epoch_id,
               CAST(p.vocab AS BIGINT) AS vocab,
               CAST(coalesce(n.novel, 0) AS BIGINT) AS novel_tokens,
               round(CAST(coalesce(n.novel, 0) AS DOUBLE) / p.vocab, 4)
                   AS novelty_rate
        FROM per_epoch p
        LEFT JOIN (SELECT first_epoch AS epoch_id, count(*) AS novel
                   FROM first_seen GROUP BY 1) n
          ON p.epoch_id = n.epoch_id
    """,
    section="F8,F14,C11",
    description="cross-epoch vocabulary novelty: per ingest epoch the "
    "distinct-token count and how many tokens were never seen in ANY "
    "earlier epoch — the freshness signal that tells a continual-training "
    "pipeline when new data stops adding new language",
)
def f80_epoch_vocab_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one explode pass, then token-keyed aggs (map-side
    combinable); 'novel' is min(first_epoch) per token — never a
    self-join of epoch vocabularies."""
    tok = (
        load(spark, "documents", sf_dir)
        .select(
            (F.col("doc_id") % 4).alias("epoch_id"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
    )
    per_epoch = tok.groupBy("epoch_id").agg(
        F.countDistinct("tok").alias("vocab")
    )
    novel = (
        tok.groupBy("tok")
        .agg(F.min("epoch_id").alias("epoch_id"))
        .groupBy("epoch_id")
        .agg(F.count("*").alias("novel"))
    )
    return per_epoch.join(novel, "epoch_id", "left").select(
        "epoch_id",
        F.col("vocab").cast("long").alias("vocab"),
        F.coalesce("novel", F.lit(0)).cast("long").alias("novel_tokens"),
        F.round(
            F.coalesce("novel", F.lit(0)).cast("double") / F.col("vocab"), 4
        ).alias("novelty_rate"),
    )


# ---------------------------------------------------------------------------
# F1 × F10 — per-source duplication profile (curation health metric)
# ---------------------------------------------------------------------------


@graded(
    "f81_source_dup_profile",
    oracle="""
        SELECT source,
               count(*) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
               CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
                   AS n_dup_docs,
               round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
                     / count(*), 4) AS dup_rate
        FROM documents GROUP BY 1
    """,
    section="F1,F10,D8",
    description="per-source exact-duplication profile via content digest: "
    "docs, distinct contents, and the dup rate — the first health metric a "
    "curation pipeline computes per provenance bucket",
)
def f81_source_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "documents", sf_dir)
        .select("source", F.md5(F.col("text").cast("binary")).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct"))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(
                (F.col("n_docs") - F.col("n_distinct")).cast("double")
                / F.col("n_docs"),
                4,
            ).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# E4 — time-bounded keep-first dedup (the dropDuplicatesWithinWatermark
# batch form: dedup scope is a day, not all time)
# ---------------------------------------------------------------------------


@graded(
    "stream_dedup_daily_first",
    oracle="""
        SELECT user_id, event_type, day,
               event_id AS first_event_id
        FROM (
            SELECT user_id, event_type, event_id,
                   strftime(ts, '%Y-%m-%d') AS day,
                   row_number() OVER (
                       PARTITION BY user_id, event_type, strftime(ts, '%Y-%m-%d')
                       ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    section="E4,D2",
    description="keep-first dedup scoped to a day bucket — the batch form "
    "of dropDuplicatesWithinWatermark, where the dedup horizon (and the "
    "state the stream must keep) is the watermark window, not all of time",
)
def stream_dedup_daily_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = F.date_format("ts", "yyyy-MM-dd")
    w = Window.partitionBy("user_id", "event_type", day.alias("day")).orderBy(
        F.unix_micros("ts"), "event_id"
    )
    return (
        load(spark, "events", sf_dir)
        .withColumn("day", day)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "day",
            F.col("event_id").alias("first_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# F6 × F14 × C7 — token-budget curation curve
# ---------------------------------------------------------------------------

_BUDGET_CUTS = (64, 128, 256, 512, 1024)


@graded(
    "f78_token_budget_curve",
    oracle=f"""
        WITH toks AS (SELECT len(string_split(text, ' ')) AS nt
                      FROM documents),
             cuts AS (SELECT unnest({list(_BUDGET_CUTS)}) AS cutoff)
        SELECT CAST(cutoff AS BIGINT) AS cutoff,
               CAST(sum(CASE WHEN nt <= cutoff THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs_within,
               CAST(sum(least(nt, cutoff)) AS BIGINT) AS tokens_kept,
               CAST(sum(nt) AS BIGINT) AS tokens_total
        FROM toks, cuts GROUP BY 1
    """,
    section="F6,F14,C7",
    description="token-budget curation curve: docs fully inside / tokens "
    "retained under truncation at each max-length cutoff — the sizing table "
    "for a context-length or packing decision; tiny cutoff dim broadcast "
    "against one corpus pass",
)
def f78_token_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cuts = spark.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in _BUDGET_CUTS])).alias("cutoff_raw")
    ).select(F.col("cutoff_raw").cast("long").alias("cutoff"))
    nt = F.size(tokens(F.col("text")))
    return (
        load(spark, "documents", sf_dir)
        .select(nt.alias("nt"))
        .crossJoin(F.broadcast(cuts))
        .groupBy("cutoff")
        .agg(
            F.sum(F.when(F.col("nt") <= F.col("cutoff"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_within"),
            F.sum(F.least(F.col("nt").cast("long"), F.col("cutoff")))
            .cast("long")
            .alias("tokens_kept"),
            F.sum("nt").cast("long").alias("tokens_total"),
        )
    )
