"""Round-14 widening queries — second oracle-checked entries for the
thin 1-query §2 rows flagged in VERDICT r09 item #6: G6 (Python UDTF),
G4 (grouped map), C15 (collect_list), B7 (IS NULL / 3VL).

Same design rules as widen.py: idiomatic Column algebra / minimal Python
surface, hand-paired DuckDB oracle per query, identical output aliases on
both sides, exact integers or strings only (no raw doubles), and a
100 TB scale note in each docstring.

Reference caveat (SURVEY.md §0): /root/reference ships no source; the
binding spec is the JMS/SQL92 selector surface plus the driver's
DuckDB-oracle contract.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.selector import Selector

_CHUNK = 8  # tokens per chunk in the G6 chunker


# ---------------------------------------------------------------------------
# G6 — second Python UDTF: fixed-size token chunker (table-generating)
# ---------------------------------------------------------------------------


@graded(
    "g6b_udtf_chunker",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents WHERE doc_id < 40)
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, CAST(ceil(len(toks)/{_CHUNK}.0) AS BIGINT)),
                   i -> CAST(i - 1 AS BIGINT))) AS chunk_idx,
               unnest(list_transform(
                   generate_series(1, CAST(ceil(len(toks)/{_CHUNK}.0) AS BIGINT)),
                   i -> CAST(least(i*{_CHUNK}, len(toks)) - (i-1)*{_CHUNK}
                        AS BIGINT))) AS n_tokens,
               unnest(list_transform(
                   generate_series(1, CAST(ceil(len(toks)/{_CHUNK}.0) AS BIGINT)),
                   i -> array_to_string(
                        toks[((i-1)*{_CHUNK}+1):(i*{_CHUNK})], ' '))) AS chunk_text
        FROM t
    """,
    section="G6,G7",
    description=f"second Python UDTF: fixed {_CHUNK}-token document chunker "
    "(the context-window packing primitive) — each doc expands to "
    f"ceil(n/{_CHUNK}) rows with chunk_idx/n_tokens/chunk_text, graded "
    "against a zipped lateral-unnest oracle",
)
def g6b_udtf_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTFs run row-at-a-time in Python — fine here because each call
    fans OUT (one doc → many chunks) so the Python crossing is amortized
    per chunk, and chunking is I/O-shaped anyway.  At 100 TB the same
    plan holds: LATERAL over a scan is embarrassingly parallel with no
    shuffle; the pure-Column alternative (sequence + transform + explode,
    used by text.chunk_documents / f42) stays the hot-path choice — this
    entry grades the UDTF *surface* itself."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: long, n_tokens: long, chunk_text: string")
    class Chunker:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(math.ceil(len(toks) / _CHUNK)):
                piece = toks[i * _CHUNK : (i + 1) * _CHUNK]
                yield i, len(piece), " ".join(piece)

    spark.udtf.register("pmf_chunker", Chunker)
    load(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 40
    ).createOrReplaceTempView("g6b_docs")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk_text "
        "FROM g6b_docs, LATERAL pmf_chunker(text) c"
    )


# ---------------------------------------------------------------------------
# G4 — second grouped map: per-group transform that KEEPS every row
# ---------------------------------------------------------------------------


@graded(
    "g4b_grouped_map_gap_rank",
    oracle="""
        SELECT label,
               vec_id,
               CAST(row_number() OVER w AS BIGINT) AS rnk,
               CAST(vec_id - coalesce(lag(vec_id) OVER w, vec_id) AS BIGINT)
                   AS gap
        FROM embeddings
        WINDOW w AS (PARTITION BY label ORDER BY vec_id)
    """,
    section="G4",
    description="second applyInPandas grouped map — a transform that keeps "
    "every row (rank within label + gap to the previous vec_id), the "
    "sessionize/feature-engineering shape, vs a window-function oracle; "
    "exact int64 outputs keep it hash-gradable (the g3b lesson applied "
    "to G4, per VERDICT r09 #6)",
)
def g4b_grouped_map_gap_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map is the escape hatch for per-group logic Spark's window
    functions can't express; this query IS window-expressible on purpose
    so the oracle can grade the mechanism exactly.  Scale: one shuffle on
    label (same as the window plan), each group materializes as ONE
    pandas frame — bounded here (≤ |embeddings|/|labels| rows); for
    groups that wouldn't fit an executor, the window-function form or a
    salted two-pass is the 100 TB fallback."""

    def rank_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        out = pdf[["label", "vec_id"]].copy()
        out["rnk"] = range(1, len(pdf) + 1)
        out["gap"] = pdf["vec_id"].diff().fillna(0).astype("int64")
        return out

    return (
        load(spark, "embeddings", sf_dir)
        .groupBy("label")
        .applyInPandas(
            rank_gaps, "label int, vec_id bigint, rnk long, gap long"
        )
    )


# ---------------------------------------------------------------------------
# C15/D6 — collect_list → map_from_entries → map_entries roundtrip
# ---------------------------------------------------------------------------


@graded(
    "c15b_collect_entries_map",
    oracle="""
        WITH per_seg AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS n
            FROM customer GROUP BY 1, 2
        )
        SELECT c_nationkey,
               string_agg(c_mktsegment || ':' || CAST(n AS VARCHAR),
                          ',' ORDER BY c_mktsegment) AS seg_counts
        FROM per_seg GROUP BY 1
    """,
    section="C15,D6",
    description="second C15 entry: per-nation segment histogram built as "
    "collect_list(struct) -> map_from_entries -> map_entries roundtrip, "
    "canonicalized to a sorted 'seg:count' string (the no-raw-maps "
    "driver rule)",
)
def c15b_collect_entries_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combinable hash aggregates (nation×segment, then
    nation); the collected list is bounded by the segment cardinality
    (5), so the map column can never blow an executor — the pattern to
    copy at 100 TB is exactly this pre-aggregate-then-collect, never
    collect_list over raw rows."""
    per_seg = (
        load(spark, "customer", sf_dir)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    as_map = per_seg.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("c_mktsegment", "n"))
        ).alias("seg_map")
    )
    return as_map.select(
        "c_nationkey",
        F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries("seg_map"),
                    lambda e: F.concat_ws(
                        ":", e["key"], e["value"].cast("string")
                    ),
                )
            ),
            ",",
        ).alias("seg_counts"),
    )


# ---------------------------------------------------------------------------
# B7/B3 — NULL-handling composite: injected NULLs + UNKNOWN observables
# ---------------------------------------------------------------------------


@graded(
    "b7_null_3vl_composite",
    oracle="""
        WITH base AS (
            SELECT CASE WHEN event_type = 'error' THEN NULL
                        ELSE value END AS v,
                   CAST(json_extract_string(props, '$.absent') AS DOUBLE)
                       AS absent,
                   value
            FROM events
        )
        SELECT CASE WHEN v IS NULL THEN 'NULL'
                    WHEN v BETWEEN 50 AND 150 THEN 'MID'
                    ELSE 'EDGE' END AS bucket,
               count(*) AS n_rows,
               count(v) AS n_nonnull,
               CAST(coalesce(sum(CAST(round(v * 100) AS BIGINT)), 0)
                    AS BIGINT) AS sum_cents,
               CAST(sum(CASE WHEN (absent > 10) IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unknown
        FROM base GROUP BY 1
    """,
    section="B7,B3",
    description="IS NULL composite with a 3VL edge (VERDICT r09 #6): "
    "NULLs injected via CASE, bucketed by IS NULL/BETWEEN; count(*) vs "
    "null-skipping count(col), the all-NULL-group sum coalesced to 0 on "
    "both engines, and (absent > 10) IS NULL counting UNKNOWN rows "
    "explicitly — the JMS drop-on-unknown observable made into a column",
)
def b7_null_3vl_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure codegen pass over one scan + a 3-key hash aggregate; nothing
    here changes shape at 100 TB.  The point is semantic: every NULL
    pathway (injected value NULL, missing JSON property, UNKNOWN
    comparison) is forced through an aggregate an oracle can hash."""
    ev = load(spark, "events", sf_dir)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    absent = F.get_json_object("props", "$.absent").cast("double")
    base = ev.select(
        v.alias("v"),
        absent.alias("absent"),
    )
    bucket = (
        F.when(F.col("v").isNull(), F.lit("NULL"))
        .when(F.col("v").between(50, 150), F.lit("MID"))
        .otherwise(F.lit("EDGE"))
    )
    return (
        base.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_nonnull"),
            F.coalesce(
                F.sum(F.round(F.col("v") * 100).cast("long")), F.lit(0)
            ).alias("sum_cents"),
            F.sum(
                F.when((F.col("absent") > 10).isNull(), 1).otherwise(0)
            ).cast("long").alias("n_unknown"),
        )
    )


# ---------------------------------------------------------------------------
# B10 — second header-access query: multi-header composite
# ---------------------------------------------------------------------------

_HDR_COMPOSITE = Selector(
    "ts >= '2024-01-10 00:00:00' AND ts < '2024-02-01 00:00:00' "
    "AND event_id % 100 < 25 AND user_id BETWEEN 10 AND 5000"
)


@graded(
    "selector_header_composite",
    oracle=f"""
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events WHERE {_HDR_COMPOSITE.duckdb_sql()}
        GROUP BY 1
    """,
    section="B10,B1",
    description="second B10 entry: THREE header fields in one predicate "
    "(timestamp range with string->timestamp coercion, message-id modulo "
    "band, user-id BETWEEN), per-day aggregate — header access beyond "
    "the single-field selector_header_time",
)
def selector_header_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates push to the parquet scan (ts min/max prune
    row groups; the modulo survives as a codegen filter); one small
    per-day hash aggregate after.  Headers are typed columns, so at
    100 TB this is exactly a partition-pruned scan when the sink is
    date-partitioned."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.filter(_HDR_COMPOSITE.column())
        .groupBy(F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
    )
