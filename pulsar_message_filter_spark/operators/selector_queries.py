"""B-series graded queries — the message-selector surface (SURVEY.md §2.B).

Every query here filters the ``events`` table (the message-stream analog:
``props`` is the JSON string→value properties map, ``ts``/``event_type``/
``user_id`` are the header fields) through a compiled :class:`Selector`.
The oracle predicate is rendered from the *same AST* by the DuckDB backend,
so Spark/oracle parity is by construction — the differential-test idea from
SURVEY §5.3.2 baked into the registry.

Scale note: a selector compiles to ordinary Catalyst expressions, so
predicate pushdown and column pruning reach the parquet scan untouched; at
100 TB the filter runs inside the scan stage with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.filtering import fan_out, with_verdict
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.selector import Schema, Selector

#: Output projection for plain filter queries: stable columns, no raw
#: timestamps (precision-parity — SURVEY §7.4.1), no recomputed floats.
_PROJ = ("event_id", "user_id", "event_type", "value")
_PROJ_SQL = ", ".join(_PROJ)


def _events_filter_query(selector: Selector):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load(spark, "events", sf_dir).filter(selector.column()).select(*_PROJ)

    return fn


def _register_selector(name: str, text: str, section: str, description: str,
                       params: dict | None = None) -> Selector:
    sel = Selector(text, params=params)
    graded(
        name,
        oracle=f"SELECT {_PROJ_SQL} FROM events WHERE {sel.duckdb_sql()}",
        section=section,
        description=description,
    )(_events_filter_query(sel))
    return sel


# --- B1/B2: comparisons + arithmetic ---------------------------------------
_register_selector(
    "selector_comparison_arith",
    "value * (1 - 0.1) >= 90 AND user_id % 3 = 0 AND event_type <> 'view'",
    section="B1,B2",
    description="comparison ops + arithmetic in predicate position",
)

# --- B3/B7: three-valued logic + IS NULL ------------------------------------
# props has exactly key 'k'; 'absent' extracts NULL → UNKNOWN comparisons.
# UNKNOWN OR TRUE = TRUE keeps high-value rows; UNKNOWN alone drops the row —
# the JMS drop-on-unknown rule, identical in Spark and DuckDB ANSI 3VL.
_register_selector(
    "selector_3vl_null",
    "(props.absent > 10 OR value > 150) AND props.absent IS NULL AND props.k IS NOT NULL",
    section="B3,B7",
    description="3-valued logic with UNKNOWN from a missing property; IS [NOT] NULL",
)

# --- B4: BETWEEN -------------------------------------------------------------
_register_selector(
    "selector_between",
    "value BETWEEN 50 AND 60 AND user_id NOT BETWEEN 2 AND 5",
    section="B4",
    description="[NOT] BETWEEN inclusive range",
)

# --- B5: IN ------------------------------------------------------------------
_register_selector(
    "selector_in",
    "event_type IN ('click', 'view') AND user_id NOT IN (1, 2, 3)",
    section="B5",
    description="[NOT] IN set membership, string and numeric lists",
)

# --- B6: LIKE ----------------------------------------------------------------
_register_selector(
    "selector_like",
    "event_type LIKE 'p%' OR event_type LIKE '%rror' OR event_type NOT LIKE '_____'",
    section="B6",
    description="LIKE with % and _ wildcards, NOT LIKE",
)

# --- B8: regex match (engine extension) --------------------------------------
_register_selector(
    "selector_regex",
    "event_type REGEXP '^(p|s)' AND value >= 100",
    section="B8",
    description="regex match extension beyond JMS",
)

# --- B9/B11: property access + type coercion ---------------------------------
# props.k is a JSON-extracted string; numeric comparison coerces it to double
# (try-cast), string comparison keeps it a string — JMS context coercion.
_register_selector(
    "selector_props_coercion",
    "props.k >= 90 OR props.k = '7'",
    section="B9,B11",
    description="JSON property access with numeric coercion and string equality",
)

# --- B10: header fields (event time) -----------------------------------------
_register_selector(
    "selector_header_time",
    "ts >= '2024-01-15 00:00:00' AND ts < '2024-01-22 00:00:00' AND event_type = 'click'",
    section="B10",
    description="header-field predicate on event time (string→timestamp coercion)",
)

# --- B15: subscription-property parameterization ------------------------------
_register_selector(
    "selector_params",
    "value > ${threshold} AND event_type = ${kind}",
    section="B15",
    description="${param} placeholders bound from subscription properties at compile",
    params={"threshold": 120, "kind": "purchase"},
)

# --- B6 (ESCAPE) + schema generality: selectors over other tables -------------
# The selector compiler is schema-parameterized (B12): the same grammar
# filters any table.  ESCAPE translates to an anchored regex on the Spark
# side (no native Column LIKE...ESCAPE) and native LIKE...ESCAPE in the
# oracle — semantics proven equal by the row set.

PART_SCHEMA = Schema(
    columns={
        "p_partkey": "long",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "long",
        "p_retailprice": "double",
    },
    props_col=None,
)

_ESCAPE_SEL = Selector(
    "p_name NOT LIKE '%!_%' ESCAPE '!' AND p_name LIKE '%old%' AND p_size BETWEEN 10 AND 40",
    schema=PART_SCHEMA,
)


@graded(
    "selector_like_escape",
    oracle=f"SELECT p_partkey, p_name, p_size FROM part WHERE {_ESCAPE_SEL.duckdb_sql()}",
    section="B6,B12",
    description="LIKE ... ESCAPE with escaped wildcard + selector over a "
    "non-events schema (compiler schema generality)",
)
def selector_like_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "part", sf_dir)
        .filter(_ESCAPE_SEL.column())
        .select("p_partkey", "p_name", "p_size")
    )


DOCS_SCHEMA = Schema(
    columns={
        "doc_id": "long",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "long",
    },
    props_col=None,
)

_DOCS_SEL = Selector(
    "lang IN ('en', 'de') AND n_chars > 200 AND text LIKE '%data%'",
    schema=DOCS_SCHEMA,
)


@graded(
    "selector_documents",
    oracle=f"SELECT doc_id, lang, n_chars FROM documents WHERE {_DOCS_SEL.duckdb_sql()}",
    section="B12,B5,B6",
    description="message-selector grammar applied to the document corpus "
    "(subscription-style filtered view over any table)",
)
def selector_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "documents", sf_dir)
        .filter(_DOCS_SEL.column())
        .select("doc_id", "lang", "n_chars")
    )


# --- B12 + E1: the flagship — selector + tumbling window -----------------------
FLAGSHIP_SELECTOR = Selector("props.k > 50 AND event_type IN ('purchase', 'error')")


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.1 minimum slice: subscription selector over the event stream,
    1-hour tumbling window per event type.  In production this identical
    expression runs under ``readStream`` (unified batch/streaming model)."""
    events = load(spark, "events", sf_dir)
    return (
        events.filter(FLAGSHIP_SELECTOR.column())
        .groupBy(
            F.window("ts", "1 hour").start.alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            # exact cents → one double division: bit-identical to the oracle
            ((F.col("value_cents") / F.col("n_events")) / 100).alias("avg_value"),
        )
    )


graded(
    "selector_flagship_window",
    oracle=f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n_events,
               (sum({cents_sql('value')}) / count(*)) / 100 AS avg_value
        FROM events
        WHERE {FLAGSHIP_SELECTOR.duckdb_sql()}
        GROUP BY 1, 2
    """,
    section="B12,B3,B5,B9,B11,E1",
    description="flagship: compiled selector + tumbling 1h window aggregation",
)(flagship)


# --- B13: verdict routing -----------------------------------------------------
_ACCEPT = Selector("props.k > 50 AND event_type IN ('purchase', 'error')")
_RESCHED = Selector("value >= 150")


@graded(
    "selector_verdict_routing",
    oracle=f"""
        SELECT CASE WHEN {_ACCEPT.duckdb_sql()} THEN 'ACCEPT'
                    WHEN {_RESCHED.duckdb_sql()} THEN 'RESCHEDULE'
                    ELSE 'REJECT' END AS verdict,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1
    """,
    section="B13",
    description="ACCEPT/REJECT/RESCHEDULE verdict per message (PIP-105 FilterResult)",
)
def verdict_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    return (
        with_verdict(events, _ACCEPT, _RESCHED)
        .groupBy("verdict")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --- B14: per-subscription fan-out ---------------------------------------------
_SUBSCRIPTIONS = {
    "purchases": Selector("event_type = 'purchase'"),
    "big_values": Selector("value > 150"),
    "key_band": Selector("props.k BETWEEN 40 AND 60"),
}


@graded(
    "selector_fanout",
    oracle=f"""
        SELECT count(*) AS n_messages,
               CAST(sum(CASE WHEN {_SUBSCRIPTIONS['purchases'].duckdb_sql()} THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(sum(CASE WHEN {_SUBSCRIPTIONS['big_values'].duckdb_sql()} THEN 1 ELSE 0 END) AS BIGINT) AS n_big_values,
               CAST(sum(CASE WHEN {_SUBSCRIPTIONS['key_band'].duckdb_sql()} THEN 1 ELSE 0 END) AS BIGINT) AS n_key_band
        FROM events
    """,
    section="B14",
    description="N subscriptions evaluated in one scan (shared parse, per-sub booleans)",
)
def subscription_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    tagged = fan_out(events, _SUBSCRIPTIONS)
    return tagged.agg(
        F.count("*").alias("n_messages"),
        F.sum(F.col("sub_purchases").cast("int")).alias("n_purchases"),
        F.sum(F.col("sub_big_values").cast("int")).alias("n_big_values"),
        F.sum(F.col("sub_key_band").cast("int")).alias("n_key_band"),
    )
