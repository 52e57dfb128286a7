"""Graded surface for multi-format ingestion with corrupt-row routing.

``io.read_any`` / ``io.split_corrupt`` implement the A-surface rules
(PERMISSIVE text reads, `_corrupt_record` DLQ routing, explicit schemas);
this module puts them on the graded surface: the query materializes a
deterministic CSV corpus — with every ``doc_id % 11 == 0`` line malformed
(non-numeric id, so the declared LongType conversion fails) — reads it
back PERMISSIVE, routes, and reports exact clean/corrupt counts.

Rows-only by design: CSV error recovery is parser-specific (DuckDB's
``ignore_errors`` recovers a different row subset than Spark's PERMISSIVE
mode on the same bytes), so no cross-engine oracle exists for the corrupt
partition — the pytest asserts the exact expected counts instead (we
control exactly which lines are malformed).

Scale notes: the CSV write/read here is fixture plumbing; the graded
shape — schema-first PERMISSIVE scan, one-pass verdict split, per-source
aggregation — is exactly the 100 TB ingest front door (A6/B13's DLQ
pattern applied to the batch perimeter).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pulsar_message_filter_spark.io import load, read_any, split_corrupt
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.tmpdirs import run_scoped_dir

_CSV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_fixture_csv(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic headerless CSV with doc_id%11 lines malformed.

    The malformed lines are produced ON THE EXECUTORS: the line text is a
    Column expression (``format_string`` with an ``id-`` prefix for the
    corrupt subset — non-numeric id, so the declared LongType conversion
    fails and PERMISSIVE parks the raw line in ``_corrupt_record``) and the
    directory is written with Spark's text writer.  Nothing is collected to
    the driver except a one-row (count, max_id) fingerprint used as the
    cache key, so the fixture build itself scales with the corpus.

    Written once per (sf_dir, fingerprint) under the system temp dir; a
    regenerated testdata set never reuses a stale fixture directory."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "source", "lang")
    # bounded O(1) collect: corpus fingerprint for the fixture cache key
    n_docs, max_id = docs.agg(F.count("*"), F.max("doc_id")).first()
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = run_scoped_dir(f"pmf_ingest_{tag}_{n_docs}_{max_id}_csvdir")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    line = F.format_string(
        "%s,%s,%s",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("id-"), F.col("doc_id").cast("string")),
        ).otherwise(F.col("doc_id").cast("string")),
        F.coalesce(F.col("source"), F.lit("")),
        F.coalesce(F.col("lang"), F.lit("")),
    )
    docs.select(line.alias("value")).write.mode("overwrite").text(path)
    return path


@graded(
    "a_ingest_corrupt_routing",
    oracle=None,  # CSV error recovery is parser-specific -> rows-only
    section="A8,A6,B13",
    description="multi-format ingestion front door: schema-first PERMISSIVE "
    "CSV read with _corrupt_record DLQ routing (doc_id%11 lines malformed "
    "by construction), exact clean/corrupt counts per source; rows-only "
    "because CSV error recovery differs per parser (pytest pins counts)",
)
def a_ingest_corrupt_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _write_fixture_csv(spark, sf_dir)
    raw = read_any(spark, path, "csv", schema=_CSV_SCHEMA, header="false")
    clean, corrupt = split_corrupt(raw)
    per_source = clean.groupBy("source").agg(F.count("*").alias("n_clean"))
    totals = per_source.agg(
        F.sum("n_clean").alias("n_clean_total"),
        F.count("*").alias("n_sources"),
    )
    # corrupt count as a 1-row aggregate subtree in the same plan — one
    # action instead of a driver count + lit (guide §1.2/§2.4)
    n_corrupt = corrupt.agg(
        F.count("*").cast("long").alias("n_corrupt_total")
    )
    return totals.select("n_clean_total", "n_sources").crossJoin(n_corrupt)


@graded(
    "a_schema_evolution_read",
    oracle="""
        WITH evolved AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 3 = 0 THEN source END AS source,
                   n_chars,
                   CASE WHEN doc_id % 3 = 0 THEN n_chars / 100.0 END
                       AS quality_score
            FROM documents
        )
        SELECT lang,
               count(*) AS n_rows,
               count(source) AS n_with_source,
               count(quality_score) AS n_scored,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(quality_score) AS min_quality,
               max(quality_score) AS max_quality
        FROM evolved GROUP BY 1
    """,
    section="A1,A2,C11",
    description="schema-evolution read: two parquet generations (the old "
    "writer lacks source/quality_score) merge-read with mergeSchema=true; "
    "missing columns surface as NULLs; oracle recomputes the evolved "
    "union relationally (hash-exact)",
)
def a_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB reality this pins: a long-lived dataset's early files
    lack columns added later, and every reader must see ONE union schema
    with NULLs for pre-evolution rows (Spark ``mergeSchema``; the DuckDB
    twin of the same layout is ``union_by_name``).  The Spark side builds
    the two-generation layout for real — writes gen-1 without the new
    columns, gen-2 with them — and answers from the merged scan; only the
    EXPECTED result is recomputed relationally in the oracle.  Fixture
    build is a plan-time side job (off bench HEADLINE)."""
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    # Run-scoped per-sf fixture dir (not mkdtemp, not a fixed /tmp name):
    # repeated runs in one process overwrite in place instead of leaking a
    # fresh dir each time, while concurrent processes cannot race (ADVICE
    # r08).
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = run_scoped_dir(f"pmf_schema_evo_{tag}")
    gen1 = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "lang", "n_chars")
    gen2 = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "quality_score", F.col("n_chars") / 100.0
    )
    p1, p2 = os.path.join(root, "gen=1"), os.path.join(root, "gen=2")
    gen1.write.mode("overwrite").parquet(p1)
    gen2.write.mode("overwrite").parquet(p2)
    evolved = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    return evolved.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count("source").alias("n_with_source"),
        F.count("quality_score").alias("n_scored"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
    )


# ---------------------------------------------------------------------------
# Chunked-message reassembly — the consumer-side twin of the broker's
# large-message chunking feature (public Pulsar client semantics: a
# producer splits an oversized payload into totalChunks parts sharing one
# uuid; the consumer buffers by uuid and reassembles in chunk-id order,
# discarding incomplete groups when a chunk is lost or expires).
# ---------------------------------------------------------------------------

_TOTAL_CHUNKS = 4


@graded(
    "chunk_reassembly",
    oracle=f"""
        WITH chunks AS (
            SELECT doc_id,
                   unnest([1, 2, 3, 4]) AS idx,
                   text,
                   (length(text) + 3) // {_TOTAL_CHUNKS} AS c
            FROM documents
        ),
        parts AS (
            SELECT doc_id, idx,
                   substr(text, 1 + (idx - 1) * c, c) AS part
            FROM chunks
        ),
        survived AS (
            SELECT * FROM parts
            WHERE NOT (doc_id % 17 = 3 AND idx = 2)
        ),
        reasm AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seen,
                   string_agg(part, '' ORDER BY idx) AS payload
            FROM survived GROUP BY 1
        )
        SELECT r.doc_id, r.n_seen,
               r.n_seen = {_TOTAL_CHUNKS} AS is_complete,
               r.payload = d.text AS intact
        FROM reasm r JOIN documents d USING (doc_id)
    """,
    section="A8,B13,C15,F14",
    description="chunked-message reassembly (Pulsar large-message "
    "chunking, consumer side): deterministic 4-way payload split with a "
    "deterministic lost-chunk rule, uuid-grouped in-order reassembly via "
    "sorted collect, per-message completeness AND byte-intactness flags "
    "inside the hash grade",
)
def chunk_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reassemble chunked payloads and audit completeness.

    Spark shape: ONE corpus scan → a 4-row-per-message chunk explode
    (the fixture stand-in for a chunked topic) → the lost-chunk filter →
    a single uuid-keyed aggregation whose sorted-struct collect rebuilds
    the payload in chunk order (C15 sorted-collect discipline; chunk
    groups are bounded at totalChunks rows, so per-key state is O(1)) →
    broadcast-scale join back to the original payload for the
    intactness check.  At 100 TB the groupBy key (uuid) is
    hash-partitioned and each group holds ≤ totalChunks parts — no
    skew, no unbounded state; incomplete groups surface as
    ``is_complete = false`` (the DLQ routing decision) instead of
    silently vanishing.

    ``intact`` and ``is_complete`` are deliberately INDEPENDENT columns:
    a lost chunk that happened to be empty (payload shorter than one
    chunk stride) reassembles byte-identical while still incomplete.
    The fixture corpus never hits that corner (every lost chunk is
    non-empty, so incomplete ⇒ non-intact there — both engines agree in
    the hash grade); the corner itself is pinned synthetically in
    tests/test_ingestion_chunks.py."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    chunks = (
        docs.withColumn(
            "c", F.expr(f"(length(text) + 3) div {_TOTAL_CHUNKS}")
        )
        .select(
            "doc_id",
            "text",
            "c",
            F.explode(F.expr(f"sequence(1, {_TOTAL_CHUNKS})")).alias("idx"),
        )
        .select(
            "doc_id",
            "idx",
            F.expr("substring(text, 1 + (idx - 1) * c, c)").alias("part"),
        )
    )
    survived = chunks.filter(
        ~((F.col("doc_id") % 17 == 3) & (F.col("idx") == 2))
    )
    reasm = survived.groupBy("doc_id").agg(
        F.count("*").alias("n_seen"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "part"))),
                lambda x: x.part,
            ),
        ).alias("payload"),
    )
    return reasm.join(docs, "doc_id").select(
        "doc_id",
        "n_seen",
        (F.col("n_seen") == _TOTAL_CHUNKS).alias("is_complete"),
        (F.col("payload") == F.col("text")).alias("intact"),
    )
