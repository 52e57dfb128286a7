"""Fixture loaders — parquet in, normalized DataFrames out.

The ten driver-generated tables (TESTDATA.md, FIXTURES.md) are the engine's
batch inputs; ``events`` doubles as the message-stream analog (SURVEY.md
§1.2).  The loader owns the two type quirks so no query ever sees them:

1. ``events.ts`` has shipped as either parquet ``TIMESTAMP(NANOS)`` (reads
   as bigint epoch-nanos under the nanosAsLong conf; truncated to µs with
   exact integer division) or ``TIMESTAMP(MICROS)`` (reads as
   ``timestamp_ntz``; cast to ``TimestampType`` — value-preserving under the
   UTC session timezone).  The loader sniffs the physical type so every
   query downstream sees one canonical ``TimestampType`` µs column, matching
   the DuckDB oracle's ``epoch_us()`` semantics in both generations.
2. ``o_orderdate`` / ``l_shipdate`` arrive as ``timestamp_ntz`` and are left
   untouched (tz-naive on both engines — FIXTURES.md quirk 2).

At 100 TB these reads become partitioned scans over object storage; nothing
here collects to the driver, and the per-table normalization is a pure
column projection that fuses into the scan stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.session import configure

#: The ten fixture tables (TESTDATA.md; driver registers same-named DuckDB views).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Per-session memo of resolved table DataFrames (metadata only — the
#: unresolved relation: file listing + parquet footer schema).  Every
#: ``spark.read.parquet`` call re-lists and re-reads the footer on the
#: driver (~70–120 ms measured warm), which a query loading two tables
#: pays twice per run; a real engine resolves a table once per session
#: (guide §6 file-listing cache — this is its path-read equivalent).  NO
#: DATA is cached: the value is a lazy DataFrame definition, and every
#: action still scans the parquet.  WeakKeyDictionary drops the memo
#: with the session.
from weakref import WeakKeyDictionary

_RESOLVED: "WeakKeyDictionary[SparkSession, dict]" = WeakKeyDictionary()


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table with type normalization applied."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    memo = _RESOLVED.setdefault(spark, {})
    # resolve ONCE and read from the resolved path, so the memo key and
    # the path handed to spark.read can never disagree (a relative sf_dir
    # across a cwd change would otherwise alias two different reads under
    # one memo entry — ADVICE r14)
    resolved = os.path.abspath(sf_dir)
    key = (name, resolved)
    cached = memo.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{resolved}/{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType, TimestampType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # bigint epoch-nanos → µs (exact integer division) → TimestampType.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
            )
        elif not isinstance(ts_type, TimestampType):
            # timestamp_ntz (µs parquet) → TimestampType; UTC session tz makes
            # this a pure type relabel, no wall-clock shift.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    memo[key] = df
    return df


def invalidate_load_memo(spark: SparkSession | None = None) -> None:
    """Drop :func:`load`'s per-session metadata memo (one session, or all
    when ``spark`` is None).  Needed only when fixture files at an
    already-loaded path are REWRITTEN mid-session — the memoized frame
    pins the file listing of the first read (ADVICE r14)."""
    if spark is None:
        _RESOLVED.clear()
    else:
        _RESOLVED.pop(spark, None)


def widen(df: DataFrame, key: str | None = None) -> DataFrame:
    """Round a narrow scan up to cluster width (guide §2.5).

    The fixture parquet files are single-row-group, so a scan is ONE
    effective task no matter the split config — serializing any heavy
    per-row work (tokenization, n-gram explode, quantization) that fuses
    into the scan stage.  Repartitioning right after the read is the
    guide's remedy for unsplittable inputs; the partition-count guard
    makes it a NO-OP whenever the scan already arrives at or above
    ``defaultParallelism`` (any real at-scale read), so this never adds a
    shuffle where the input is wide.  Use on paths whose per-row compute
    dwarfs one extra exchange of the (narrow) input — not on plain
    scan→aggregate queries, where the map-side combine is cheaper than a
    raw-row shuffle.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    # Trigger floor (ADVICE r14): only a scan narrower than
    # min(defaultParallelism, floor) is widened, so on a large cluster a
    # legitimately-parallel scan that is merely below core count (e.g.
    # 500 partitions under 2000 cores) is NOT hit with a full raw-row
    # shuffle — only genuinely narrow (few-file / unsplittable) reads
    # are.  Locally (floor 16 < 32 cores) single-row-group fixture scans
    # at 1–3 partitions still widen to cluster width, unchanged.  NOTE:
    # the decision is plan-build-time from the scan's partition count, so
    # plan snapshots are parallelism-dependent (see tools/plan_snapshot).
    floor = int(spark.conf.get("spark.pmf.widen.floor", "16"))
    if df.rdd.getNumPartitions() >= min(par, floor):
        return df
    return df.repartition(par, key) if key else df.repartition(par)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table; keys match the DuckDB oracle view names."""
    return {name: load(spark, name, sf_dir) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so ``spark.sql`` queries mirror the
    oracle's view names exactly."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Multi-format ingestion (A-surface breadth: CSV / JSON-lines / ORC)
# ---------------------------------------------------------------------------


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatched batch reader with the engine's ingestion defaults.

    The operational rules encoded here (they matter at 100 TB, where a
    malformed row must not kill a 10-hour job, and schema inference over
    object storage is an extra full pass):

    * ``schema`` should be passed explicitly for text formats — inference
      costs one complete read of the data before the real one, and silently
      widens types on dirty data.  Parquet/ORC carry their own schema.
    * CSV/JSON read in ``PERMISSIVE`` mode with a ``_corrupt_record``
      column, so malformed rows are routed (the DLQ pattern, B13/A6)
      instead of thrown.
    * CSV defaults: header, RFC-4180 quoting.  JSON is JSON-lines (one
      object per line — the only splittable JSON layout).
    """
    fmt = fmt.lower()
    if fmt not in ("parquet", "orc", "csv", "json"):
        raise ValueError(f"unsupported format {fmt!r}")
    configure(spark)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
        if fmt == "csv":
            reader = reader.option("header", "true")
        if schema is None and fmt == "csv":
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        # text formats get the corrupt-record column appended so PERMISSIVE
        # mode has somewhere to park malformed rows
        from pyspark.sql.types import StringType, StructType

        if fmt in ("csv", "json") and isinstance(schema, StructType):
            if "_corrupt_record" not in schema.fieldNames():
                schema = schema.add("_corrupt_record", StringType())
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE-mode read into (clean, corrupt) frames — the batch
    twin of streaming verdict routing (A6): corrupt rows keep only the raw
    record for the reject sink, clean rows drop the bookkeeping column.

    The input is persisted first: Spark disallows queries whose referenced
    columns are only the internal corrupt-record column on a *raw* text
    scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    split reads the frame twice anyway.  At scale, prefer routing both
    verdicts in ONE pass (``foreachBatch`` + partitioned write, the B13
    shape) over this two-pass convenience."""
    if "_corrupt_record" not in df.columns:
        return df, df.limit(0).select(F.lit(None).cast("string").alias("_corrupt_record"))
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return clean, corrupt
