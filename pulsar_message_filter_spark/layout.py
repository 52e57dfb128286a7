"""Data-layout operators — the write-side half of the 100 TB story.

Query speed at scale is mostly decided *before* the query runs, by how
the data was written:

* :func:`write_range_partitioned` — range-partition + sort-within on a
  filter column so every parquet file covers a narrow, disjoint value
  band.  Scans with a predicate on that column then skip whole files on
  footer min/max stats (row-group pruning) — the poor-man's z-order for
  the single-column case, pure built-in Spark.
* :func:`write_bucketed` / :func:`bucketed_join` — persist both sides of
  a repeated join bucketed by the join key; Spark then hash-joins
  bucket-to-bucket with NO shuffle exchange on either side.  This is the
  canonical layout for a fact table joined on the same key every day.
* :func:`file_value_bounds` — read back per-file min/max from the
  parquet footers (pyarrow) to *prove* the skipping contract instead of
  asserting it by faith; used by the layout tests.

Everything here is plain ``DataFrameWriter`` configuration — the point
is codifying the layout contracts and making them testable, not wrapping
Spark.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_range_partitioned(
    df: DataFrame,
    path: str,
    order_col: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` so parquet files tile ``order_col`` into disjoint bands.

    ``repartitionByRange`` samples range bounds and shuffles once;
    ``sortWithinPartitions`` makes every row group internally ordered, so
    both file-level AND row-group-level min/max pruning bite.  At 100 TB
    pick ``n_files`` from the target file size (~128-512 MiB each), not a
    constant.
    """
    (
        df.repartitionByRange(n_files, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_value_bounds(path: str, column: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) for ``column`` straight from parquet
    footers — zero data pages read, exactly what a scan's file-skipping
    decision sees."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == column
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Bucketing pre-applies the join/agg hash partitioning at write time;
    every later join or aggregation on ``bucket_col`` between tables with
    the same bucket count reads co-located buckets and skips the shuffle
    entirely (see :func:`bucketed_join` and the no-Exchange plan test).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), on)


def zorder_value(col_a, col_b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into a
    single Morton (z-order) key — pure Column algebra, no UDF.

    Sorting/range-partitioning by the z-value clusters rows that are close
    in BOTH dimensions into the same files, so min/max footer stats prune
    scans filtered on *either* column (the multi-dimensional upgrade of
    :func:`write_range_partitioned`'s single-column sort).  ``bits=16``
    covers keys up to 65k after range-rank normalization; widen for raw
    keys.  Cost: one fixed expression tree of shifts/masks per row —
    whole-stage-codegen keeps it in the scan stage.
    """
    from pyspark.sql import functions as F

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the z-order of two filter columns."""
    z = zorder_value(col_a, col_b, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value(col_a, col_b, bits: int = 16):
    """Map two non-negative int columns onto the Hilbert space-filling
    curve (distance along the order-``bits`` curve) — pure Column
    algebra, no UDF.

    Same write-side contract as :func:`zorder_value` (sort by the key →
    footer min/max stats prune scans on either dimension), but with
    strictly better locality: consecutive curve positions are always
    Manhattan-distance-1 neighbors, where Morton order takes long
    diagonal jumps at power-of-two boundaries — so Hilbert files cover
    tighter value bands on both columns at the same file count
    (measured in the layout ladder; [Moon et al. 2001, "Analysis of the
    clustering properties of the Hilbert space-filling curve"]).

    The per-bit quadrant rotation is cross-iteration STATE, so unrolling
    it as nested CASE expressions would grow the tree ~4^bits; instead
    the loop runs at execution time via ``F.aggregate`` over the
    descending bit-weight array with a (x, y, d) struct accumulator —
    constant plan size at any ``bits``.
    """
    from pyspark.sql import functions as F

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b

    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(bits - 1, -1, -1)])
    init = F.struct(
        a.cast("long").alias("x"),
        b.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        x, y, d = acc.getField("x"), acc.getField("y"), acc.getField("d")
        rx = F.when(x.bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        ry = F.when(y.bitwiseAND(s) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        # quadrant rotate/flip (the rotation state Morton order lacks):
        # ry=0 → swap x/y, first flipping both within the s-quadrant if rx=1
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        fx = F.when(flip, s - 1 - x).otherwise(x)
        fy = F.when(flip, s - 1 - y).otherwise(y)
        nx = F.when(swap, fy).otherwise(fx)
        ny = F.when(swap, fx).otherwise(fy)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(weights, init, step).getField("d")


def write_hilbert(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Hilbert curve over two filter
    columns — :func:`write_zordered`'s twin with the better-locality
    key."""
    h = hilbert_value(col_a, col_b, bits).alias("__h")
    (
        df.withColumn("__h", h)
        .repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning (F14, round 10)
# ---------------------------------------------------------------------------


def plan_compaction(files: Sequence[tuple[str, int]], target_bytes: int):
    """First-fit-decreasing bin packing of data files into compaction
    groups of ~``target_bytes`` each — the planning half of the
    small-file problem (the executing half is ``coalesce``/rewrite per
    group, embarrassingly parallel across groups).

    Planning is DRIVER-SIDE ON PURPOSE: the input is file *metadata*
    (one row per file — thousands of rows for a 100 TB table, not data
    rows), the same scale at which Spark's own AQE coalescing and table
    formats' compaction services plan.  FFD is deterministic (ties break
    on path) and guarantees every bin but possibly the last-filled ones
    is > target/2 full, with no bin over target unless a single file
    alone exceeds it (that file gets its own bin, flagged oversized).

    Returns ``[(bin_id, path, bytes)]`` sorted by (bin_id, -bytes, path).
    """
    order = sorted(files, key=lambda f: (-f[1], f[0]))
    bins: list[int] = []  # remaining capacity per bin
    out = []
    for path, size in order:
        placed = None
        for b, rem in enumerate(bins):
            if size <= rem:
                placed = b
                break
        if placed is None:
            placed = len(bins)
            bins.append(target_bytes)
        bins[placed] -= min(size, target_bytes)
        out.append((placed, path, size))
    out.sort(key=lambda r: (r[0], -r[2], r[1]))
    return out


def compaction_report(
    spark: SparkSession, glob_path: str, target_bytes: int
) -> DataFrame:
    """Per-bin compaction summary for the files matching ``glob_path``:
    bin_id, n_files, total_bytes, fill fraction, oversized flag.  File
    listing comes from the ``binaryFile`` source's metadata columns
    (content is never read: the projection keeps only path + length)."""
    from pyspark.sql import functions as F

    meta = (
        spark.read.format("binaryFile")
        .load(glob_path)
        .select("path", "length")
        .collect()
    )
    plan = plan_compaction(
        [(r["path"].rsplit("/", 1)[-1], r["length"]) for r in meta], target_bytes
    )
    pdf = spark.createDataFrame(plan, "bin_id long, path string, bytes long")
    return (
        pdf.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").alias("total_bytes"),
            F.round(F.sum("bytes") / F.lit(float(target_bytes)), 4).alias("fill"),
            (F.max("bytes") > target_bytes).alias("oversized"),
        )
        .orderBy("bin_id")
    )


def execute_compaction(
    spark: SparkSession, glob_path: str, out_dir: str, target_bytes: int
):
    """Execute a compaction plan: rewrite the input files into one output
    file per bin (``bin_id=N`` directories, one part file each).

    The plan (driver-side FFD over metadata) maps every input file to a
    bin; execution tags each ROW with its file's bin via a broadcast
    ``input_file_name() -> bin_id`` lookup, repartitions on bin_id (the
    only shuffle, sized by the plan so every output file lands near
    ``target_bytes``), and writes with ``partitionBy`` — per-bin rewrite
    work is independent, so a 100 TB compaction parallelizes across bins
    and stragglers are bounded by the target size.  Returns the plan
    DataFrame ``(bin_id, path, bytes)`` for verification.
    """
    from pyspark.sql import functions as F

    meta = (
        spark.read.format("binaryFile")
        .load(glob_path)
        .select("path", "length")
        .collect()
    )
    plan = plan_compaction([(r["path"], r["length"]) for r in meta], target_bytes)
    lookup = spark.createDataFrame(plan, "bin_id long, path string, bytes long")
    # binaryFile paths and input_file_name() render the file: scheme
    # differently — join on the basename (part-file names carry a UUID,
    # so they are unique within any one table directory)
    base = lambda c: F.substring_index(c, "/", -1)  # noqa: E731
    data = spark.read.parquet(glob_path).withColumn(
        "__file", base(F.input_file_name())
    )
    joined = data.join(
        F.broadcast(lookup.select("bin_id", base(F.col("path")).alias("__file"))),
        "__file",
    )
    (
        joined
        .drop("__file")
        .repartition("bin_id")
        .write.mode("overwrite")
        .partitionBy("bin_id")
        .parquet(out_dir)
    )
    return lookup
