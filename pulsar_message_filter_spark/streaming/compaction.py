"""Small-file compaction for (streaming) parquet sink directories.

Structured-Streaming parquet sinks write at least one file per micro-batch
per partition; at a trigger interval of seconds, a day of output is tens of
thousands of KB-scale files, and at 100 TB scale the NameNode/listing cost
and per-file open overhead dominate downstream scans.  The standard
companion job is a periodic repartition-and-rewrite to ~target-size files —
this module is that job.

Contract (the safe operating envelope):

* run when no writer is active on the directory (between streaming runs, or
  on a rolled-over directory).  The source stream's exactly-once bookkeeping
  lives in its *checkpoint*, not the sink dir, so compaction never disturbs
  consumption offsets.
* a streaming sink's ``_spark_metadata`` transaction log is dropped: after
  compaction the directory is a plain batch-readable parquet dir (the log
  indexes only the pre-compaction files, so keeping it would make readers
  look for data files that no longer exist).
* the rewrite goes to a temp sibling directory and is swapped in with two
  renames — on HDFS-like filesystems each rename is atomic, but the *pair*
  is not: between them the target directory does not exist, so a concurrent
  reader can see a transient listing failure.  The safe envelope therefore
  excludes concurrent readers as well as writers during the swap window
  (microseconds on HDFS); on object stores (no atomic dir rename) point
  readers at the returned path instead of relying on the swap.
* the swap is self-healing: a crash between the two renames parks the
  original data in ``<path>__compact_old`` with ``<path>`` missing; the next
  :func:`compact_parquet` run detects that state and restores the original
  directory before doing anything else (see ``_recover_interrupted_swap``).

Reference parity note: the snapshot at /root/reference contains only
README.md:1 (project title); this is a standard companion utility for the
Structured-Streaming sink layer (SURVEY.md §2.A2/E9), not ported code.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    """Hadoop FileSystem handle + Path for any supported scheme (public
    Hadoop API via the py4j gateway — works for file://, hdfs://, s3a://)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def sink_file_stats(spark: SparkSession, path: str) -> dict:
    """Data-file count and total bytes of a parquet directory (recursive,
    skipping hidden/metadata entries — ``_spark_metadata``, ``_SUCCESS``)."""
    fs, hpath = _fs_and_path(spark, path)
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        parent = st.getPath().getParent().getName()
        if name.startswith(("_", ".")) or parent == "_spark_metadata":
            continue
        n_files += 1
        total += st.getLen()
    return {"n_files": n_files, "total_bytes": total}


def _recover_interrupted_swap(spark: SparkSession, path: str) -> bool:
    """Heal a crash between the two swap renames: if ``<path>`` is missing
    but ``<path>__compact_old`` (the original data, moved aside) exists,
    rename it back.  The compacted rewrite in ``__compact_tmp`` is discarded
    — it is a pure rewrite of the same rows, so restoring the original is
    always safe and the next run simply compacts again.  Returns True if a
    recovery was performed."""
    fs, hpath = _fs_and_path(spark, path)
    _, hold = _fs_and_path(spark, path.rstrip("/") + "__compact_old")
    if fs.exists(hold) and not fs.exists(hpath):
        if not fs.rename(hold, hpath):
            raise IOError(f"compaction recovery failed: could not restore {path}")
        return True
    return False


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 8,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    No-op (``compacted=False``) when the directory already has fewer than
    ``min_files_to_compact`` files or is already at/below the target file
    count.  Returns a stats dict either way::

        {"compacted": bool, "files_before": int, "files_after": int,
         "total_bytes": int, "path": str}

    The rewrite preserves rows exactly (one ``spark.read.parquet`` →
    ``repartition(n)`` → write cycle; no row-level transformation), and the
    swap keeps the directory name stable for downstream readers.
    """
    _recover_interrupted_swap(spark, path)
    before = sink_file_stats(spark, path)
    n_target = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    if before["n_files"] < min_files_to_compact or before["n_files"] <= n_target:
        return {
            "compacted": False,
            "files_before": before["n_files"],
            "files_after": before["n_files"],
            "total_bytes": before["total_bytes"],
            "path": path,
        }

    fs, hpath = _fs_and_path(spark, path)
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    _, htmp = _fs_and_path(spark, tmp)
    _, hold = _fs_and_path(spark, old)
    for stale in (htmp, hold):
        if fs.exists(stale):
            fs.delete(stale, True)

    # NB: when _spark_metadata exists, spark.read.parquet reads through the
    # sink's transaction log — i.e. the exactly-once committed file set, so
    # orphan files from failed batches are correctly NOT carried over; the
    # compacted dir has no log and is read by plain listing thereafter
    df = spark.read.parquet(path)
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)

    if not fs.rename(hpath, hold):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(htmp, hpath):
        # roll back so the directory never disappears
        fs.rename(hold, hpath)
        raise IOError(f"compaction swap failed: could not move {tmp} into place")
    fs.delete(hold, True)

    after = sink_file_stats(spark, path)
    return {
        "compacted": True,
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "total_bytes": after["total_bytes"],
        "path": path,
    }


def compact_if_needed(
    spark: SparkSession,
    path: str,
    max_files: int = 64,
    max_avg_file_bytes: int = 32 << 20,
    target_file_bytes: int = 128 << 20,
) -> dict:
    """The scheduling policy around :func:`compact_parquet`: compact only
    when the directory has drifted into small-file territory.

    Trigger = *both* conditions hold: more than ``max_files`` data files AND
    mean file size below ``max_avg_file_bytes``.  A directory of many
    big files is healthy (a large dataset), and a directory of few small
    files is cheap to scan — only many-and-small pays the rewrite.

    This is the loop body for a periodic companion job next to a streaming
    sink (run it between micro-batch groups, or from a scheduler while no
    writer is active — same safe envelope as :func:`compact_parquet`)::

        while True:
            compact_if_needed(spark, sink_dir)
            time.sleep(900)

    Returns the :func:`compact_parquet` stats dict, extended with
    ``{"triggered": bool, "avg_file_bytes": int}``.
    """
    _recover_interrupted_swap(spark, path)
    stats = sink_file_stats(spark, path)
    avg = stats["total_bytes"] // stats["n_files"] if stats["n_files"] else 0
    if stats["n_files"] <= max_files or avg >= max_avg_file_bytes:
        return {
            "compacted": False,
            "triggered": False,
            "files_before": stats["n_files"],
            "files_after": stats["n_files"],
            "total_bytes": stats["total_bytes"],
            "avg_file_bytes": avg,
            "path": path,
        }
    out = compact_parquet(
        spark, path, target_file_bytes=target_file_bytes, min_files_to_compact=2
    )
    out["triggered"] = True
    out["avg_file_bytes"] = avg
    return out
