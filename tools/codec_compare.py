"""Parquet codec trade-off measurement for the write-side 100 TB story.

Writes the sf0.1 fact tables under each codec and reports bytes on disk,
write wall-clock, and full-scan read wall-clock — the three numbers that
decide a lake's default codec.  At 100 TB the size delta IS the scan
time delta on object storage (S3 throughput-bound), so the usual call is
zstd for cold data, snappy/lz4 for hot intermediate layers.

Usage::

    python tools/codec_compare.py [table ...]     # default: lineitem events documents
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CODECS = ["snappy", "zstd", "gzip", "lz4", "uncompressed"]


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def main() -> None:
    tables = sys.argv[1:] or ["lineitem", "events", "documents"]

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("codec-compare")
    scratch = tempfile.mkdtemp(prefix="pmf_codec_")
    rows = []
    try:
        for table in tables:
            df = load(spark, table, BASE_SF_DIR)
            df.count()  # warm the source read
            for codec in CODECS:
                path = os.path.join(scratch, f"{table}_{codec}")
                t0 = time.time()
                df.write.mode("overwrite").option("compression", codec).parquet(path)
                t_write = time.time() - t0
                t0 = time.time()
                n = spark.read.parquet(path).count()
                t_read = time.time() - t0
                rows.append(
                    {
                        "table": table,
                        "codec": codec,
                        "mib": round(dir_bytes(path) / 1048576, 2),
                        "write_s": round(t_write, 2),
                        "read_s": round(t_read, 2),
                        "rows": n,
                    }
                )
                print(f"-- {rows[-1]}", flush=True)
                shutil.rmtree(path)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"base_dir": BASE_SF_DIR, "rows": rows}))


if __name__ == "__main__":
    main()
