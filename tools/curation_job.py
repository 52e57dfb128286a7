"""End-to-end batch curation job — the production shape, as a CLI.

Reads a corpus, runs the full curation chain, and WRITES the result as
the training-ready layout — the job a scheduler would own at 100 TB:

    quality filter → exact dedup → near-dup removal → PII scrub →
    train/val/test split → content-addressed sharding →
    partitioned parquet write (split=…/shard=…) → DQ gate on the output

Every stage is deterministic (content-addressed decisions only), so
re-running the job over the same input produces byte-identical split and
shard membership — the resumability contract.  The final data-quality
gate re-reads what was written and fails the job (exit 1) on any
violation: a publish step that cannot ship a corrupt layout.

Usage::

    python tools/curation_job.py                       # sf0.01 → /tmp out
    python tools/curation_job.py --sf DIR --out DIR --shards 16

Prints one JSON line per run: per-stage row counts, written file/byte
totals, wall seconds — diffable across runs like bench.py.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/pmf_curation_out")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.dedup import dedup_exact, dedup_near
    from pulsar_message_filter_spark.operators.profiling import shard_assign
    from pulsar_message_filter_spark.operators.quality import violation_counts
    from pulsar_message_filter_spark.operators.sampling import train_val_test_split
    from pulsar_message_filter_spark.operators.scrub import pii_scrub
    from pulsar_message_filter_spark.operators.text import quality_flags
    from pulsar_message_filter_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("pmf-curation-job")
    counts: dict[str, int] = {}

    docs = load(spark, "documents", args.sf)
    counts["input"] = docs.count()

    # 1. quality filter: drop docs failing any C4/Gopher-style flag
    flags = quality_flags(F.col("text"))
    keep = None
    for cond in flags.values():
        keep = cond if keep is None else (keep & cond)
    curated = docs.filter(keep)
    counts["after_quality"] = curated.count()

    # 2. exact dedup (content-hash keyed keep-first)
    curated = dedup_exact(curated, "text", "doc_id")
    counts["after_exact_dedup"] = curated.count()

    # 3. near-dup removal (MinHash/LSH pairs → components → keep-first)
    curated = dedup_near(curated, threshold=args.near_dup_threshold)
    counts["after_near_dedup"] = curated.count()

    # 4. PII scrub (in-place redaction + audit counts)
    curated = pii_scrub(curated, "text")
    counts["pii_redactions"] = int(
        curated.agg(F.sum(F.col("n_email") + F.col("n_phone"))).collect()[0][0] or 0
    )

    # 5. split + shard (content-addressed, stable layout keys)
    final = shard_assign(train_val_test_split(curated, "doc_id"), "doc_id", args.shards)

    # 6. write the training layout: one directory per (split, shard)
    (
        final.repartition(args.shards, "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(args.out)
    )

    # 7. DQ gate on what was actually written
    written = spark.read.parquet(args.out)
    counts["written"] = written.count()
    gate = violation_counts(
        written,
        {
            "null_doc_id": F.col("doc_id").isNull(),
            "empty_text": (F.col("text").isNull()) | (F.length("text") == 0),
            "unredacted_email": F.col("text").rlike("[a-z0-9._]+@[a-z0-9.-]+"),
        },
    ).collect()[0]
    dq = {k: int(gate[k]) for k in ("null_doc_id", "empty_text", "unredacted_email")}
    dup = (
        written.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    dq["duplicate_doc_id"] = int(dup)

    files = glob.glob(f"{args.out}/**/*.parquet", recursive=True)
    report = {
        "metric": "curation_job",
        "counts": counts,
        "dq_violations": dq,
        "n_files": len(files),
        "bytes_written": sum(os.path.getsize(f) for f in files),
        "shards": args.shards,
        "sec": round(time.time() - t0, 3),
        "sf": args.sf,
    }
    print(json.dumps(report))
    return 1 if any(dq.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
