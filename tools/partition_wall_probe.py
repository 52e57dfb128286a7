"""Does the exact-sliding-distinct wall actually move with reduce-task
count?  (Round-18; tests the assumption behind ``sliding_distinct_budget``
and its ADVICE-r12 clamp.)

The round-15/16 ladder located the exact-path wall at ~50M (window, key)
pairs on THIS box's 32-partition shuffle — ~1.56M pairs of agg-hash state
per reduce task.  ``sliding_distinct_budget`` extrapolates that per-task
allowance by ``spark.sql.shuffle.partitions``; ADVICE r12 pointed out the
extrapolation assumes the conf equals the REAL reduce-task count, which
AQE partition coalescing can break.  This probe measures both halves of
that argument directly: the exact form at x256 density (~84M estimated
pairs — over the 32-partition wall, under a 64-partition one) across
``spark.sql.shuffle.partitions`` ∈ {32, 64, 128}, with AQE partition
coalescing ON (the engine default) and OFF.

Reads events only (the only table the spec touches); density-preserving
replication identical to ``scale_smoke``'s events rule (user_id shifted
per copy so the key space grows with the data; ts jittered inside the
window span so per-window density grows too).

Usage::

    python tools/partition_wall_probe.py            # x256, partitions 32/64/128
    python tools/partition_wall_probe.py 64         # custom factor
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import BASE_SF_DIR, KEY_SHIFT, USER_SHIFT, _JITTER_MS  # noqa: E402

PARTITIONS = [32, 64, 128]
WINDOW, SLIDE = "4 hours", "1 hour"  # the spec the wall was measured at


def replicate_events(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    df = spark.read.parquet(f"{BASE_SF_DIR}/events.parquet")
    ts_is_long = dict(df.dtypes).get("ts") in ("bigint", "long")

    def copy_cols(i: int):
        cols = []
        for c in df.columns:
            if c == "event_id":
                cols.append((F.col(c) + (i * KEY_SHIFT)).alias(c))
            elif c == "user_id":
                cols.append((F.col(c) + (i * USER_SHIFT)).alias(c))
            elif c == "ts":
                if ts_is_long:
                    cols.append((F.col(c) + (i * _JITTER_MS * 1_000_000)).alias(c))
                else:
                    # interval addition preserves TIMESTAMP and TIMESTAMP_NTZ
                    # alike (unix_micros rejects ntz)
                    cols.append(
                        (
                            F.col(c)
                            + F.expr(f"INTERVAL {i * _JITTER_MS} MILLISECOND")
                        ).alias(c)
                    )
            else:
                cols.append(F.col(c))
        return cols

    out = df.select(copy_cols(0))
    for i in range(1, factor):
        out = out.unionByName(df.select(copy_cols(i)))
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import (
        SLIDING_DISTINCT_PAIRS_PER_PARTITION,
        sliding_distinct,
        sliding_key_space,
    )
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-partition-wall")
    root = tempfile.mkdtemp(prefix="pmf_wall_")
    out = {"factor": factor, "window": WINDOW, "slide": SLIDE, "configs": []}
    try:
        d = os.path.join(root, f"x{factor}")
        replicate_events(spark, factor, d)
        ev = load(spark, "events", d)
        est = sliding_key_space(ev, "ts", "user_id", WINDOW, SLIDE)
        out["key_space_estimate"] = est

        def timed():
            df = sliding_distinct(ev, "ts", "user_id", WINDOW, SLIDE, method="exact")
            df.write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            return round(min(ts), 3)

        for coalesce in ("true", "false"):
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", coalesce
            )
            for parts in PARTITIONS:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                row = {
                    "shuffle_partitions": parts,
                    "aqe_coalesce": coalesce == "true",
                    "pairs_per_task_if_even": round(est / parts / 1e6, 2),
                    "over_measured_wall": est / parts
                    > SLIDING_DISTINCT_PAIRS_PER_PARTITION,
                    "exact_sec": timed(),
                }
                out["configs"].append(row)
                print(json.dumps(row), flush=True)
        # restore engine defaults
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
