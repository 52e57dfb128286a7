"""HIGH-DENSITY partition-wall probe: the clamp's remaining open condition.

The round-18 probe (``partition_wall_probe.py``) measured x256 density
(~84M estimated pairs): over the measured 32-partition wall, but UNDER the
wall for every config ≥64 partitions — so it could show AQE coalescing
deadening the conf and real 4× sharding buying ~8%, but not what happens
when the per-task state is over the wall AT a high partition count.  The
``sliding_distinct_budget`` clamp docstring (windows.py) names that the
open condition: no wall has been measured above the 32-partition
reference.

This probe closes it: x1024 density (~335M estimated pairs — over the
1.56M-pairs/task wall even at 128-way sharding) with AQE partition
coalescing OFF (so the conf IS the reduce-task count) across
``spark.sql.shuffle.partitions`` ∈ {32, 128, 512}:

* 32  → ~10.5M pairs/task: deep over-wall (the spill/regression regime)
* 128 → ~2.6M pairs/task: just over the wall
* 512 → ~0.65M pairs/task: under the wall — if per-task state were the
  whole story, this config should recover the x256 per-row wall time.

If 512-way real sharding at over-wall aggregate state recovers
proportionally, the >512-partition extrapolation the clamp suspends would
be supportable on multi-machine iron; if it flattens on one box (shared
memory subsystem), the clamp's conservatism is measured, not assumed.

Replication is two-stage (x32 written to parquet, then x32 over that with
stage-scaled shifts) so the plan never holds 1024 union branches; the
shift arithmetic composes to exactly the single-stage x1024 population
(density-preserving: key space and per-window density both grow with the
data, same rule as scale_smoke).

Usage::

    python tools/partition_wall_probe_hd.py          # x1024, parts 32/128/512
    python tools/partition_wall_probe_hd.py 16 16    # custom fa fb
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.partition_wall_probe import WINDOW, SLIDE, replicate_events  # noqa: E402
from tools.scale_smoke import KEY_SHIFT, USER_SHIFT, _JITTER_MS  # noqa: E402

PARTITIONS = [32, 128, 512]


def replicate_events_2stage(spark, fa: int, fb: int, root: str) -> str:
    """x(fa*fb) density-preserving replication via an intermediate parquet.

    Stage A is the round-18 probe's replicate (copies 0..fa-1); stage B
    unions fb copies of the stage-A output with shifts scaled by fa, so
    copy j of stage B reproduces single-stage copies j*fa .. j*fa+fa-1.
    """
    from pyspark.sql import functions as F

    stage_a = os.path.join(root, f"x{fa}")
    replicate_events(spark, fa, stage_a)
    df = spark.read.parquet(f"{stage_a}/events.parquet")
    ts_is_long = dict(df.dtypes).get("ts") in ("bigint", "long")

    def copy_cols(j: int):
        cols = []
        for c in df.columns:
            if c == "event_id":
                cols.append((F.col(c) + (j * fa * KEY_SHIFT)).alias(c))
            elif c == "user_id":
                cols.append((F.col(c) + (j * fa * USER_SHIFT)).alias(c))
            elif c == "ts":
                if ts_is_long:
                    cols.append(
                        (F.col(c) + (j * fa * _JITTER_MS * 1_000_000)).alias(c)
                    )
                else:
                    cols.append(
                        (
                            F.col(c)
                            + F.expr(f"INTERVAL {j * fa * _JITTER_MS} MILLISECOND")
                        ).alias(c)
                    )
            else:
                cols.append(F.col(c))
        return cols

    out = df.select(copy_cols(0))
    for j in range(1, fb):
        out = out.unionByName(df.select(copy_cols(j)))
    final = os.path.join(root, f"x{fa * fb}")
    os.makedirs(final, exist_ok=True)
    out.write.mode("overwrite").parquet(f"{final}/events.parquet")
    shutil.rmtree(stage_a, ignore_errors=True)
    return final


def main() -> int:
    fa = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    fb = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import (
        SLIDING_DISTINCT_PAIRS_PER_PARTITION,
        sliding_distinct,
        sliding_key_space,
    )
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-partition-wall-hd")
    root = tempfile.mkdtemp(prefix="pmf_wall_hd_")
    out = {
        "factor": fa * fb,
        "window": WINDOW,
        "slide": SLIDE,
        "aqe_coalesce": False,
        "configs": [],
    }
    try:
        d = replicate_events_2stage(spark, fa, fb, root)
        ev = load(spark, "events", d)
        est = sliding_key_space(ev, "ts", "user_id", WINDOW, SLIDE)
        out["key_space_estimate"] = est
        print(json.dumps({"key_space_estimate": est}), flush=True)

        def timed():
            df = sliding_distinct(ev, "ts", "user_id", WINDOW, SLIDE, method="exact")
            df.write.format("noop").mode("overwrite").save()  # warm
            ts = []
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            return round(min(ts), 3)

        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        for parts in PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            row = {
                "shuffle_partitions": parts,
                "pairs_per_task_if_even": round(est / parts / 1e6, 2),
                "over_measured_wall": est / parts
                > SLIDING_DISTINCT_PAIRS_PER_PARTITION,
                "exact_sec": timed(),
            }
            out["configs"].append(row)
            print(json.dumps(row), flush=True)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
