"""Does key FREQUENCY skew move the exact-sliding-distinct wall?
(Round-18 companion to ``partition_wall_probe`` — isolates the second
assumption named in the ADVICE-r12 clamp note.)

The exact path's state is the distinct (window, key) pair space, hash-
sharded across reduce tasks.  Frequency skew (one hot key carrying most
ROWS) changes neither the pair space nor its hash distribution — if
anything, map-side partial aggregation absorbs a hot key's duplicates
before the shuffle.  Window-density skew and pair-space growth are what
hurt.  This probe measures the frequency half under controlled
conditions: two synthetic frames with the IDENTICAL distinct pair set
(a full windows × keys coverage grid) and IDENTICAL total row count,
differing only in where the extra row mass sits —

* ``uniform``: the surplus rows cycle over all keys evenly;
* ``skewed``:  the surplus rows all land on key 0 (one key owns ~50%
  of rows — a pathological hot key).

Both run the exact sliding distinct at the same 4h/1h spec; if the
wall were frequency-sensitive, ``skewed`` would be slower.  Frames are
built directly from ``spark.range`` (no parquet round trip) so the
aggregation cost dominates the measurement.

Usage::

    python tools/skew_wall_probe.py              # 100 slides x 600k keys
    python tools/skew_wall_probe.py 50 200000    # custom
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOUR_US = 3600 * 1_000_000
WINDOW, SLIDE = "4 hours", "1 hour"


def main() -> int:
    n_slides = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.windows import sliding_distinct
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-skew-wall")
    grid = n_slides * n_keys  # coverage rows = distinct (slide-bucket, key)

    def coverage():
        # one event per (slide bucket, key): ts at the bucket start + 1s,
        # so every key is present in every bucket → identical pair space
        # in both variants (each event expands to its member windows).
        return spark.range(grid).select(
            F.timestamp_micros(
                (F.col("id") % n_slides) * HOUR_US + 1_000_000
            ).alias("ts"),
            (F.col("id") / n_slides).cast("long").alias("user_id"),
        )

    def surplus(skewed: bool):
        # same row count either way; only the key placement differs
        key = F.lit(0).cast("long") if skewed else (F.col("id") / n_slides).cast("long")
        return spark.range(grid).select(
            F.timestamp_micros(
                (F.col("id") % n_slides) * HOUR_US + 2_000_000
            ).alias("ts"),
            key.alias("user_id"),
        )

    out = {"n_slides": n_slides, "n_keys": n_keys, "rows_per_variant": 2 * grid}
    for label, skewed in (("uniform", False), ("skewed", True)):
        df = coverage().unionByName(surplus(skewed))
        agg = sliding_distinct(df, "ts", "user_id", WINDOW, SLIDE, method="exact")
        agg.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(2):
            t0 = time.time()
            agg.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        out[label + "_sec"] = round(min(ts), 3)
        print(json.dumps({label: out[label + "_sec"]}), flush=True)

    # sanity: identical result frames (same windows, same distinct counts)
    u = coverage().unionByName(surplus(False))
    s = coverage().unionByName(surplus(True))
    du = sliding_distinct(u, "ts", "user_id", WINDOW, SLIDE, method="exact")
    ds = sliding_distinct(s, "ts", "user_id", WINDOW, SLIDE, method="exact")
    out["results_identical"] = sorted(map(tuple, du.collect())) == sorted(
        map(tuple, ds.collect())
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
