"""Skew stress leg (F14): prove the salted-agg path under REAL key skew.

The scale_smoke ladder replicates testdata with shifted keys, which keeps
key frequencies uniform — it can never produce a hot key.  This tool
builds two same-size synthetic event tables that differ ONLY in key
distribution:

- ``uniform``: event_type spread evenly over 1000 values
- ``skewed``:  90% of all rows share ONE event_type ('hot'), the rest
  spread over the same 1000 values

and times the salted two-stage aggregation (the ``salted_hot_key_agg``
plan) plus the plain single-stage GROUP BY on both.  The acceptance bar
(VERDICT r05 item 7): salted(skewed) within 2× of salted(uniform).

Both tables are deterministic ``spark.range`` derivations (no RNG), so
the leg is reproducible run-to-run.  Output: one JSON line for
SCALING.md.

Usage::

    python tools/skew_stress.py            # N=20M rows per table
    SKEW_STRESS_N=5000000 python tools/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build(spark, n: int, skewed: bool):
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 997).cast("double").alias("value"),
    )
    spread = F.concat(F.lit("t"), F.pmod(F.col("event_id"), F.lit(1000)))
    if skewed:
        et = F.when(F.pmod(F.col("event_id"), F.lit(10)) < 9, F.lit("hot")).otherwise(
            spread
        )
    else:
        et = spread
    return base.withColumn("event_type", et)


def timed(df_fn) -> float:
    df_fn().write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(2):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return round(min(samples), 3)


def main() -> None:
    from pulsar_message_filter_spark.functions.skew import salted_agg
    from pulsar_message_filter_spark.operators.parity import cents
    from pulsar_message_filter_spark.session import get_spark

    n = int(os.environ.get("SKEW_STRESS_N", 20_000_000))
    spark = get_spark("pmf-skew-stress")

    aggs = {
        "n": ("sum", F.count("*")),
        "total_cents": ("sum", F.sum(cents("value"))),
        "max_cents": ("max", F.max(cents("value"))),
    }
    out: dict = {"n_rows": n, "hot_share": 0.9, "n_salts": 16}
    frames = {}
    for dist in ("uniform", "skewed"):
        df = build(spark, n, skewed=dist == "skewed").localCheckpoint()
        frames[dist] = df
        out[f"salted_{dist}_sec"] = timed(
            lambda d=df: salted_agg(
                d, ["event_type"], aggs, n_salts=16, salt_source="event_id"
            )
        )
        out[f"plain_{dist}_sec"] = timed(
            lambda d=df: d.groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.sum(cents("value")).alias("total_cents"),
                F.max(cents("value")).alias("max_cents"),
            )
        )
    # correctness cross-check while the frames are hot: salted == plain
    for dist, df in frames.items():
        a = {
            r["event_type"]: (r["n"], r["total_cents"], r["max_cents"])
            for r in salted_agg(
                df, ["event_type"], aggs, n_salts=16, salt_source="event_id"
            ).collect()
        }
        b = {
            r["event_type"]: (r["n"], r["total_cents"], r["max_cents"])
            for r in df.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(cents("value")).alias("total_cents"),
                F.max(cents("value")).alias("max_cents"),
            )
            .collect()
        }
        assert a == b, f"salted != plain on {dist}"
    out["salted_skew_over_uniform"] = round(
        out["salted_skewed_sec"] / out["salted_uniform_sec"], 2
    )
    out["within_2x"] = out["salted_skew_over_uniform"] <= 2.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
