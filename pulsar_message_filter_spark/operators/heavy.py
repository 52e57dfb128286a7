"""Heavy hitters — distributed Misra-Gries with an exact verification pass.

The frequent-items problem at 100 TB: exact per-key counts need a full
shuffle of every key; a Misra-Gries (space-saving) summary needs one pass
and k counters per partition.  The classic two-phase distributed shape:

1. **Summarize**: each partition runs Misra-Gries with ``k`` counters
   (``mapInPandas``, numpy value-counts per Arrow batch — no per-row
   Python).  Guarantee: any key with partition frequency > n_p/k survives
   the partition summary, so any key with GLOBAL frequency > n/k survives
   in at least one partition (averaging argument) — the candidate union
   is a superset of every θ-heavy key whenever k ≥ 1/θ.
2. **Verify**: exact recount of the candidate keys only (broadcast
   semi-join — candidates are ≤ k × partitions rows, tiny), then filter
   ``count > θ·n``.  The sketch bounds the *work*; the verify pass makes
   the answer exact — hence a plain GROUP BY/HAVING oracle, unlike the
   rows-only CMS/HLL sketches in `sketch.py`.

θ = 0.6 % with k = 512 ≥ 1/θ ≈ 167 keeps the guarantee with >3× margin
(robust to Arrow batch boundaries: the per-batch MG merge below decrements
conservatively, which only ever keeps MORE candidates).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

_MG_K = 512
_THETA = 0.006


def make_mg_merge(k: int):
    """Build the Misra-Gries batch merge for a k-counter summary:
    ``merge(counters, keys, counts)`` folds (key, count) pairs in place,
    keeping at most k counters (batch decrement = min surviving count).

    A FACTORY, deliberately: the returned closure is a dynamic function,
    which cloudpickle ships BY VALUE inside the mapInPandas closure —
    a module-level function would pickle by reference and fail on any
    worker whose sys.path lacks the repo package."""

    def merge(counters: dict[int, int], keys, counts) -> None:
        for key, cnt in zip(keys, counts):
            if key in counters:
                counters[key] += int(cnt)
            else:
                counters[key] = int(cnt)
                if len(counters) > k:
                    dec = min(counters.values())
                    for c in list(counters):
                        nv = counters[c] - dec
                        if nv <= 0:
                            del counters[c]
                        else:
                            counters[c] = nv

    return merge


def mg_candidates(df: DataFrame, key_col: str, k: int = _MG_K) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (distinct, superset of
    every key with global frequency > n/k)."""

    merge = make_mg_merge(k)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts()
            merge(counters, vc.index.to_numpy(), vc.to_numpy())
        yield pd.DataFrame({key_col: pd.Series(list(counters), dtype="int64")})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} long"
    ).distinct()


@graded(
    "agg_heavy_hitters",
    oracle=f"""
        WITH tot AS (SELECT count(*) AS n FROM events)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events, tot
        GROUP BY user_id, tot.n
        HAVING count(*) > floor({_THETA} * tot.n)
    """,
    section="C11,C12,G5,F14",
    description="exact heavy hitters via distributed Misra-Gries (k=512 "
    "counters/partition, mapInPandas) + exact candidate recount at "
    "theta=0.6% — sketch bounds the work, verify pass makes it exact",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    candidates = mg_candidates(events, "user_id")
    total = events.agg(F.count("*").alias("n"))
    return (
        events.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") > F.floor(F.lit(_THETA) * F.col("n")))
        .select("user_id", "n_events")
    )
