"""Per-key throttling — the rate-limit verdict surface (B13/E8 companion).

A message engine that can ACCEPT/REJECT/RESCHEDULE (``filtering.route``)
also needs *quantity* control: at most N messages per key per window, the
rest routed to the reschedule/overflow path.  Two forms:

* **batch/exact** (:func:`throttle_per_key_window`, graded) — deterministic
  rank inside (key, tumbling window): ``row_number() OVER (PARTITION BY
  key, window ORDER BY ts, id) <= n`` keeps the FIRST n arrivals, a
  total-ordered, engine-portable definition (ties broken by id — never by
  partition luck).
* **streaming/stateful** (:func:`pulsar_message_filter_spark.streaming.
  pipeline.throttle_stateful`) — token bucket per key carried across
  micro-batches in the state store; same keyed-shuffle shape as every
  other stateful op here.

Scale notes (100 TB):

* One window over (key, bucket) — uniform composite key; at 1000
  executors this is the standard sessionization exchange.  No joins, no
  driver state.
* The verdict is a projection; routing to sinks reuses the B13
  ``foreachBatch`` partitioned-write path, one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def throttle_per_key_window(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    limit: int,
    window: str = "1 hour",
) -> DataFrame:
    """Verdict-tag rows: the first ``limit`` arrivals per (key, window)
    are ACCEPT, the rest THROTTLE.  Deterministic: arrival order is
    (ts, id), total-ordered."""
    w = Window.partitionBy(
        F.col(key), F.window(F.col(ts), window).start
    ).orderBy(F.unix_micros(F.col(ts)), F.col(id_col))
    return df.withColumn(
        "verdict",
        F.when(F.row_number().over(w) <= limit, "ACCEPT").otherwise("THROTTLE"),
    )


@graded(
    "throttle_per_user_hour",
    oracle="""
        WITH ranked AS (
            SELECT event_id, user_id,
                   row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                      ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        )
        SELECT user_id,
               CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
               CAST(sum(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_throttled
        FROM ranked GROUP BY 1
    """,
    section="B13,E1,C18",
    description="per-key rate limiting: first 3 events per (user, hour) "
    "ACCEPT, rest THROTTLE -- deterministic (ts, event_id) arrival order; "
    "per-user accept/throttle totals",
)
def throttle_per_user_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    tagged = throttle_per_key_window(
        events, "user_id", "ts", "event_id", limit=3, window="1 hour"
    )
    return tagged.groupBy("user_id").agg(
        F.sum(F.when(F.col("verdict") == "ACCEPT", 1).otherwise(0))
        .cast("long")
        .alias("n_accepted"),
        F.sum(F.when(F.col("verdict") == "THROTTLE", 1).otherwise(0))
        .cast("long")
        .alias("n_throttled"),
    )
