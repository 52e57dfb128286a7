"""Count-min sketch, relationally — mergeable approximate counting with a
deterministic, engine-independent hash family.

The classic CMS (Cormode & Muthukrishnan 2005, public) keeps a depth×width
counter matrix; each key increments one cell per row via independent
hashes, and a point query reads the MINIMUM of its cells — an estimate
that can only over-count (one-sided error ≤ 2N/width with probability
1−(1/2)^depth).

The twist here: both the build and the probe are expressed as PLAIN
relational algebra over a multiply-shift hash family
(``(a·key + b) mod p mod width`` with literal constants), so

* the whole sketch stays inside whole-stage codegen — no UDF, no
  driver-side matrix;
* partial sketches from different partitions/days/batches merge by simple
  addition — which in this formulation is just the ``groupBy(row, cell)``
  SUM (the mergeable-partial-aggregate pattern that makes sketches the
  backbone of 100 TB monitoring rollups);
* DuckDB can run the *identical* computation, so the graded query is
  hash-exact — a sketch with an oracle, because the "randomness" is a
  fixed literal hash family, not engine RNG.

``p`` is the Mersenne prime 2^31−1; keys and ``a`` are bounded so every
product stays far inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

_P = 2_147_483_647  # 2^31 - 1
#: (a, b) per sketch row — fixed literals, independent pairwise hashes
_FAMILY = ((131_071, 524_287), (262_139, 8_191), (524_287, 131_101), (999_983, 262_147))


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Counter cells ``(row, cell, cnt)`` of the CMS over an int key column.

    One generator projection (depth cells per input row via a literal
    array + explode) and one ``groupBy(row, cell)`` count — map-side
    combinable, at most ``depth × width`` output rows however large the
    input.  Build partials per partition/day/batch and merge by summing
    ``cnt`` over the same grouping: addition is the sketch's merge.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                ((F.col(key_col) * _FAMILY[i][0] + _FAMILY[i][1]) % _P % width).alias(
                    "cell"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Point-query estimates: min over rows of each key's cell counters.

    ``keys`` is a (small) frame of distinct keys; each key expands to its
    ``depth`` cells, equi-joins the sketch, and takes the min — estimates
    can only over-count, never under."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                ((F.col(key_col) * _FAMILY[i][0] + _FAMILY[i][1]) % _P % width).alias(
                    "cell"
                ),
            )
            for i in range(depth)
        ]
    )
    probes = keys.select(key_col, F.explode(cells).alias("rc")).select(
        key_col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")
    )
    return (
        probes.join(sketch, ["row", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def _cms_sql(key_expr: str, table: str, where: str, width: int, depth: int) -> str:
    """DuckDB twin of build+estimate fused for the graded query."""
    cell = lambda i: f"(({key_expr}) * {_FAMILY[i][0]} + {_FAMILY[i][1]}) % {_P} % {width}"
    probes = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {i} AS row, {cell(i)} AS cell FROM {table} {where}"
        for i in range(depth)
    )
    builds = " UNION ALL ".join(
        f"SELECT {i} AS row, {cell(i)} AS cell FROM {table}" for i in range(depth)
    )
    return f"""
        WITH sketch AS (
            SELECT row, cell, count(*) AS cnt FROM ({builds}) GROUP BY 1, 2
        ),
        probes AS (SELECT DISTINCT k, row, cell FROM ({probes}))
        SELECT p.k AS user_id, CAST(min(s.cnt) AS BIGINT) AS est
        FROM probes p JOIN sketch s USING (row, cell)
        GROUP BY 1
    """


@graded(
    "cms_user_event_counts",
    oracle=_cms_sql("user_id", "events", "WHERE user_id < 40", 1024, 4),
    section="C11,F14,D8",
    description="count-min sketch, relationally: per-user event-count "
    "estimates (users <40) from a 4×1024 counter matrix built with a "
    "literal multiply-shift hash family — no UDF, mergeable by summing "
    "cells, and hash-exact across engines because the 'randomness' is a "
    "fixed literal family (estimates over-count only, pinned in pytest)",
)
def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    sketch = cms_build(events, "user_id")
    keys = events.filter(F.col("user_id") < 40).select("user_id").distinct()
    return cms_estimate(sketch, keys, "user_id")
