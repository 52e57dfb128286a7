"""Skew-mitigation helpers (SURVEY.md §2.F14 / §7.4.10).

At 100 TB, a hot grouping key (one dominant event_type, one viral document)
turns a single reducer into the job's critical path.  AQE's skew-join
handling covers joins; for *aggregations* the classic fix is salting:
split each key into ``n_salts`` sub-keys, pre-aggregate, then combine.
Decomposable aggregates (sum/count/min/max) are exact under this rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for decomposable aggregates.

    ``aggs`` maps output alias → (combine_fn_name, partial Column), e.g.::

        salted_agg(events, ["event_type"],
                   {"n": ("sum", F.count("*")),
                    "total": ("sum", F.sum("value")),
                    "mx": ("max", F.max("value"))})

    Stage 1 groups on (keys + salt) — ``n_salts``× more reducers share the
    hot key's rows; stage 2 combines the partials per key.  ``salt_source``
    defaults to a uniform spray over an arbitrary existing column hash
    (any distribution works: correctness does not depend on the salt).
    """
    if salt_source is None:
        salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns[:1]], F.monotonically_increasing_id()), n_salts)
    elif isinstance(salt_source, str):
        salt = F.pmod(F.xxhash64(F.col(salt_source)), n_salts)
    else:
        salt = F.pmod(salt_source, n_salts)

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[col.alias(f"__p_{alias}") for alias, (_, col) in aggs.items()])
    )
    combine = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*keys).agg(
        *[
            combine[fn](f"__p_{alias}").alias(alias)
            for alias, (fn, _) in aggs.items()
        ]
    )
