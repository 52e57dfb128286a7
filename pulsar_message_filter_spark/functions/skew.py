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


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resilient equi-join: spray the skewed side, replicate the small side.

    A hot join key concentrates all its rows on one shuffle partition; AQE's
    skew handling splits oversized *partitions* after the fact, but when one
    key alone exceeds executor memory the classic fix is salting:

    * the skewed (large) side gets a random salt in ``[0, n_salts)`` — its
      hot key now hashes to ``n_salts`` distinct shuffle buckets;
    * the small side is replicated once per salt value (an ``explode`` over
      ``sequence(0, n_salts-1)`` — n_salts× the small side's rows, which is
      why this requires a genuinely small build side);
    * the equi-join runs on ``on + [salt]``.

    Row multiplicity is preserved exactly for ``inner`` and ``left`` joins:
    each skewed-side row carries exactly one salt and meets exactly one
    replica of each matching small-side row.  ``right``/``full`` are
    rejected — unmatched small-side rows would surface once per replica.

    At 100 TB this is the manual fallback for pathological keys; prefer AQE
    (``spark.sql.adaptive.skewJoin.enabled``, on by default in our session)
    until a single key's row count breaks the partition-split model.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join preserves semantics only for inner/left, got {how!r}")
    overlap = set(skewed.columns) & set(small.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    salted_big = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id(), *[F.col(k) for k in on]), n_salts).cast("int"),
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated_small, on=on + ["__salt"], how=how).drop("__salt")
