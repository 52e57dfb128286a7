"""Distributed prefix sums — keyed running totals that stay parallel when
the key has LOW cardinality.

``Window.partitionBy(key).orderBy(...)`` puts every row of a key into ONE
task; with 3–5 distinct keys over 10⁸+ rows that is a handful of serial
multi-GB sorts — the x64 scale ladder measured ``agg_weighted_median``
at exponent 0.90 (near-linear wall-clock in data) for exactly this
reason.  The classic fix is the two-phase parallel prefix sum (Blelloch
scan, distributed form):

1. range-partition by ``(key, order...)`` so the global order is split
   across MANY partitions, each sorted locally in parallel;
2. compute per-(partition, key) local running sums + per-partition
   totals (the totals table is tiny: partitions × keys rows);
3. the global cum of a row = its local cum + the summed totals of all
   earlier partitions of its key — one broadcast join.

Exactness: the cum of each row depends only on the TOTAL ORDER
``(key, order...)`` (include a tiebreak so it is total), never on where
the sampled range boundaries fall — so results are bit-stable across
runs, partition counts, and engines even though ``repartitionByRange``
samples its boundaries.

CONSISTENCY HAZARD (and why the scan localCheckpoints): phases 2 and 3
branch the partitioned table, and Spark re-plans each branch into its
OWN range exchange — ``spark_partition_id()`` is a nondeterministic
expression, which defeats ReusedExchange canonicalization, so the
branches each rerun the boundary-sampling job.  Two branches sampling
DIFFERENT boundaries silently desyncs ``__pid`` between the local cums
and the offsets table: rows drop at the join and cums go wrong
(observed: per-group counts off by 2% run-to-run).  The fix is
structural, not a config: ``localCheckpoint(eager=False)`` collapses the
branches onto ONE materialized RDD whose partitioner (boundaries
included) is fixed at construction — every branch reads the same blocks,
and a lost block fails loudly instead of resampling.  At scale this
persists the per-distinct-value table once instead of recomputing the
scan input three times — cheaper, not just safer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    sum_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Add ``out_col`` = exact per-``group_col`` running sum of ``sum_col``
    over the total order ``order_cols`` (caller must include a tiebreak),
    computed with the two-phase parallel scan described in the module
    docstring.  Output also carries a ``group_total`` column (the
    per-group grand total) since every prefix-sum consumer needs it and
    it is free here.

    Reserved internal names the input must not already contain:
    ``__pid``, ``__lcum_*``, ``__off_*``, ``group_total``."""
    return distributed_prefix_sums(
        df, group_col, order_cols, {sum_col: out_col}, total_col="group_total"
    )


def distributed_prefix_sums(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    sum_cols: dict,
    total_col: str | None = None,
) -> DataFrame:
    """Multi-column form of :func:`distributed_prefix_sum`: one range
    partitioning, one local sort, one tiny offsets broadcast — N running
    sums.  ``sum_cols`` maps input column → output cum column.  When
    several cumulative measures share one total order (e.g. the two-sample
    ECDF scan needs cum counts of BOTH samples per value), doing them in a
    single two-phase scan halves the passes a per-column loop would take.

    If ``total_col`` is set, the per-group grand total of the FIRST
    ``sum_cols`` entry is attached under that name."""
    reserved = {"__pid"} | ({total_col} if total_col else set()) | {
        f"__lcum_{c}" for c in sum_cols
    } | {f"__off_{c}" for c in sum_cols} | {f"__ptot_{c}" for c in sum_cols}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"distributed_prefix_sums reserved columns present: {clash}")
    keys = [F.col(group_col)] + [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # No explicit partition count: a user-specified N exempts the exchange
    # from AQE (guide §2.2/§2.4), freezing the scan at shuffle.partitions
    # tasks whether the per-value table is 4 MB or 4 TB.  Leaving N unset
    # keeps the range exchange AQE-coalescible, so the partition count
    # derives from the actual shuffle bytes (advisoryPartitionSizeInBytes)
    # — scale-adaptive in both directions, and exactness never depends on
    # the partitioning (module docstring).
    parted = (
        df.repartitionByRange(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("__pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted
    for c in sum_cols:
        local = local.withColumn(f"__lcum_{c}", F.sum(c).over(w_local))
    # totals come from `parted`, NOT `local`: the branch then needs only a
    # map-side-combinable aggregate instead of re-running the sort+window
    # (measured: riding a whole-partition frame on the same Window operator
    # was SLOWER — the unbounded frame buffers the partition and the totals
    # branch re-runs the sort above the reused exchange).
    totals = parted.groupBy("__pid", group_col).agg(
        *[F.sum(c).alias(f"__ptot_{c}") for c in sum_cols]
    )
    # offsets via a windowless theta self-join of the totals table
    # (partitions × groups rows — tiny).  A window partitioned on
    # group_col would go EMPTY-spec whenever the caller's group is a
    # constant (Catalyst folds the literal out of the partition spec),
    # putting the single-partition WindowExec warning back into every
    # prefix-scan consumer.
    t2 = totals.select(
        F.col("__pid").alias("__pid2"),
        F.col(group_col).alias("__g2"),
        *[F.col(f"__ptot_{c}").alias(f"__ptot2_{c}") for c in sum_cols],
    )
    joined = totals.join(
        t2,
        F.col("__g2").eqNullSafe(F.col(group_col))
        & (F.col("__pid2") < F.col("__pid")),
        "left",
    )
    off_aggs = [
        F.coalesce(F.sum(f"__ptot2_{c}"), F.lit(0)).alias(f"__off_{c}")
        for c in sum_cols
    ]
    offsets = joined.groupBy("__pid", group_col).agg(*off_aggs)
    if total_col is not None:
        first = next(iter(sum_cols))
        gtot = totals.groupBy(F.col(group_col).alias("__g3")).agg(
            F.sum(f"__ptot_{first}").alias(total_col)
        )
        offsets = offsets.join(
            gtot, F.col("__g3").eqNullSafe(F.col(group_col))
        ).drop("__g3")
    out = local.join(F.broadcast(offsets), ["__pid", group_col])
    for c, out_c in sum_cols.items():
        out = out.withColumn(out_c, F.col(f"__lcum_{c}") + F.col(f"__off_{c}"))
    return out.drop(
        "__pid", *[f"__lcum_{c}" for c in sum_cols], *[f"__off_{c}" for c in sum_cols]
    )


def distributed_row_number(
    df: DataFrame, order_cols: list, out_col: str = "r"
) -> DataFrame:
    """Global ``row_number()`` over a total order WITHOUT the
    single-partition window (``Window.orderBy`` with no partition spec
    serializes every row into one task and WindowExec warns).  Implemented
    as the two-phase prefix scan of ones: range-partition on the order,
    local row_number per partition, plus the broadcast per-partition
    counts of all earlier partitions.  ``order_cols`` must be a total
    order (include a tiebreak); ``F.desc(...)`` columns are honored by
    both the range partitioner and the local sort."""
    tmp = df.withColumn("__one", F.lit(1)).withColumn("__g", F.lit(0))
    out = distributed_prefix_sums(tmp, "__g", order_cols, {"__one": out_col})
    return out.drop("__one", "__g")


def distributed_prefix_max(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out_col: str,
    exclusive: bool = True,
) -> DataFrame:
    """Global running MAX of ``val_col`` over a total order, two-phase:
    range-partition on the order, local running max per partition, then
    combine with the broadcast inclusive maxima of all earlier
    partitions.  ``exclusive=True`` computes the max over rows STRICTLY
    before the current one (``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING``)
    — NULL for the global first row — which is the skyline/pareto frame.

    This is the scale form of the bounded single-partition window the
    pareto docstring promises: rows before the current row = all rows of
    earlier partitions (their inclusive max, broadcast) ⊔ earlier rows of
    the local partition (local window)."""
    reserved = {"__pid", "__lmax", "__off"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"distributed_prefix_max reserved columns present: {clash}")
    keys = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # Unset N keeps the range exchange AQE-coalescible (see
    # distributed_prefix_sums) — partition count follows shuffle bytes.
    parted = (
        df.repartitionByRange(*keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    lo = -1 if exclusive else Window.currentRow
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, lo)
    )
    local = parted.withColumn("__lmax", F.max(val_col).over(w_local))
    totals = parted.groupBy("__pid").agg(F.max(val_col).alias("__ptot"))
    # offsets via a windowless theta self-join of the totals table (one
    # row per partition — n rows total, so the n² join is negligible and
    # nothing here serializes to a single task)
    t2 = totals.select(
        F.col("__pid").alias("__pid2"), F.col("__ptot").alias("__ptot2")
    )
    offsets = (
        totals.join(t2, F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.max("__ptot2").alias("__off"))
    )
    out = local.join(F.broadcast(offsets), "__pid")
    # greatest() skips NULLs, so first-row-of-partition (__lmax NULL under
    # exclusive) and first-partition (__off NULL) compose correctly
    return out.withColumn(out_col, F.greatest("__lmax", "__off")).drop(
        "__pid", "__lmax", "__off"
    )


def largest_remainder_allocate(
    wtd: DataFrame, weight_col: str, budget: int, key_col: str
) -> DataFrame:
    """Largest-remainder (Hamilton) integer allocation of ``budget`` units
    proportional to ``weight_col``, summing EXACTLY to the budget — the
    shared machinery of the Neyman and temperature-sampling allocators.

    Adds columns ``base`` (floor share), ``rem`` (remainder), ``base_sum``
    (global floor total) and ``r`` (1-based largest-remainder rank, ties
    broken on ``key_col`` asc); the caller settles the final allocation as
    ``base + (r <= budget - base_sum ? 1 : 0)``.  Every global quantity is
    an aggregate cross-joined back via broadcast, and the rank is the
    two-phase :func:`distributed_row_number` — no empty-partition window
    anywhere, so the plan stays parallel (and WindowExec-warning-free) at
    any stratum cardinality."""
    tot = wtd.agg(F.sum(weight_col).alias("__wsum"))
    staged = (
        wtd.crossJoin(F.broadcast(tot))
        .withColumn("base", F.expr(f"({budget} * {weight_col}) div __wsum"))
        .withColumn("rem", F.expr(f"({budget} * {weight_col}) % __wsum"))
        .drop("__wsum")
    )
    btot = staged.agg(F.sum("base").alias("base_sum"))
    return distributed_row_number(
        staged, [F.desc("rem"), key_col], "r"
    ).crossJoin(F.broadcast(btot))
