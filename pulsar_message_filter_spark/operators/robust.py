"""Robust statistics — trimmed mean and MAD-based outlier counts.

Classical means and z-scores melt under the heavy tails real event data
has; production monitors use the 10 %-trimmed mean and the median
absolute deviation (MAD) instead.  Both are exact order statistics here,
built on the same per-value aggregation + distributed prefix scan as
``sketch.weighted_quantiles`` — never a per-row keyed window, so a
low-cardinality group column cannot serialize the scan into one task.

Exactness contract: values are integer cents; every count/cum is int64;
the per-value *kept-instance* count inside the trim band is computed by
clipping the inclusive cumulative range against the trim bounds —
``kept = min(cum, n-k) - max(cum-cnt, k)`` — which is exact for ties and
partial overlaps.  Weighted sums that multiply value·count are
decimal(38,0) partials (the Gini x64 lesson: int64 bounds the term, not
the sum; DuckDB's HUGEINT is the oracle twin).

Scale (100 TB): two map-side-combinable aggregations + two prefix scans
for MAD (one for the median, one for deviations), one of each for the
trimmed mean; all shuffles keyed by (group, value) — uniform, skew-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sum
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents
from pulsar_message_filter_spark.registry import graded

_TRIM_FRAC = 0.1


def _per_value_cum(df: DataFrame, group_col: str, value_col) -> DataFrame:
    """(group, v, cnt, cum, group_total): per-distinct-value counts with
    inclusive cumulative counts via the two-phase distributed scan."""
    per_value = (
        df.select(F.col(group_col), value_col.alias("v"))
        .groupBy(group_col, "v")
        .agg(F.count("*").alias("cnt"))
    )
    return distributed_prefix_sum(per_value, group_col, ["v"], "cnt", out_col="cum")


def trimmed_mean_cents(
    df: DataFrame, group_col: str, value_cents, trim_frac: float = _TRIM_FRAC
) -> DataFrame:
    """Per-group mean of the middle ``1 - 2·trim_frac`` mass: drop exactly
    ``k = floor(trim_frac · n)`` instances from each tail (ties split
    exactly via cumulative clipping), average the rest in integer cents."""
    cum = _per_value_cum(df, group_col, value_cents)
    k = F.floor(F.lit(trim_frac) * F.col("group_total")).cast("long")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("group_total") - k)
        - F.greatest(F.col("cum") - F.col("cnt"), k),
    )
    scored = cum.withColumn("kept", kept)
    return (
        scored.groupBy(group_col)
        .agg(
            F.max(F.col("group_total")).alias("n"),
            F.max(k).alias("k_trim"),
            F.sum(
                (F.col("v") * F.col("kept")).cast("decimal(38,0)")
            ).alias("sum_kept_cents"),
            F.sum("kept").alias("n_kept"),
        )
        .select(
            group_col,
            "n",
            "k_trim",
            (
                (F.col("sum_kept_cents").cast("double") / F.col("n_kept")) / 100
            ).alias("trimmed_mean"),
        )
    )


def lower_median_cents(df: DataFrame, group_col: str, value_cents) -> DataFrame:
    """(group, med_cents): the smallest value whose inclusive cumulative
    count reaches half the group — the deterministic *lower* median, the
    same convention as ``sketch.weighted_quantiles`` (no interpolation,
    so it is engine-exact on integers)."""
    cum = _per_value_cum(df, group_col, value_cents)
    return (
        cum.filter(2 * F.col("cum") >= F.col("group_total"))
        .groupBy(group_col)
        .agg(F.min("v").alias("med_cents"))
    )


@graded(
    "agg_trimmed_mean",
    oracle="""
        WITH per_value AS (
            SELECT l_returnflag AS g,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        c AS (
            SELECT g, v, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM per_value
        ),
        kept AS (
            SELECT g, v, n,
                   CAST(floor(0.1 * n) AS BIGINT) AS k,
                   greatest(CAST(0 AS BIGINT),
                            least(cum, n - CAST(floor(0.1 * n) AS BIGINT))
                            - greatest(cum - cnt, CAST(floor(0.1 * n) AS BIGINT)))
                       AS kept
            FROM c
        )
        SELECT g AS l_returnflag,
               max(n) AS n,
               max(k) AS k_trim,
               (CAST(sum(v * kept) AS DOUBLE) / CAST(sum(kept) AS BIGINT)) / 100
                   AS trimmed_mean
        FROM kept
        GROUP BY g
    """,
    section="C14,C11,F14",
    description="10%-trimmed mean of extended price per returnflag: exact "
    "tail-drop via cumulative-range clipping (ties split exactly), "
    "per-value counts + one distributed prefix scan, decimal(38) "
    "value-times-count partials (HUGEINT twin on the oracle side) -- the "
    "heavy-tail-proof mean a monitor should alarm on",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return trimmed_mean_cents(li, "l_returnflag", cents("l_extendedprice"))


@graded(
    "anomaly_mad_outliers",
    oracle="""
        WITH vals AS (
            SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
            FROM events
        ),
        per_value AS (
            SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM vals GROUP BY 1, 2
        ),
        c AS (
            SELECT g, v,
                   CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM per_value
        ),
        med AS (
            SELECT g, min(v) AS med_cents FROM c WHERE 2 * cum >= n GROUP BY g
        ),
        devs AS (
            SELECT vals.g, abs(v - med_cents) AS dv, med_cents
            FROM vals JOIN med ON vals.g = med.g
        ),
        dev_per_value AS (
            SELECT g, dv, med_cents, CAST(count(*) AS BIGINT) AS cnt
            FROM devs GROUP BY 1, 2, 3
        ),
        dc AS (
            SELECT g, dv, med_cents,
                   CAST(sum(cnt) OVER (PARTITION BY g ORDER BY dv
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM dev_per_value
        ),
        mad AS (
            SELECT g, med_cents, min(dv) AS mad_cents
            FROM dc WHERE 2 * cum >= n GROUP BY g, med_cents
        )
        SELECT vals.g AS event_type, med_cents, mad_cents,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN abs(v - med_cents) > 3 * mad_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM vals JOIN mad ON vals.g = mad.g
        GROUP BY 1, 2, 3
    """,
    section="C14,C11,D3,F14",
    description="MAD-based outlier census per event type: lower median and "
    "median-absolute-deviation both exact integer order statistics (two "
    "per-value aggregations + two distributed prefix scans), outliers = "
    "|v - med| > 3*MAD counted with pure integer comparisons -- the "
    "robust-z monitor that survives the heavy tail a plain z-score melts on",
)
def anomaly_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    vals = ev.select(
        F.col("event_type").alias("g"), cents("value").alias("vc")
    )
    med = lower_median_cents(vals, "g", F.col("vc"))
    devs = vals.join(F.broadcast(med), "g").select(
        "g", "med_cents", F.abs(F.col("vc") - F.col("med_cents")).alias("dv")
    )
    mad = (
        lower_median_cents(devs, "g", F.col("dv"))
        .withColumnRenamed("med_cents", "mad_cents")
    )
    return (
        vals.join(F.broadcast(med), "g")
        .join(F.broadcast(mad), "g")
        .groupBy(
            F.col("g").alias("event_type"), "med_cents", "mad_cents"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (
                    F.abs(F.col("vc") - F.col("med_cents"))
                    > 3 * F.col("mad_cents")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope (median of pairwise slopes)
# ---------------------------------------------------------------------------


@graded(
    "robust_theil_sen",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS d,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS slope,
                   a.d AS d1, b.d AS d2
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        ),
        ranked AS (
            SELECT event_type, slope,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope, d1, d2) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_pairs
            FROM pairs
        )
        SELECT event_type,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               round(slope, 6) AS ts_slope_cents_per_day
        FROM ranked
        WHERE rn = (n_pairs + 1) // 2
    """,
    section="C13,C18,F14",
    description="Theil-Sen robust trend slope per event type: lower median "
    "of all pairwise daily-revenue slopes (30 daily points -> 435 pairs "
    "per type, deterministic slope/day tiebreak) — the outlier-immune "
    "complement to the OLS slope (one corrupted day moves OLS, moves "
    "Theil-Sen not at all up to 29% contamination)",
)
def robust_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairwise join is per-type over the DAILY aggregate — pair count
    is O(days²) per key, independent of row count (the raw scan collapses
    to ~30 points/type first), so the 'quadratic' stage is bounded by the
    calendar, not the data; rank windows are type-partitioned.  Slope
    doubles come from identical integer inputs on both engines, so even
    the sort order is engine-exact."""
    daily = (
        load(spark, "events", sf_dir)
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
        )
        .agg(F.sum(cents("value")).alias("y"))
    )
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("y").alias("y1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("d").alias("d2"),
        F.col("y").alias("y2"),
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2"))
    ).select(
        "event_type",
        ((F.col("y2") - F.col("y1")).cast("double") / (F.col("d2") - F.col("d1"))).alias(
            "slope"
        ),
        "d1",
        "d2",
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("event_type")
    return (
        pairs.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_pairs", F.count("*").over(wn))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round("slope", 6).alias("ts_slope_cents_per_day"),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (binned PAV via the minimax identity)
# ---------------------------------------------------------------------------

_ISO_BIN_WIDTH = 5


@graded(
    "calib_isotonic_binned",
    oracle=f"""
        WITH e AS (
            SELECT CAST(floor(value / {_ISO_BIN_WIDTH}) AS BIGINT) AS bin,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        b AS (
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS s
            FROM e GROUP BY 1
        ),
        c AS (
            SELECT bin, n, s,
                   CAST(sum(n) OVER w AS BIGINT) AS cumn,
                   CAST(sum(s) OVER w AS BIGINT) AS cums
            FROM b WINDOW w AS (ORDER BY bin)
        ),
        p AS (
            SELECT j.bin AS j, k.bin AS k,
                   CAST(k.cums - j.cums + j.s AS DOUBLE)
                       / CAST(k.cumn - j.cumn + j.n AS DOUBLE) AS m
            FROM c j JOIN c k ON j.bin <= k.bin
        ),
        inner_min AS (
            SELECT b.bin, p.j, min(p.m) AS mn
            FROM b JOIN p ON p.j <= b.bin AND p.k >= b.bin
            GROUP BY 1, 2
        )
        SELECT i.bin, b.n AS n_bin,
               round(CAST(b.s AS DOUBLE) / b.n, 6) AS raw_rate,
               round(max(i.mn), 6) AS iso_rate
        FROM inner_min i JOIN b ON i.bin = b.bin
        GROUP BY 1, 2, 3
    """,
    section="C11,C13,F14",
    description="isotonic (monotone) calibration of the purchase rate "
    "against the value bucket — the PAV fit computed via the exact "
    "minimax identity iso_b = max_(j<=b) min_(k>=b) mean(y[j..k]) on the "
    "BINNED aggregate: raw rows collapse to one (n, s) pair per bucket, "
    "then every join/agg runs on the bounded B-bin frame (B ~ 40), so "
    "the B^3 pair work is broadcast-trivial while the corpus pass is a "
    "single map-side-combinable aggregation — the standard probability- "
    "calibration step of an LLM quality-score pipeline, relational and "
    "oracle-exact (integer-ratio doubles, deterministic min/max)",
)
def calib_isotonic_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pool-adjacent-violators without iteration: the minimax identity
    gives the exact L2 isotonic fit from interval means alone, and on
    value-binned data every interval mean is a ratio of prefix-sum
    differences.  The only corpus-scale work is the per-bin aggregation;
    the scan and the triple-bounded (b, j, k) joins run on ~B rows.
    Monotonicity and sum preservation are pinned in pytest against a
    brute-force PAV reference."""
    ev = load(spark, "events", sf_dir)
    bins = (
        ev.select(
            F.floor(F.col("value") / _ISO_BIN_WIDTH).cast("long").alias("bin"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    )
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    # The prefix-summed frame feeds THREE consumers (j, k via the pair
    # join, and b via the inner/rates branches).  The prefix scan's own
    # checkpoint covers only its range-partitioned input — everything
    # above it (sort-window, totals groupBy, offsets join) would replay
    # once per consumer, tripling the exchanges (r14 regression: Exchange
    # 30 -> 38, bench 1.0 -> 2.0 s).  One lazy localCheckpoint on the
    # ~B-row result collapses all branches onto a single tiny RDD
    # (guide §2.4 duplicated subtrees); within-run only, no cross-run
    # state.
    c = (
        distributed_prefix_sums(
            bins.withColumn("__g", F.lit(0)),
            "__g",
            ["bin"],
            {"n": "cumn", "s": "cums"},
        )
        .select("bin", "n", "s", "cumn", "cums")
        .localCheckpoint(eager=False)
    )
    j = c.select(
        F.col("bin").alias("j"),
        F.col("n").alias("nj"),
        F.col("s").alias("sj"),
        F.col("cumn").alias("cumn_j"),
        F.col("cums").alias("cums_j"),
    )
    k = c.select(
        F.col("bin").alias("k"),
        F.col("cumn").alias("cumn_k"),
        F.col("cums").alias("cums_k"),
    )
    pairs = j.join(F.broadcast(k), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("cums_k") - F.col("cums_j") + F.col("sj")).cast("double")
            / (F.col("cumn_k") - F.col("cumn_j") + F.col("nj")).cast("double")
        ).alias("m"),
    )
    # b from the prefix-scanned frame, NOT from `bins`: c carries (bin, n,
    # s) unchanged and sits behind the scan's checkpoint, so reading it
    # here avoids re-running the full events scan+aggregation in the two
    # extra branches (guide §2.4: duplicated subtrees)
    b = c.select(F.col("bin"), F.col("n").alias("n_bin"), F.col("s"))
    inner = (
        b.join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")),
        )
        .groupBy("bin", "j")
        .agg(F.min("m").alias("mn"))
    )
    rates = b.select(
        "bin",
        "n_bin",
        F.round(F.col("s").cast("double") / F.col("n_bin"), 6).alias("raw_rate"),
    )
    # broadcast hint: rates reads the checkpointed ~B-row frame, whose
    # LogicalRDD carries no size stats, so the static planner would fall
    # back to SortMergeJoin (AQE fixes it at runtime, but the hint keeps
    # the plan right from the start — B is bounded at any scale)
    return (
        inner.groupBy("bin")
        .agg(F.round(F.max("mn"), 6).alias("iso_rate"))
        .join(F.broadcast(rates), "bin")
        .select("bin", "n_bin", "raw_rate", "iso_rate")
    )
