"""Argument aggregates, ties-aware top-k, rolling correlation, residual
diagnostics, and group-median imputation.

Five relational/statistics gaps closed with the repo's exactness toolkit
(integer-cents sums, decimal(38,0) partials, the distributed prefix scan
for low-cardinality keys):

* ``agg_argminmax`` — MAX_BY/MIN_BY with a deterministic tiebreak via
  struct ordering (the engine-portable form of ``arg_max``).
* ``topk_with_ties`` — SQL:2008 ``FETCH FIRST k WITH TIES`` per group,
  computed from per-value counts + the distributed prefix scan: rank of
  a distinct value = cumulative count above it + 1.  Never a per-row
  keyed window (3 group keys over 10⁸ rows would serialize).
* ``window_rolling_corr`` — 7-day rolling Pearson correlation between
  daily event count and daily value, from exact integer frame sums
  (the window runs on the DAILY pre-aggregate — thousands of rows at
  any corpus size — so the low-cardinality-key concern doesn't apply).
* ``regression_residual_profile`` — OLS fit diagnostics (r², residual
  RMSE) per group from one pass of exact power sums; extends
  ``timeseries_trend_slope`` (slope/intercept) with goodness-of-fit.
* ``impute_group_median`` — fill deterministic "missing" values with the
  per-group lower median (exact order statistic, `robust.py`) and report
  the post-imputation mean from integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sum
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.operators.robust import lower_median_cents
from pulsar_message_filter_spark.registry import graded

# ---------------------------------------------------------------------------
# MAX_BY / MIN_BY with deterministic tiebreaks
# ---------------------------------------------------------------------------


@graded(
    "agg_argminmax",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority AS p,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                   o_orderkey AS k
            FROM orders
        ),
        mx AS (
            SELECT p, v, k,
                   row_number() OVER (PARTITION BY p ORDER BY v DESC, k DESC) AS rn
            FROM c
        ),
        mn AS (
            SELECT p, v, k,
                   row_number() OVER (PARTITION BY p ORDER BY v ASC, k ASC) AS rn
            FROM c
        )
        SELECT mx.p AS o_orderpriority,
               mx.v AS max_price_cents, mx.k AS max_orderkey,
               mn.v AS min_price_cents, mn.k AS min_orderkey
        FROM mx JOIN mn ON mx.p = mn.p AND mx.rn = 1 AND mn.rn = 1
    """,
    section="C11,C13",
    description="MAX_BY/MIN_BY per group with deterministic tiebreaks via "
    "struct-ordering aggregation — one map-side-combinable pass, no window",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    v = cents("o_totalprice")
    pair = F.struct(v.alias("v"), F.col("o_orderkey").alias("k"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.max(pair).alias("mx"), F.min(pair).alias("mn"))
        .select(
            "o_orderpriority",
            F.col("mx.v").alias("max_price_cents"),
            F.col("mx.k").alias("max_orderkey"),
            F.col("mn.v").alias("min_price_cents"),
            F.col("mn.k").alias("min_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k WITH TIES from per-value counts + distributed prefix scan
# ---------------------------------------------------------------------------

_TIES_K = 3


@graded(
    "topk_with_ties",
    oracle=f"""
        WITH pv AS (
            SELECT l_returnflag AS g,
                   {cents_sql('l_extendedprice')} AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY 1, 2
        ),
        c AS (
            SELECT g, v, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v DESC
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM pv
        )
        SELECT g AS l_returnflag, v AS price_cents,
               cum - cnt + 1 AS rnk, cnt AS n_at_value
        FROM c WHERE cum - cnt + 1 <= {_TIES_K}
    """,
    section="C18,C21,F14",
    description="FETCH FIRST 3 WITH TIES per group: per-value pre-agg + "
    "distributed prefix scan gives rank = rows-above + 1 without a per-row "
    "keyed window (3 group keys would serialize it at scale)",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    pv = (
        li.select(
            F.col("l_returnflag").alias("g"),
            cents("l_extendedprice").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count("*").alias("cnt"))
        .withColumn("neg_v", -F.col("v"))
    )
    cum = distributed_prefix_sum(pv, "g", ["neg_v"], "cnt", out_col="cum")
    rnk = F.col("cum") - F.col("cnt") + 1
    return (
        cum.filter(rnk <= _TIES_K)
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("v").alias("price_cents"),
            rnk.alias("rnk"),
            F.col("cnt").alias("n_at_value"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling correlation over the daily pre-aggregate
# ---------------------------------------------------------------------------

_CORR_DAYS = 7


@graded(
    "window_rolling_corr",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x,
                   CAST(sum({cents_sql('value')}) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        framed AS (
            SELECT event_type, day,
                   CAST(count(*) OVER w AS BIGINT) AS n,
                   CAST(sum(x) OVER w AS BIGINT) AS sx,
                   CAST(sum(y) OVER w AS BIGINT) AS sy,
                   CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
                   CAST(sum(y * y) OVER w AS BIGINT) AS syy,
                   CAST(sum(x * y) OVER w AS BIGINT) AS sxy
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN {_CORR_DAYS - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, CAST(day AS VARCHAR) AS day,
               round((n * sxy - sx * sy) /
                     (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS roll_corr
        FROM framed
        WHERE n = {_CORR_DAYS}
          AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    section="C13,C20,F14",
    description="7-day rolling Pearson correlation (daily event count vs "
    "daily value) from exact integer frame sums over the daily "
    "pre-aggregate — deterministic across engines, window input is "
    "days x types rows at any scale",
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    daily = (
        events.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.count("*").alias("x"),
            F.sum(cents("value")).alias("y"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-( _CORR_DAYS - 1), 0)
    )
    framed = daily.select(
        "event_type",
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        framed.filter(
            (F.col("n") == _CORR_DAYS) & (vx > 0) & (vy > 0)
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("roll_corr"),
        )
    )


# ---------------------------------------------------------------------------
# OLS residual diagnostics from exact power sums
# ---------------------------------------------------------------------------

_ANCHOR_H = 473_352  # 2024-01-01 in hours, shared with timeseries.py


@graded(
    "regression_residual_profile",
    oracle=f"""
        WITH s AS (
            SELECT event_type, count(*) AS n,
                   sum(epoch_us(ts) // 1000000 // 3600 - {_ANCHOR_H}) AS sx,
                   sum({cents_sql('value')}) AS sy,
                   sum((epoch_us(ts) // 1000000 // 3600 - {_ANCHOR_H})
                       * (epoch_us(ts) // 1000000 // 3600 - {_ANCHOR_H})) AS sxx,
                   sum(CAST({cents_sql('value')} AS HUGEINT)
                       * {cents_sql('value')}) AS syy,
                   sum(CAST(epoch_us(ts) // 1000000 // 3600 - {_ANCHOR_H} AS HUGEINT)
                       * {cents_sql('value')}) AS sxy
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT event_type, n,
                   CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cxy,
                   CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS cxx,
                   CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cyy
            FROM s
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               round(cxy / cxx, 6) AS slope_cents_per_hour,
               round((cxy / cxx) * cxy / cyy, 6) AS r2,
               round(sqrt((cyy - (cxy / cxx) * cxy) / n) / 100, 4) AS rmse
        FROM d
    """,
    section="C13,F14",
    description="per-type OLS goodness-of-fit: slope, r-squared and "
    "residual RMSE from ONE pass of exact integer power sums "
    "(decimal(38,0)/HUGEINT partials for the squared terms — the Gini x64 "
    "overflow lesson applied up front)",
)
def regression_residual_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    x = (F.unix_timestamp("ts") / 3600).cast("long") - _ANCHOR_H
    y = cents("value")
    dec = "decimal(38,0)"
    s = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum((y.cast(dec) * y).cast(dec)).alias("syy"),
        F.sum((x.cast(dec) * y).cast(dec)).alias("sxy"),
    )
    n = F.col("n")
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n
    slope = cxy / cxx
    return s.select(
        "event_type",
        n.alias("n"),
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round(slope * cxy / cyy, 6).alias("r2"),
        F.round(F.sqrt((cyy - slope * cxy) / n) / 100, 4).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Group-median imputation
# ---------------------------------------------------------------------------

_MISS_THR = "20"  # md5-prefix < '20' → ~12.5% of rows "missing"


@graded(
    "impute_group_median",
    oracle=f"""
        WITH flagged AS (
            SELECT event_type, value,
                   substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '{_MISS_THR}' AS miss
            FROM events
        ),
        pv AS (
            SELECT event_type, {cents_sql('value')} AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM flagged WHERE NOT miss GROUP BY 1, 2
        ),
        c AS (
            SELECT event_type, v, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS nt
            FROM pv
        ),
        med AS (
            SELECT event_type, min(v) AS med_cents
            FROM c WHERE 2 * cum >= nt GROUP BY event_type
        ),
        agg AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
                   CAST(sum(CASE WHEN NOT miss THEN {cents_sql('value')}
                            ELSE 0 END) AS BIGINT) AS s_cents
            FROM flagged GROUP BY event_type
        )
        SELECT a.event_type, a.n, a.n_missing, m.med_cents,
               round((s_cents + n_missing * med_cents) / 100.0 / n, 4)
                   AS mean_after_impute
        FROM agg a JOIN med m USING (event_type)
    """,
    section="C11,C14,D4,F11",
    description="group-median imputation: deterministic md5-prefix missing "
    "mask, per-group exact lower median fill, post-imputation mean from "
    "integer sums — the null-repair primitive for feature pipelines",
)
def impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    flagged = events.select(
        "event_type",
        "value",
        (
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
            < _MISS_THR
        ).alias("miss"),
    )
    med = lower_median_cents(
        flagged.filter(~F.col("miss")), "event_type", cents("value")
    )
    agg = flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("miss"), 1).otherwise(0)).alias("n_missing"),
        F.sum(F.when(~F.col("miss"), cents("value")).otherwise(0)).alias(
            "s_cents"
        ),
    )
    return agg.join(med, "event_type").select(
        "event_type",
        "n",
        "n_missing",
        "med_cents",
        F.round(
            (F.col("s_cents") + F.col("n_missing") * F.col("med_cents"))
            / 100.0
            / F.col("n"),
            4,
        ).alias("mean_after_impute"),
    )


# ---------------------------------------------------------------------------
# Distributed selection: exact k-th smallest without a global sort
# ---------------------------------------------------------------------------


#: k-points for the distributed-selection query — interpolated into BOTH
#: the oracle SQL and the Spark body so they cannot desynchronize
_KTH_KS = (10, 1000, 25000)


@graded(
    "agg_kth_smallest",
    oracle=f"""
        WITH vals AS (
            SELECT {cents_sql('l_extendedprice')} AS v, count(*) AS c
            FROM lineitem GROUP BY 1
        ),
        scan AS (
            SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                   sum(c) OVER (ORDER BY v) - c AS cum_before
            FROM vals
        ),
        ks AS (SELECT unnest([{", ".join(map(str, _KTH_KS))}]) AS k)
        SELECT k, min(v) AS kth_value_cents
        FROM ks JOIN scan ON cum >= k AND cum_before < k
        GROUP BY 1
    """,
    section="C14,C22,F14",
    description="exact k-th smallest l_extendedprice for k in "
    "(10, 1000, 25000) by distributed selection: per-value counts, "
    "two-phase prefix scan, integer threshold cut — the order statistic "
    "WITHOUT a global sort (contrast C22's TakeOrderedAndProject, which "
    "materializes k rows: this shape answers k = billions at 100 TB "
    "where top-k collection cannot)",
)
def agg_kth_smallest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection via counting, not sorting: aggregate to (value, count) —
    the shuffle collapses to value cardinality, bounded for cents — then
    one distributed prefix scan gives the rank span [cum_before, cum] each
    value covers, and k-th smallest = the value whose span contains k.
    Ks exceeding the row count simply emit nothing (mirrored in the
    oracle: its join finds no covering span)."""
    ks = list(_KTH_KS)
    vals = (
        load(spark, "lineitem", sf_dir)
        .select(cents("l_extendedprice").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .withColumn("g", F.lit(0))
    )
    scan = distributed_prefix_sum(vals, "g", ["v"], "c", "cum").withColumn(
        "cum_before", F.col("cum") - F.col("c")
    )
    ks_df = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k")
    )
    return (
        scan.join(
            F.broadcast(ks_df),
            (F.col("cum") >= F.col("k")) & (F.col("cum_before") < F.col("k")),
        )
        .groupBy("k")
        .agg(F.min("v").alias("kth_value_cents"))
    )
