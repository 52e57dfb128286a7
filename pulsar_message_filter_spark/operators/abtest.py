"""Experimentation analytics — two-proportion z-test, sample-ratio
mismatch, and CUPED variance reduction.

The A/B readout layer a product pipeline runs on top of the event store:
assignment here is the deterministic ``user_id % 2`` hash split (the
fixture has no assignment table; a real deployment joins one in — the
shapes below are unchanged).

Exactness: every statistic reduces to a handful of int64/decimal(38)
aggregates (counts, cents sums, cents cross-products) followed by ONE
double expression — identical operand bits on both engines, so the
6 dp rounding is cosmetic, not load-bearing.  Cross-products of cents
sums use decimal(38,0) partials (the ``agg_gini_exact`` x64 lesson;
DuckDB's HUGEINT is the oracle twin).

Scale (100 TB): per-user pre-aggregation is one map-side-combinable
groupBy on ``user_id`` (uniform keys); the experiment-level moments are
a second tiny aggregation.  Nothing here shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents
from pulsar_message_filter_spark.registry import graded


@graded(
    "abtest_two_proportion",
    oracle="""
        WITH per_user AS (
            SELECT user_id % 2 AS arm,
                   max(CASE WHEN event_type = 'purchase' AND day(ts) <= 3
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
                       AS conv_a,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
                       AS conv_b
            FROM per_user
        )
        SELECT n_a, conv_a, n_b, conv_b,
               round(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
               round(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
               round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                     / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                            * (CAST(1.0 AS DOUBLE) / n_a
                               + CAST(1.0 AS DOUBLE) / n_b)), 6) AS z_stat,
               round((n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                     * (n_a - CAST(n_a + n_b AS DOUBLE) / 2)
                     / (CAST(n_a + n_b AS DOUBLE) / 2)
                     + (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                     * (n_b - CAST(n_a + n_b AS DOUBLE) / 2)
                     / (CAST(n_a + n_b AS DOUBLE) / 2), 6) AS srm_chi2
        FROM arms
    """,
    section="C11,D4,F14",
    description="two-proportion z-test on a deterministic hash split "
    "(user_id parity; conversion = purchase within the first 3 days) with "
    "the pooled-variance z statistic plus a sample-ratio-mismatch "
    "chi-square -- four int64 counts in, two double expressions out; the "
    "experiment readout every growth team runs nightly",
)
def abtest_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 3)
            ).cast("int")
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = per_user.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    half = (F.col("n_a") + F.col("n_b")).cast("double") / 2
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(
            (p_a - p_b)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
            ),
            6,
        ).alias("z_stat"),
        F.round(
            (F.col("n_a") - half) * (F.col("n_a") - half) / half
            + (F.col("n_b") - half) * (F.col("n_b") - half) / half,
            6,
        ).alias("srm_chi2"),
    )


@graded(
    "abtest_cuped",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN day(ts) <= 15
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(sum(CASE WHEN day(ts) > 15
                        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS DOUBLE) AS sx,
                   CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(x * x) AS DOUBLE) AS sxx,
                   CAST(sum(x * y) AS DOUBLE) AS sxy,
                   CAST(sum(y * y) AS DOUBLE) AS syy
            FROM per_user
        )
        SELECT n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
               round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS var_reduction
        FROM m
    """,
    section="C11,C13,F14",
    description="CUPED variance reduction: per-user pre-period (days 1-15) "
    "cents covariate x and post-period metric y, theta = cov(x,y)/var(x) "
    "and the achievable variance reduction rho^2 -- integer cents sums "
    "and HUGEINT/decimal cross-products down to two double expressions; "
    "the pre-experiment covariate adjustment that cuts A/B sample sizes",
)
def abtest_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 15, cents("value")).otherwise(F.lit(0))
        ).alias("x"),
        F.sum(
            F.when(F.dayofmonth("ts") > 15, cents("value")).otherwise(F.lit(0))
        ).alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = per_user.agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "n",
        F.round(cov_n / varx_n, 6).alias("theta"),
        F.round((cov_n * cov_n) / (varx_n * vary_n), 6).alias("var_reduction"),
    )


@graded(
    "abtest_welch_t",
    oracle="""
        WITH per_user AS (
            SELECT user_id % 2 AS arm,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS spend_cents
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT arm, count(*) AS n,
                   sum(CAST(spend_cents AS HUGEINT)) AS s,
                   sum(CAST(spend_cents AS HUGEINT) * spend_cents) AS ss
            FROM per_user GROUP BY arm
        ),
        m AS (
            SELECT arm, CAST(n AS BIGINT) AS n,
                   CAST(s AS DOUBLE) / n AS mean,
                   (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                       / (n - 1) AS var
            FROM arms
        )
        SELECT a.n AS n_a, b.n AS n_b,
               round(a.mean / 100, 4) AS mean_a, round(b.mean / 100, 4) AS mean_b,
               round((a.mean - b.mean)
                     / sqrt(a.var / a.n + b.var / b.n), 6) AS t_stat,
               round(pow(a.var / a.n + b.var / b.n, 2)
                     / (pow(a.var / a.n, 2) / (a.n - 1)
                        + pow(b.var / b.n, 2) / (b.n - 1)), 2) AS welch_df
        FROM m a JOIN m b ON a.arm = 0 AND b.arm = 1
    """,
    section="C13,F14",
    description="Welch two-sample t-test on per-user purchase spend by "
    "deterministic hash arm: unequal-variance t statistic and "
    "Welch-Satterthwaite degrees of freedom, all from exact integer "
    "moments (decimal(38,0)/HUGEINT partials) + one double expression",
)
def abtest_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-metric complement to the two-proportion z-test: the
    unequal-variance (Welch) t-test every experimentation readout needs
    for revenue-like metrics.  Per-user totals are one uniform-key
    groupBy; arm moments are a second tiny aggregation."""
    events = load(spark, "events", sf_dir)
    per_user = events.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents("value")).otherwise(0)
        ).alias("spend_cents")
    ).select((F.col("user_id") % 2).alias("arm"), "spend_cents")
    sd = F.col("spend_cents").cast("decimal(38,0)")
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum(sd).cast("double").alias("s"),
        F.sum(sd * sd).cast("double").alias("ss"),
    )
    n = F.col("n")
    m = arms.select(
        "arm",
        n,
        (F.col("s") / n).alias("mean"),
        ((F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1)).alias("var"),
    )
    a, b = m.alias("a"), m.alias("b")
    se2 = F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    return (
        a.join(b, (F.col("a.arm") == 0) & (F.col("b.arm") == 1))
        .select(
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(F.col("a.mean") / 100, 4).alias("mean_a"),
            F.round(F.col("b.mean") / 100, 4).alias("mean_b"),
            F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(se2), 6).alias(
                "t_stat"
            ),
            F.round(
                F.pow(se2, 2)
                / (
                    F.pow(F.col("a.var") / F.col("a.n"), 2) / (F.col("a.n") - 1)
                    + F.pow(F.col("b.var") / F.col("b.n"), 2) / (F.col("b.n") - 1)
                ),
                2,
            ).alias("welch_df"),
        )
    )
