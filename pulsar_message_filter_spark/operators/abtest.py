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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Mann–Whitney U (rank-sum) with tie correction — exact integer ranks
# ---------------------------------------------------------------------------


@graded(
    "abtest_mann_whitney",
    oracle="""
        WITH marked AS (
            SELECT CAST(round(value * 100) AS BIGINT) AS v,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        per_v AS (
            SELECT v, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
            FROM marked GROUP BY 1
        ),
        scan AS (
            SELECT na, nb,
                   CAST(sum(na + nb) OVER (ORDER BY v) AS BIGINT) AS cum_t
            FROM per_v
        ),
        agg AS (
            SELECT CAST(sum(na) AS BIGINT) AS n_a,
                   CAST(sum(nb) AS BIGINT) AS n_b,
                   CAST(sum(na * (2 * cum_t - na - nb + 1)) AS BIGINT) AS r2_a,
                   CAST(sum((na + nb) * (na + nb) * (na + nb) - (na + nb))
                        AS BIGINT) AS tie_t
            FROM scan
        )
        SELECT n_a, n_b,
               CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
               round(
                   (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) - CAST(n_a * n_b AS DOUBLE))
                   / (2.0 * sqrt(
                       CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                       * ((n_a + n_b + 1)
                          - CAST(tie_t AS DOUBLE)
                            / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))))),
                   4) AS z
        FROM agg
    """,
    section="C11,C20,F14",
    description="Mann-Whitney U rank-sum test (purchase vs click values) "
    "with tie-corrected normal approximation: average ranks carried as the "
    "INTEGER 2*rank (2*cum - t + 1 per tied group), U and the tie term "
    "exact integers from one distinct-value prefix scan, doubles only in "
    "the final z — the distribution-free complement to Welch's t",
)
def abtest_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same distinct-value collapse + prefix scan as KS/W1 (the scan input
    is value cardinality, not rows), so the rank statistic that textbooks
    describe via a global sort never sorts anything globally: tied ranks
    are computed per distinct value from the cumulative count."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    ev = load(spark, "events", sf_dir)
    marked = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        cents("value").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("a"),
        (F.col("event_type") == "click").cast("int").alias("b"),
    )
    per_v = (
        marked.groupBy("v")
        .agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
        .withColumn("t", F.col("na") + F.col("nb"))
        .withColumn("g", F.lit(0))
    )
    scanned = distributed_prefix_sums(per_v, "g", ["v"], {"t": "cum_t"})
    # decimal(38,0) partials for the rank-weighted and t^3 tie sums: at
    # corpus scale t ~ 2.1M ties already puts t^3 past 2^63, where non-ANSI
    # Spark wraps silently while DuckDB's HUGEINT errors loudly (the
    # asymmetric-overflow class agg_gini_exact fixed the same way).
    td = F.col("t").cast("decimal(38,0)")
    nad = F.col("na").cast("decimal(38,0)")
    agg = scanned.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(nad * (2 * F.col("cum_t") - F.col("t") + 1)).alias("r2_a"),
        F.sum(td * td * td - td).alias("tie_t"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u2 = F.col("r2_a") - n_a * (n_a + 1)
    n = n_a + n_b
    sigma2 = (
        n_a.cast("double") * n_b.cast("double") / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_t").cast("double") / (n.cast("double") * (n - 1))
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        u2.cast("long").alias("u2_a"),
        F.round(
            (u2.cast("double") - (n_a * n_b).cast("double"))
            / (2.0 * F.sqrt(sigma2)),
            4,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap CI — the distributed bootstrap, deterministic hashes
# ---------------------------------------------------------------------------

#: Poisson(1) CDF steps P(X <= k), k = 0..3; weights cap at 4 (P(X>4) ~ 0.4%,
#: a documented truncation, identical on both engines by construction).
_POIS_C0 = 0.36787944117144233
_POIS_C1 = 0.7357588823428847
_POIS_C2 = 0.9196986029286058
_POIS_C3 = 0.9810118431238462

_BOOT_REPS = 64


@graded(
    "abtest_poisson_bootstrap",
    oracle=f"""
        WITH base AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v
            FROM events WHERE event_type = 'purchase'
        ),
        reps AS (SELECT unnest(generate_series(1, {_BOOT_REPS})) AS r),
        drawn AS (
            SELECT r, v,
                   (CAST(list_sum(list_transform(generate_series(1, 8), i ->
                        (strpos('0123456789abcdef',
                                substr(md5(CAST(event_id AS VARCHAR) || ':'
                                           || CAST(r AS VARCHAR)), i, 1)) - 1)
                        * (16 ** (8 - i)))) AS BIGINT) + 0.5) / 4294967296.0
                       AS u
            FROM base CROSS JOIN reps
        ),
        weighted AS (
            SELECT r, v,
                   CASE WHEN u < {_POIS_C0} THEN 0
                        WHEN u < {_POIS_C1} THEN 1
                        WHEN u < {_POIS_C2} THEN 2
                        WHEN u < {_POIS_C3} THEN 3
                        ELSE 4 END AS w
            FROM drawn
        ),
        per_rep AS (
            SELECT r,
                   CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_r
            FROM weighted GROUP BY r HAVING sum(w) > 0
        ),
        ranked AS (
            SELECT mean_r, row_number() OVER (ORDER BY mean_r, r) AS rn,
                   count(*) OVER () AS n_reps
            FROM per_rep
        ),
        full_mean AS (
            SELECT CAST(sum(v) AS DOUBLE) / count(*) AS mean_full,
                   CAST(count(*) AS BIGINT) AS n
            FROM base
        )
        SELECT f.n, round(f.mean_full, 4) AS mean_full,
               round(lo.mean_r, 4) AS ci_lo,
               round(hi.mean_r, 4) AS ci_hi,
               CAST(lo.n_reps AS BIGINT) AS n_reps
        FROM full_mean f
        CROSS JOIN (SELECT mean_r, n_reps FROM ranked
                    WHERE rn = greatest(1, (5 * n_reps) // 100)) lo
        CROSS JOIN (SELECT mean_r, n_reps FROM ranked
                    WHERE rn = n_reps - greatest(1, (5 * n_reps) // 100) + 1) hi
    """,
    section="C11,F14,C18",
    description="Poisson bootstrap 90% CI for the mean purchase value "
    "(Chamandy et al.'s distributed bootstrap, public): per (row, "
    "replicate) resample weights are Poisson(1) draws via md5-derived "
    "uniforms against hardcoded CDF steps (weights capped at 4, "
    "engine-exact by construction) — no RNG state, no row shuffling; 64 "
    "replicate means, order-statistic CI bounds",
)
def abtest_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE distributed bootstrap: classical resampling needs n draws WITH
    replacement per replicate (a global shuffle per replicate); the
    Poisson approximation gives each row an independent Poisson(1)
    multiplicity, so all {reps} replicates are computed in ONE pass over
    the data as a (row x replicate) weight explode + keyed aggregation.
    Hash-derived uniforms make the 'randomness' content-addressed:
    engine- and topology-independent, re-runnable, and oracle-checkable
    — the same property every sampler in this repo relies on."""
    ev = load(spark, "events", sf_dir).filter(F.col("event_type") == "purchase")
    base = ev.select("event_id", cents("value").alias("v"))
    reps = spark.range(1, _BOOT_REPS + 1).select(F.col("id").cast("int").alias("r"))
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("r").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    w = (
        F.when(u < _POIS_C0, 0)
        .when(u < _POIS_C1, 1)
        .when(u < _POIS_C2, 2)
        .when(u < _POIS_C3, 3)
        .otherwise(4)
    )
    per_rep = (
        base.crossJoin(F.broadcast(reps))
        .select("r", "v", w.alias("w"))
        .groupBy("r")
        .agg(F.sum(F.col("w") * F.col("v")).alias("sw_v"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("r", (F.col("sw_v").cast("double") / F.col("sw").cast("double")).alias("mean_r"))
    )
    wr = Window.orderBy("mean_r", "r")  # bounded: _BOOT_REPS rows
    ranked = per_rep.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n_reps", F.count("*").over(Window.partitionBy())
    )
    k = F.greatest(F.lit(1), F.expr("(5 * n_reps) div 100"))
    lo = ranked.filter(F.col("rn") == k).select(
        F.col("mean_r").alias("lo"), "n_reps"
    )
    hi = ranked.filter(F.col("rn") == F.col("n_reps") - k + 1).select(
        F.col("mean_r").alias("hi")
    )
    full = base.agg(
        (F.sum("v").cast("double") / F.count("*")).alias("mean_full"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n",
            F.round("mean_full", 4).alias("mean_full"),
            F.round("lo", 4).alias("ci_lo"),
            F.round("hi", 4).alias("ci_hi"),
            F.col("n_reps").cast("long").alias("n_reps"),
        )
    )


@graded(
    "abtest_ratio_bootstrap",
    oracle=f"""
        WITH base AS (
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        reps AS (SELECT unnest(generate_series(1, {_BOOT_REPS})) AS r),
        drawn AS (
            SELECT r, v, is_p,
                   (CAST(list_sum(list_transform(generate_series(1, 8), i ->
                        (strpos('0123456789abcdef',
                                substr(md5(CAST(event_id AS VARCHAR) || ':'
                                           || CAST(r AS VARCHAR)), i, 1)) - 1)
                        * (16 ** (8 - i)))) AS BIGINT) + 0.5) / 4294967296.0
                       AS u
            FROM base CROSS JOIN reps
        ),
        weighted AS (
            SELECT r, v, is_p,
                   CASE WHEN u < {_POIS_C0} THEN 0
                        WHEN u < {_POIS_C1} THEN 1
                        WHEN u < {_POIS_C2} THEN 2
                        WHEN u < {_POIS_C3} THEN 3
                        ELSE 4 END AS w
            FROM drawn
        ),
        per_rep AS (
            SELECT r,
                   CAST(sum(w * v * is_p) AS DOUBLE)
                       / CAST(sum(w * v * (1 - is_p)) AS DOUBLE) AS ratio_r
            FROM weighted GROUP BY r
            HAVING sum(w * v * (1 - is_p)) > 0
        ),
        ranked AS (
            SELECT ratio_r, row_number() OVER (ORDER BY ratio_r, r) AS rn,
                   count(*) OVER () AS n_reps
            FROM per_rep
        ),
        full_ratio AS (
            SELECT CAST(sum(v * is_p) AS DOUBLE)
                       / CAST(sum(v * (1 - is_p)) AS DOUBLE) AS ratio_full
            FROM base
        )
        SELECT round(f.ratio_full, 6) AS ratio_full,
               round(lo.ratio_r, 6) AS ci_lo,
               round(hi.ratio_r, 6) AS ci_hi,
               CAST(lo.n_reps AS BIGINT) AS n_reps
        FROM full_ratio f
        CROSS JOIN (SELECT ratio_r, n_reps FROM ranked
                    WHERE rn = greatest(1, (5 * n_reps) // 100)) lo
        CROSS JOIN (SELECT ratio_r, n_reps FROM ranked
                    WHERE rn = n_reps - greatest(1, (5 * n_reps) // 100) + 1) hi
    """,
    section="C11,F14,C18",
    description="Poisson-bootstrap 90% CI for a RATIO metric "
    "(purchase-to-click revenue ratio): the nonlinear statistic where the "
    "delta-method is shakiest and resampling earns its keep — same "
    "one-pass hash-derived Poisson(1) weights as abtest_poisson_bootstrap "
    "with numerator and denominator drawn from the SAME replicate "
    "(correlation preserved, the whole point of bootstrapping a ratio)",
)
def abtest_ratio_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sums share one replicate weight per event, so the replicate
    ratios carry the real numerator/denominator correlation; everything
    else follows the mean-bootstrap machinery."""
    ev = load(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    )
    base = ev.select(
        "event_id",
        cents("value").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    reps = spark.range(1, _BOOT_REPS + 1).select(
        F.col("id").cast("int").alias("r")
    )
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("r").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(0.5)) / F.lit(4294967296.0)
    w = (
        F.when(u < _POIS_C0, 0)
        .when(u < _POIS_C1, 1)
        .when(u < _POIS_C2, 2)
        .when(u < _POIS_C3, 3)
        .otherwise(4)
    )
    per_rep = (
        base.crossJoin(F.broadcast(reps))
        .select("r", "v", "is_p", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("v") * F.col("is_p")).alias("num"),
            F.sum(F.col("w") * F.col("v") * (1 - F.col("is_p"))).alias("den"),
        )
        .filter(F.col("den") > 0)
        .select(
            "r",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "ratio_r"
            ),
        )
    )
    wr = Window.orderBy("ratio_r", "r")  # bounded: _BOOT_REPS rows
    ranked = per_rep.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n_reps", F.count("*").over(Window.partitionBy())
    )
    k = F.greatest(F.lit(1), F.expr("(5 * n_reps) div 100"))
    lo = ranked.filter(F.col("rn") == k).select(
        F.col("ratio_r").alias("lo"), "n_reps"
    )
    hi = ranked.filter(F.col("rn") == F.col("n_reps") - k + 1).select(
        F.col("ratio_r").alias("hi")
    )
    full = base.agg(
        (
            F.sum(F.col("v") * F.col("is_p")).cast("double")
            / F.sum(F.col("v") * (1 - F.col("is_p"))).cast("double")
        ).alias("ratio_full")
    )
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.round("ratio_full", 6).alias("ratio_full"),
            F.round("lo", 6).alias("ci_lo"),
            F.round("hi", 6).alias("ci_hi"),
            F.col("n_reps").cast("long").alias("n_reps"),
        )
    )


# ---------------------------------------------------------------------------
# Exact ROC-AUC — the rank-sum identity, grouped, no global sort
# ---------------------------------------------------------------------------


@graded(
    "eval_auc_rank",
    oracle="""
        WITH scan AS (
            SELECT l_linestatus AS g,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS np,
                   CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS nn
            FROM lineitem GROUP BY 1, 2
        ),
        c AS (
            SELECT g, v, np, nn, np + nn AS t,
                   sum(np + nn) OVER (PARTITION BY g ORDER BY v
                                      ROWS UNBOUNDED PRECEDING) AS cum_t
            FROM scan
        ),
        agg AS (
            SELECT g,
                   CAST(sum(np) AS BIGINT) AS n_pos,
                   CAST(sum(nn) AS BIGINT) AS n_neg,
                   sum(np * (2 * cum_t - t + 1)) AS r2_pos
            FROM c GROUP BY 1
        )
        SELECT g AS l_linestatus, n_pos, n_neg,
               round((CAST(r2_pos AS DOUBLE)
                      - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                     / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                     6) AS auc,
               round((CAST(r2_pos AS DOUBLE)
                      - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                     / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) - 1.0,
                     6) AS gini
        FROM agg
    """,
    section="C11,C13,C20,F14",
    description="exact ROC-AUC per linestatus (score = price, positive = "
    "returnflag R) via the Mann-Whitney rank-sum identity AUC = "
    "(R⁺ - n⁺(n⁺+1)/2)/(n⁺n⁻) with tie-averaged ranks carried as the "
    "INTEGER 2·rank — the classifier-eval twin of abtest_mann_whitney, "
    "plus the Gini coefficient 2·AUC-1; one per-distinct-value "
    "aggregation + one prefix scan, never a global sort of scores",
)
def eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC is P(score⁺ > score⁻) + ½P(tie): exactly the normalized U
    statistic, so the whole evaluation reduces to per-value counts and a
    cumulative count — the same shape that scores a 100 TB eval set with
    one shuffle on (group, value).  decimal(38,0) partials on the
    rank-weighted sum (rank ~ N makes np·2cum ~ N² — past int64 at
    corpus scale, where non-ANSI Spark would wrap silently while DuckDB's
    HUGEINT errors loudly)."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    li = load(spark, "lineitem", sf_dir)
    per_v = (
        li.select(
            F.col("l_linestatus").alias("g"),
            cents("l_extendedprice").alias("v"),
            (F.col("l_returnflag") == "R").cast("int").alias("p"),
        )
        .groupBy("g", "v")
        .agg(
            F.sum("p").cast("long").alias("np"),
            F.sum(1 - F.col("p")).cast("long").alias("nn"),
        )
        .withColumn("t", F.col("np") + F.col("nn"))
    )
    scanned = distributed_prefix_sums(per_v, "g", ["v"], {"t": "cum_t"})
    npd = F.col("np").cast("decimal(38,0)")
    agg = scanned.groupBy("g").agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(npd * (2 * F.col("cum_t") - F.col("t") + 1)).alias("r2_pos"),
    )
    n_pos_d = F.col("n_pos").cast("double")
    n_neg_d = F.col("n_neg").cast("double")
    u = F.col("r2_pos").cast("double") - n_pos_d * (F.col("n_pos") + 1)
    return agg.select(
        F.col("g").alias("l_linestatus"),
        "n_pos",
        "n_neg",
        F.round(u / (2.0 * n_pos_d * n_neg_d), 6).alias("auc"),
        F.round(u / (n_pos_d * n_neg_d) - 1.0, 6).alias("gini"),
    )
