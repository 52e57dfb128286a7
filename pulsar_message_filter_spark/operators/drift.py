"""Distribution-drift monitors — the checks a 100 TB training-data
pipeline runs BEFORE a bad batch poisons a model: two-sample KS,
population-stability index (PSI), CUSUM changepoint location, and a
Benford first-digit forensic profile.

Every query here is exact and oracle-checked; the float-parity rules from
``operators/parity.py`` apply throughout (integer counts until the last
double division; ``round`` on both engines).

Scale notes (100 TB):

* **KS** — the naive form sorts both samples globally.  Here the scan is
  (1) a groupBy on the VALUE (collapsing ties and shrinking the data to
  its distinct-value count with a map-side-combinable aggregate), then
  (2) a single two-phase distributed prefix scan
  (:func:`~pulsar_message_filter_spark.functions.prefix.distributed_prefix_sums`)
  that carries BOTH samples' cumulative counts in one pass — no global
  single-partition window anywhere (the repo's pinned plan contract).
* **PSI** — pure fixed-bin histogram: one map-side-combinable groupBy per
  half, a 20-row bin spine broadcast onto it.  Embarrassingly parallel.
* **CUSUM** — the keyed running sum operates on the *aggregated* daily
  series (days × keys rows, bounded by calendar), not raw events; the
  raw-event pass is a plain combinable count.
* **Benford** — a groupBy on (type, digit): 9 digits × key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sums
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents
from pulsar_message_filter_spark.registry import graded


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


def ks_two_sample(
    df: DataFrame, value: str, flag_a, flag_b
) -> DataFrame:
    """One-row frame ``(ks_stat, n_a, n_b)``: the exact two-sample KS
    statistic ``max_v |F_a(v) - F_b(v)|`` between the rows matching
    ``flag_a`` and those matching ``flag_b`` (boolean Columns).

    Ties collapse in the per-value aggregation, so the ECDF step function
    is evaluated once per distinct value — tie handling is therefore
    exact (both ECDFs jump together at a shared value), and the prefix
    scan runs over distinct values, not rows."""
    marked = df.select(
        F.col(value).alias("v"),
        flag_a.cast("int").alias("a"),
        flag_b.cast("int").alias("b"),
    ).filter((F.col("a") == 1) | (F.col("b") == 1))
    per_v = (
        marked.groupBy("v")
        .agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
        .withColumn("g", F.lit(0))
    )
    scanned = distributed_prefix_sums(
        per_v, "g", ["v"], {"na": "cum_a", "nb": "cum_b"}
    )
    totals = marked.agg(
        F.sum("a").alias("n_a"), F.sum("b").alias("n_b")
    )
    return (
        scanned.crossJoin(F.broadcast(totals))
        .select(
            (
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                    - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
                )
            ).alias("d"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks_stat"))
        .select("ks_stat", "n_a", "n_b")
    )


@graded(
    "drift_ks_two_sample",
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
            SELECT CAST(sum(na) OVER (ORDER BY v) AS BIGINT) AS cum_a,
                   CAST(sum(nb) OVER (ORDER BY v) AS BIGINT) AS cum_b
            FROM per_v
        ),
        tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
            FROM marked
        )
        SELECT round(max(abs(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                           - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE))), 6)
                   AS ks_stat,
               n_a, n_b
        FROM scan CROSS JOIN tot
        GROUP BY n_a, n_b
    """,
    section="C11,C20,F14",
    description="exact two-sample Kolmogorov-Smirnov statistic (purchase vs "
    "click value distributions): tie-collapsing per-value aggregation, then "
    "ONE two-phase distributed prefix scan carrying both cumulative counts "
    "-- integer cents keys, integer counts, one double division at the end; "
    "no global single-partition window (pinned plan contract)",
)
def drift_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ks_two_sample(
        ev.withColumn("vc", cents("value")),
        "vc",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
    )


# ---------------------------------------------------------------------------
# Population Stability Index
# ---------------------------------------------------------------------------

_PSI_BINS = 20
_PSI_WIDTH = 25.0


def psi_profile(
    df: DataFrame, value: str, ref_flag, n_bins: int = _PSI_BINS,
    width: float = _PSI_WIDTH,
) -> DataFrame:
    """Per-bin PSI decomposition between the reference rows (``ref_flag``
    true) and the current rows (false): fixed-width value bins (the last
    bin absorbs the tail), Laplace-smoothed proportions so empty bins are
    defined, ``psi_term = (p_cur - p_ref) * ln(p_cur / p_ref)``.

    Fixed-width bins (not quantile bins) keep the profile deterministic
    and cross-engine exact — bin edges never depend on an engine-specific
    quantile estimate."""
    spark = df.sparkSession
    binned = df.select(
        F.least(
            F.floor(F.col(value) / F.lit(width)), F.lit(n_bins - 1)
        ).cast("int").alias("bin"),
        ref_flag.cast("int").alias("is_ref"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").alias("n_ref_bin"),
        F.sum(1 - F.col("is_ref")).alias("n_cur_bin"),
    )
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    totals = binned.agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    filled = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref_bin", F.lit(0)).alias("n_ref_bin"),
            F.coalesce("n_cur_bin", F.lit(0)).alias("n_cur_bin"),
        )
        .crossJoin(F.broadcast(totals))
    )
    p_ref = (F.col("n_ref_bin") + 1.0) / (F.col("n_ref") + F.lit(float(n_bins)))
    p_cur = (F.col("n_cur_bin") + 1.0) / (F.col("n_cur") + F.lit(float(n_bins)))
    return filled.select(
        "bin",
        "n_ref_bin",
        "n_cur_bin",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@graded(
    "drift_psi_value",
    oracle=f"""
        WITH binned AS (
            SELECT CAST(least(floor(value / {_PSI_WIDTH}), {_PSI_BINS - 1}) AS INTEGER)
                       AS bin,
                   CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_ref
            FROM events
        ),
        counts AS (
            SELECT bin, CAST(sum(is_ref) AS BIGINT) AS n_ref_bin,
                   CAST(sum(1 - is_ref) AS BIGINT) AS n_cur_bin
            FROM binned GROUP BY 1
        ),
        spine AS (SELECT unnest(range({_PSI_BINS})) AS bin),
        totals AS (
            SELECT CAST(sum(is_ref) AS BIGINT) AS n_ref,
                   CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
            FROM binned
        ),
        filled AS (
            SELECT CAST(s.bin AS INTEGER) AS bin,
                   coalesce(n_ref_bin, 0) AS n_ref_bin,
                   coalesce(n_cur_bin, 0) AS n_cur_bin,
                   n_ref, n_cur
            FROM spine s LEFT JOIN counts c ON s.bin = c.bin
            CROSS JOIN totals
        )
        SELECT bin, n_ref_bin, n_cur_bin,
               round((n_ref_bin + CAST(1.0 AS DOUBLE))
                     / (n_ref + CAST({float(_PSI_BINS)} AS DOUBLE)), 6) AS p_ref,
               round((n_cur_bin + CAST(1.0 AS DOUBLE))
                     / (n_cur + CAST({float(_PSI_BINS)} AS DOUBLE)), 6) AS p_cur,
               round(((n_cur_bin + CAST(1.0 AS DOUBLE))
                          / (n_cur + CAST({float(_PSI_BINS)} AS DOUBLE))
                      - (n_ref_bin + CAST(1.0 AS DOUBLE))
                          / (n_ref + CAST({float(_PSI_BINS)} AS DOUBLE)))
                     * ln(((n_cur_bin + CAST(1.0 AS DOUBLE))
                               / (n_cur + CAST({float(_PSI_BINS)} AS DOUBLE)))
                          / ((n_ref_bin + CAST(1.0 AS DOUBLE))
                               / (n_ref + CAST({float(_PSI_BINS)} AS DOUBLE)))),
                     6) AS psi_term
        FROM filled
    """,
    section="C11,C5,D3,F14",
    description="population-stability index per fixed-width value bin "
    "(first vs second half of the month): Laplace-smoothed proportions "
    "from integer counts, 20-row broadcast bin spine, map-side-combinable "
    "histogram -- the drift pre-check a training-batch gate runs",
)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return psi_profile(ev, "value", F.dayofmonth("ts") <= 15)


# ---------------------------------------------------------------------------
# CUSUM changepoint location
# ---------------------------------------------------------------------------


@graded(
    "changepoint_cusum",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS c,
                   CAST(sum(n) AS BIGINT) AS s1,
                   CAST(sum(n * n) AS BIGINT) AS s2
            FROM daily GROUP BY 1
        ),
        scanned AS (
            SELECT d.day, d.event_type, s.c,
                   CAST(sum(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day)
                        AS BIGINT) AS cum_n,
                   CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
                        AS BIGINT) AS t,
                   CAST(s.s1 AS DOUBLE) / s.c AS mu,
                   sqrt(CAST(s.c * s.s2 - s.s1 * s.s1 AS DOUBLE)
                        / (s.c * (s.c - 1))) AS sd
            FROM daily d JOIN stats s USING (event_type)
        ),
        scored AS (
            SELECT day, event_type, c,
                   abs((CAST(cum_n AS DOUBLE) - t * mu) / sd) AS abs_s
            FROM scanned
        ),
        ranked AS (
            SELECT day, event_type, c, abs_s,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY abs_s DESC, day) AS rk
            FROM scored
        )
        SELECT event_type, day AS change_day, round(abs_s, 6) AS score,
               c AS n_days
        FROM ranked WHERE rk = 1
    """,
    section="C11,C18,C20,D3",
    description="CUSUM changepoint locator per event type: standardized "
    "cumulative deviation of daily counts, argmax |S_t| with earliest-day "
    "tiebreak -- integer prefix sums over the AGGREGATED calendar series "
    "(days x keys rows), mean/std derived bit-exactly from integer moments",
)
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("c"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    # The keyed window scans the aggregated series: |days| x |keys| rows,
    # bounded by calendar x key cardinality -- never the raw events.
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cum_n", F.sum("n").over(w))
        .withColumn(
            "t", F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        )
        .withColumn("mu", F.col("s1").cast("double") / F.col("c"))
        .withColumn(
            "sd",
            F.sqrt(
                (F.col("c") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
                / (F.col("c") * (F.col("c") - 1))
            ),
        )
        .withColumn(
            "abs_s",
            F.abs(
                (F.col("cum_n").cast("double") - F.col("t") * F.col("mu"))
                / F.col("sd")
            ),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(F.desc("abs_s"), "day")
    return (
        scanned.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round("abs_s", 6).alias("score"),
            F.col("c").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensic profile
# ---------------------------------------------------------------------------


@graded(
    "drift_benford_profile",
    oracle="""
        WITH digits AS (
            SELECT event_type,
                   CAST(regexp_extract(printf('%.4f', value), '[1-9]') AS INTEGER)
                       AS digit
            FROM events WHERE value > 0
        ),
        counts AS (
            SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_d
            FROM digits GROUP BY 1, 2
        ),
        spine AS (
            SELECT t.event_type, CAST(d.digit AS INTEGER) AS digit
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
        ),
        totals AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM digits GROUP BY 1
        )
        SELECT s.event_type, s.digit,
               coalesce(n_d, 0) AS n_obs,
               round(CAST(coalesce(n_d, 0) AS DOUBLE) / n, 6) AS p_obs,
               round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / s.digit), 6)
                   AS p_benford,
               round(pow(coalesce(n_d, 0)
                         - n * log10(CAST(1.0 AS DOUBLE)
                                     + CAST(1.0 AS DOUBLE) / s.digit), 2)
                     / (n * log10(CAST(1.0 AS DOUBLE)
                                  + CAST(1.0 AS DOUBLE) / s.digit)), 4)
                   AS chi2_term
        FROM spine s
        LEFT JOIN counts c ON s.event_type = c.event_type AND s.digit = c.digit
        JOIN totals t ON t.event_type = s.event_type
    """,
    section="C11,D1,D3,B8",
    description="Benford first-significant-digit profile per event type "
    "with per-digit chi-square terms: digit extracted from a fixed %.4f "
    "rendering (rounding at the 5th decimal can never move a first "
    "significant digit of a value >= 0.01), expected mass log10(1+1/d), "
    "9-digit broadcast spine so absent digits report zero",
)
def drift_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    digits = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.regexp_extract(
            F.format_string("%.4f", F.col("value")), "[1-9]", 0
        ).cast("int").alias("digit"),
    )
    counts = digits.groupBy("event_type", "digit").agg(F.count("*").alias("n_d"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
        )
    )
    totals = digits.groupBy("event_type").agg(F.count("*").alias("n"))
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        spine.join(counts, ["event_type", "digit"], "left")
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "digit",
            F.coalesce("n_d", F.lit(0)).alias("n_obs"),
            F.round(
                F.coalesce("n_d", F.lit(0)).cast("double") / F.col("n"), 6
            ).alias("p_obs"),
            F.round(p_exp, 6).alias("p_benford"),
            F.round(
                F.pow(
                    F.coalesce("n_d", F.lit(0)) - F.col("n") * p_exp, F.lit(2)
                )
                / (F.col("n") * p_exp),
                4,
            ).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Mid-rank quantile normalization (per-source score calibration)
# ---------------------------------------------------------------------------


@graded(
    "f48_quantile_normalize",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source, n_chars,
                   CAST(count(*) OVER (PARTITION BY source ORDER BY n_chars
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_le,
                   CAST(count(*) OVER (PARTITION BY source, n_chars) AS BIGINT)
                       AS ties,
                   CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM documents
        )
        SELECT doc_id, source, n_chars,
               round((cum_le - CAST(0.5 AS DOUBLE) * ties) / n, 6) AS pct
        FROM ranked
    """,
    section="C11,C20,F13,F14",
    description="mid-rank quantile normalization of document length within "
    "each source (pct = (rank_lt + ties/2)/n): computed as a per-(source, "
    "value) count table run through the two-phase distributed prefix scan "
    "and equi-joined back to the documents -- NO per-row keyed window, so "
    "a 20-source corpus of 10^9 docs never serializes a source into one "
    "task; this is the cross-domain score calibration a quality-weighted "
    "sampler needs before comparing scores across sources",
)
def f48_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    per_v = docs.groupBy("source", "n_chars").agg(F.count("*").alias("ties"))
    scanned = distributed_prefix_sums(
        per_v, "source", ["n_chars"], {"ties": "cum_le"}, total_col="n"
    )
    return docs.select("doc_id", "source", "n_chars").join(
        scanned.select("source", "n_chars", "cum_le", "ties", "n"),
        ["source", "n_chars"],
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.round(
            (F.col("cum_le") - F.lit(0.5) * F.col("ties")) / F.col("n"), 6
        ).alias("pct"),
    )


# ---------------------------------------------------------------------------
# Cross-tab association: Cramér's V and pointwise mutual information
# ---------------------------------------------------------------------------


@graded(
    "crosstab_cramers_v",
    oracle="""
        WITH cells AS (
            SELECT event_type AS r, CAST(dayofweek(ts) AS INTEGER) AS c,
                   CAST(count(*) AS BIGINT) AS n_rc
            FROM events GROUP BY 1, 2
        ),
        row_tot AS (SELECT r, CAST(sum(n_rc) AS BIGINT) AS n_r FROM cells GROUP BY 1),
        col_tot AS (SELECT c, CAST(sum(n_rc) AS BIGINT) AS n_c FROM cells GROUP BY 1),
        n AS (SELECT CAST(sum(n_rc) AS BIGINT) AS n,
                     CAST((SELECT count(*) FROM row_tot) AS BIGINT) AS n_rows,
                     CAST((SELECT count(*) FROM col_tot) AS BIGINT) AS n_cols
              FROM cells),
        terms AS (
            SELECT (CAST(n_rc AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                   * (CAST(n_rc AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                   / (CAST(n_r AS DOUBLE) * n_c / n) AS t,
                   n, n_rows, n_cols
            FROM cells JOIN row_tot USING (r) JOIN col_tot USING (c)
            CROSS JOIN n
        )
        SELECT round(sqrt(sum(t) / (n * least(n_rows - 1, n_cols - 1))), 4)
                   AS cramers_v,
               n, n_rows, n_cols
        FROM terms GROUP BY n, n_rows, n_cols
    """,
    section="C11,C17,D3,F14",
    description="Cramer's V association between event type and day-of-week: "
    "contingency cells, row/column marginals, chi-square from expected "
    "counts (one double expression per cell from integer inputs), "
    "normalized by n*min(r-1,c-1) -- the scale-free 'is usage pattern "
    "tied to weekday' monitor; rounded at 4dp to absorb the per-cell "
    "summation-order ULP",
)
def crosstab_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        F.dayofweek("ts").cast("int").alias("c"),
    ).agg(F.count("*").alias("n_rc"))
    row_tot = cells.groupBy("r").agg(F.sum("n_rc").alias("n_r"))
    col_tot = cells.groupBy("c").agg(F.sum("n_rc").alias("n_c"))
    n = cells.agg(
        F.sum("n_rc").alias("n"),
        F.countDistinct("r").alias("n_rows"),
        F.countDistinct("c").alias("n_cols"),
    )
    expected = F.col("n_r").cast("double") * F.col("n_c") / F.col("n")
    t = (
        (F.col("n_rc").cast("double") - expected)
        * (F.col("n_rc").cast("double") - expected)
        / expected
    )
    return (
        cells.join(F.broadcast(row_tot), "r")
        .join(F.broadcast(col_tot), "c")
        .crossJoin(F.broadcast(n))
        .select(t.alias("t"), "n", "n_rows", "n_cols")
        .groupBy("n", "n_rows", "n_cols")
        .agg(
            F.round(
                F.sqrt(
                    F.sum("t")
                    / (
                        F.col("n")
                        * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                    )
                ),
                4,
            ).alias("cramers_v")
        )
        .select("cramers_v", "n", "n_rows", "n_cols")
    )


@graded(
    "mi_type_hour_profile",
    oracle="""
        WITH cells AS (
            SELECT event_type, CAST(hour(ts) AS INTEGER) AS h,
                   CAST(count(*) AS BIGINT) AS n_xy
            FROM events GROUP BY 1, 2
        ),
        xm AS (SELECT event_type, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
        ym AS (SELECT h, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
        n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells)
        SELECT event_type, h, n_xy,
               round((CAST(n_xy AS DOUBLE) / n)
                     * ln((CAST(n_xy AS DOUBLE) * n)
                          / (CAST(n_x AS DOUBLE) * n_y)), 6) AS mi_term
        FROM cells JOIN xm USING (event_type) JOIN ym USING (h)
        CROSS JOIN n
    """,
    section="C11,D2,D3,F14",
    description="per-cell mutual-information decomposition of (event type x "
    "hour-of-day): p_xy*ln(p_xy*n/(p_x*p_y)) from integer counts and "
    "marginals -- emitted per cell (not summed) so every term is one "
    "deterministic double expression; positive cells mark the hours a "
    "type over-indexes, the temporal-profile fingerprint of a workload",
)
def mi_type_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("h")
    ).agg(F.count("*").alias("n_xy"))
    xm = cells.groupBy("event_type").agg(F.sum("n_xy").alias("n_x"))
    ym = cells.groupBy("h").agg(F.sum("n_xy").alias("n_y"))
    n = cells.agg(F.sum("n_xy").alias("n"))
    return (
        cells.join(F.broadcast(xm), "event_type")
        .join(F.broadcast(ym), "h")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "h",
            "n_xy",
            F.round(
                (F.col("n_xy").cast("double") / F.col("n"))
                * F.log(
                    (F.col("n_xy").cast("double") * F.col("n"))
                    / (F.col("n_x").cast("double") * F.col("n_y"))
                ),
                6,
            ).alias("mi_term"),
        )
    )


# ---------------------------------------------------------------------------
# Exact Wasserstein-1 (earth mover) distance between two samples
# ---------------------------------------------------------------------------


@graded(
    "drift_wasserstein",
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
            SELECT v,
                   CAST(sum(na) OVER w AS BIGINT) AS cum_a,
                   CAST(sum(nb) OVER w AS BIGINT) AS cum_b,
                   lead(v) OVER w AS v_next
            FROM per_v
            WINDOW w AS (ORDER BY v)
        ),
        tot AS (
            SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b
            FROM marked
        )
        SELECT round(CAST(sum(abs(cum_a * n_b - cum_b * n_a)
                               * (v_next - v)) AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 4)
                   AS w1_cents,
               n_a, n_b
        FROM scan CROSS JOIN tot
        WHERE v_next IS NOT NULL
        GROUP BY n_a, n_b
    """,
    section="C11,C20,F14",
    description="exact Wasserstein-1 (earth mover) distance between the "
    "purchase and click value distributions: W1 = sum over distinct values "
    "of |F_a - F_b| * gap, carried as the INTEGER |cumA*nB - cumB*nA| * gap "
    "so the whole integral is exact until one final division — the "
    "magnitude-aware drift measure KS's max-gap misses (KS says IF "
    "distributions differ; W1 says by HOW MUCH value)",
)
def drift_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tie-collapsed distinct-value prefix scan as the KS statistic
    (scan input = value cardinality, not row count — ladder exponent
    ~0.06), with the neighbor gap obtained by a rank+1 equi-join on the
    scan's own row number rather than a global lead() window."""
    ev = load(spark, "events", sf_dir)
    marked = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        cents("value").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("a"),
        (F.col("event_type") == "click").cast("int").alias("b"),
    )
    per_v = (
        marked.groupBy("v")
        .agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
        .withColumn("g", F.lit(0))
        .withColumn("one", F.lit(1).cast("long"))
    )
    scanned = distributed_prefix_sums(
        per_v, "g", ["v"], {"na": "cum_a", "nb": "cum_b", "one": "rnk"}
    )
    nxt = scanned.select(F.col("v").alias("v_next"), (F.col("rnk") - 1).alias("rnk"))
    totals = marked.agg(F.sum("a").alias("n_a"), F.sum("b").alias("n_b"))
    return (
        scanned.join(nxt, "rnk")  # rank+1 equi-join supplies the gap
        .crossJoin(F.broadcast(totals))
        .select(
            # decimal(38,0) partials: cum*n ~ 9e12 at the x64 leg already
            # sits within an order of magnitude of int64 max once scaled by
            # cents gaps; past that non-ANSI Spark wraps silently while
            # DuckDB's HUGEINT errors loudly (agg_gini_exact pattern).
            (
                F.abs(
                    F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
                )
                * (F.col("v_next") - F.col("v"))
            ).alias("term"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.round(
                F.sum("term").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                4,
            ).alias("w1_cents")
        )
        .select("w1_cents", "n_a", "n_b")
    )
