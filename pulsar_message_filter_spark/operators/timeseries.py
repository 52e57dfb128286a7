"""Time-series operators — dense spine generation and gap-filled resampling.

Event streams are sparse: an hour with no purchases simply has no row, and
every downstream consumer (dashboards, anomaly detectors, training-feature
jobs) wants the *dense* series with explicit zeros / carried-forward
values.  The standard engine idiom implemented here:

1. **spine** — generate the complete (bucket × key) grid from the data's
   own bounds (``sequence``/``explode`` — a generator, not a shuffle);
2. **left join** the sparse aggregates onto the spine;
3. **forward-fill** carried metrics with ``last(col, ignorenulls=True)``
   over an ordered per-key window.

Cross-engine parity: bucket timestamps render as formatted strings; the
carried metric is integer cents (`parity.cents`); counts coalesce to
exact zero.  DuckDB's ``last_value(x IGNORE NULLS)`` is the oracle twin
of Spark's ``last(x, ignorenulls=True)``.

Scale notes (100 TB):

* The hourly aggregation shuffles (bucket, key) partial sums — map-side
  combinable, key space bounded by calendar × key cardinality.
* The spine is tiny by construction (hours × event types); Spark
  broadcasts it onto the aggregated side, so the join adds no exchange.
* The forward-fill window partitions by key and orders by bucket — at
  1000 executors each key's series sorts locally after one keyed
  exchange; no single-partition global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


def hourly_spine(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Dense (hour, key) grid spanning the frame's own time bounds."""
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    return hours.crossJoin(events.select(key_col).distinct())


def gapfill_hourly(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Dense hourly series per key: exact zero counts for empty buckets and
    forward-filled integer-cents value sums."""
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), key_col
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
    )
    spine = hourly_spine(events, key_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["h", key_col], "left")
        .select(
            F.date_format("h", _FMT).alias("hour"),
            key_col,
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce(
                F.last("value_cents", ignorenulls=True).over(w), F.lit(0)
            ).alias("filled_cents"),
        )
    )


def rolling_zscore(
    daily: DataFrame,
    key_col: str,
    order_col: str,
    n_col: str = "n",
    lookback: int = 6,
    min_obs: int = 3,
) -> DataFrame:
    """Trailing-window z-score of a per-(bucket, key) integer metric.

    The moments come from *integer* rolling sums (Σn, Σn², count over the
    trailing frame, current row excluded), so mean/variance derive from
    exact int64s and the final ``(n - mean)/sqrt(var)`` is the same IEEE
    computation on every engine — unlike ``stddev_samp``, whose
    Welford-vs-naive accumulation differs across engines and partition
    orders.  Rows with fewer than ``min_obs`` trailing points or zero
    variance yield NULL z."""
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-lookback, -1)
    n = F.col(n_col)
    s1 = F.sum(n).over(w)
    s2 = F.sum(n * n).over(w)
    c = F.count(n).over(w)
    num = c * s2 - s1 * s1
    z = (n - s1.cast("double") / c) / F.sqrt(num.cast("double") / (c * (c - 1)))
    return daily.select("*", F.when((c >= min_obs) & (num > 0), z).alias("z"))


@graded(
    "anomaly_rolling_zscore",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        rolled AS (
            SELECT day, event_type, n,
                   sum(n) OVER w AS s1,
                   sum(n * n) OVER w AS s2,
                   count(n) OVER w AS c
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
        )
        SELECT day, event_type, n,
               CASE WHEN c >= 3 AND c * s2 - s1 * s1 > 0
                    THEN (n - CAST(s1 AS DOUBLE) / c)
                         / sqrt(CAST(c * s2 - s1 * s1 AS DOUBLE) / (c * (c - 1)))
               END AS z
        FROM rolled
    """,
    section="C20,C19,D3",
    description="rolling-window anomaly scores: trailing 6-day z of daily "
    "event counts from integer-exact moments (sum/sumsq/count frames) -- "
    "bit-identical IEEE across engines, no stddev accumulation drift",
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    daily = events.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    return rolling_zscore(daily, "event_type", "day")


@graded(
    "timeseries_gapfill",
    oracle=f"""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        hours AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
        ),
        spine AS (
            SELECT hours.h, t.event_type
            FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        ),
        hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n_events,
                   CAST(sum({cents_sql('value')}) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        )
        SELECT strftime(s.h, '{_DUCK_FMT}') AS hour,
               s.event_type,
               COALESCE(h.n_events, 0) AS n_events,
               COALESCE(last_value(h.value_cents IGNORE NULLS)
                            OVER (PARTITION BY s.event_type ORDER BY s.h
                                  ROWS UNBOUNDED PRECEDING),
                        0) AS filled_cents
        FROM spine s LEFT JOIN hourly h ON s.h = h.h AND s.event_type = h.event_type
    """,
    section="E1,C19,D2,D5",
    description="gap-filled hourly resample: dense spine from data bounds "
    "(sequence generator, broadcast onto aggregates), exact zero counts, "
    "forward-filled integer-cents sums via last(ignorenulls) windows",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_hourly(load(spark, "events", sf_dir))


# ---------------------------------------------------------------------------
# per-key OLS trend slope (exact power sums)
# ---------------------------------------------------------------------------

#: hours-since-epoch anchor (2024-01-01 00:00 UTC) — keeps x small so the
#: integer power sums stay far inside int64 (x ~ 10^3 at fixture dates)
_TREND_ANCHOR_H = 473_352


@graded(
    "timeseries_trend_slope",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(epoch_us(ts) // 1000000 // 3600 - {_TREND_ANCHOR_H}) AS BIGINT) AS sx,
                   CAST(sum({cents_sql('value')}) AS BIGINT) AS sy,
                   CAST(sum((epoch_us(ts) // 1000000 // 3600 - {_TREND_ANCHOR_H})
                          * (epoch_us(ts) // 1000000 // 3600 - {_TREND_ANCHOR_H})) AS BIGINT) AS sxx,
                   CAST(sum((epoch_us(ts) // 1000000 // 3600 - {_TREND_ANCHOR_H})
                          * {cents_sql('value')}) AS BIGINT) AS sxy
            FROM events GROUP BY 1
        )
        SELECT event_type, n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents_per_hour,
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
                   AS intercept_cents
        FROM s
    """,
    section="F13,C13,D2",
    description="per-type OLS trend: value-vs-time slope and intercept from "
    "exact integer power sums (hour-granularity x anchored at 2024-01-01 "
    "keeps every sum inside int64 out to ~sf100) — the drift/trend monitor "
    "for pipeline metrics, deterministic across engines",
)
def timeseries_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One grouped pass: five integer sums per event_type, then the closed-
    form least-squares line in double on identical int64s (same shape as
    agg_moments_exact / agg_corr_exact)."""
    events = load(spark, "events", sf_dir)
    x = (F.unix_timestamp("ts") / 3600).cast("long") - _TREND_ANCHOR_H
    y = cents("value")
    s = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Recency-weighted activity scoring (step decay)
# ---------------------------------------------------------------------------

_DECAY_ASOF = "2024-02-01"
#: weekly step-decay weights ×8 so every weight is an INTEGER: 8 (this
#: week), 4, 2, 1 (older).  cents × {8,4,2,1} stays exact int64, so the
#: per-user score is order-independent and hash-exact on any engine — the
#: same reason parity.cents exists.  Powers of two = an 8× fixed-point
#: rendering of 1, 1/2, 1/4, 1/8 half-life-per-week decay.
_DECAY_STEPS = ((8, 8), (16, 4), (24, 2))  # (< days, weight×8); else 1


def decay_weight_x8(days_col):
    """Step-decay weight ×8 as an integer Column (halves each week)."""
    w = F.lit(1)
    for lt, wx8 in reversed(_DECAY_STEPS):
        w = F.when(days_col < lt, F.lit(wx8)).otherwise(w)
    return w


@graded(
    "decay_score_asof",
    oracle=f"""
        SELECT user_id, count(*) AS n_events,
               CAST(sum({cents_sql("value")} *
                        CASE WHEN datediff('day', CAST(ts AS DATE),
                                           DATE '{_DECAY_ASOF}') < 8 THEN 8
                             WHEN datediff('day', CAST(ts AS DATE),
                                           DATE '{_DECAY_ASOF}') < 16 THEN 4
                             WHEN datediff('day', CAST(ts AS DATE),
                                           DATE '{_DECAY_ASOF}') < 24 THEN 2
                             ELSE 1 END) AS BIGINT) AS score_x8_cents
        FROM events GROUP BY 1
    """,
    section="C11,D2,F14",
    description="per-user recency score with weekly step decay (weights "
    "8/4/2/1 in 8x fixed point): integer cents x integer weights keeps the "
    "score exact int64 — order-independent, mergeable, hash-exact across "
    "engines; the engagement/recency-scoring primitive without float decay "
    "drift",
)
def decay_score_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single grouped pass; the weight is a CASE on an integer day gap, so
    the whole aggregate stays inside whole-stage codegen with map-side
    partial sums — at 100 TB this is one shuffle keyed by user_id."""
    events = load(spark, "events", sf_dir)
    d = F.datediff(F.lit(_DECAY_ASOF).cast("date"), F.col("ts").cast("date"))
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value") * decay_weight_x8(d)).cast("long").alias("score_x8_cents"),
    )


# ---------------------------------------------------------------------------
# Interval sweep — max concurrency
# ---------------------------------------------------------------------------


def max_concurrency(
    intervals: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Peak number of simultaneously-open intervals per key, via the
    sweep-line trick: explode each interval into a ``+1`` event at start
    and a ``−1`` at end, order by ``(time, delta)`` inside the key (ends
    sort before starts at the same instant — half-open semantics), and
    take the max of the running sum.

    Relational all the way: one union, one distributed prefix sum, one
    max.  The running sum uses ``functions.prefix.distributed_prefix_sum``
    rather than a plain keyed window: sweep keys are usually
    low-cardinality (here: 5 event types), and a keyed window would
    serialize each key's 2n points into one task (the x64 ladder measured
    exponent 0.59 before this change) — the two-phase scan keeps every
    sort partition-parallel while the running sum stays exact."""
    from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sum

    starts = intervals.select(
        F.col(key_col), F.col(start_col).alias("t"), F.lit(1).alias("d")
    )
    ends = intervals.select(
        F.col(key_col), F.col(end_col).alias("t"), F.lit(-1).alias("d")
    )
    swept = distributed_prefix_sum(
        starts.unionByName(ends), key_col, ["t", "d"], "d", out_col="open"
    )
    return swept.groupBy(key_col).agg(
        F.max("open").cast("long").alias("max_concurrent")
    )


@graded(
    "interval_max_concurrency",
    oracle="""
        WITH pts AS (
            SELECT event_type, ts AS t, 1 AS d FROM events
            UNION ALL
            SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS d FROM events
        ),
        swept AS (
            SELECT event_type,
                   sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                                ROWS UNBOUNDED PRECEDING) AS open
            FROM pts
        )
        SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent
        FROM swept GROUP BY 1
    """,
    section="C20,E3,F14",
    description="sweep-line max concurrency: peak simultaneously-open "
    "5-minute event intervals per type via +1/-1 point explosion and a "
    "keyed running sum — the capacity-planning primitive (peak sessions, "
    "peak connections) with no interval self-join",
)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    iv = events.select(
        "event_type",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("end_ts"),
    )
    return max_concurrency(iv, "event_type", "start_ts", "end_ts")


# ---------------------------------------------------------------------------
# Lag-k autocorrelation (seasonality / drift detection)
# ---------------------------------------------------------------------------


@graded(
    "timeseries_autocorr",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   date_trunc('hour', ts) AS h,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, x,
                   lag(x) OVER (PARTITION BY event_type ORDER BY h) AS y
            FROM hourly
        ),
        s AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
                   CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
                   CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
                   CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy,
                   CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy
            FROM lagged WHERE y IS NOT NULL GROUP BY 1
        )
        SELECT event_type, n,
               round((sxy / n - (sx / n) * (sy / n))
                     / sqrt((sxx / n - (sx / n) * (sx / n))
                          * (syy / n - (sy / n) * (sy / n))), 6) AS autocorr_lag1
        FROM s
    """,
    section="C13,C19,D2",
    description="lag-1 autocorrelation of the hourly revenue series per "
    "event type: hourly integer-cents rollup (the heavy, map-side pass), "
    "then lag + Pearson power sums over the CALENDAR-bounded series — "
    "seasonality/drift detection whose window state never grows with "
    "event volume, only with hours",
)
def timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyed window here is safe at any data scale: it orders HOURS
    (bounded by the calendar), not events — the aggregation collapsed
    volume first.  Power sums are decimal(38,0) (Spark) / HUGEINT
    (DuckDB): hourly cents squared leaves int64 around x64-scale traffic
    — the same overflow class the x64 ladder caught in agg_gini_exact
    (bound the SUM, not the term).  Both engines render the exact
    128-bit sums to DOUBLE of the same integer, so the final Pearson
    arithmetic stays bit-identical."""
    events = load(spark, "events", sf_dir)
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(F.sum(cents("value")).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.withColumn("y", F.lag("x").over(w)).filter(
        F.col("y").isNotNull()
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    cov = F.col("sxy") / F.col("n") - mx * my
    varx = F.col("sxx") / F.col("n") - mx * mx
    vary = F.col("syy") / F.col("n") - my * my
    return s.select(
        "event_type",
        "n",
        F.round(cov / F.sqrt(varx * vary), 6).alias("autocorr_lag1"),
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (dyadic decay)
# ---------------------------------------------------------------------------

_EWMA_LAGS = 10  # trailing window: weights 2^0 .. 2^-9


def _ewma_weights() -> list:
    """Exact dyadic decay weights 2^-k.  Every weight, every product
    count*2^-k, and every partial sum is an exact double (all are
    multiples of 2^-9 far below 2^53), so the weighted sum is
    bit-identical regardless of addition order or engine — no libm call,
    no summation-order drift."""
    return [2.0 ** -k for k in range(_EWMA_LAGS)]


def _ewma_oracle() -> str:
    ws = _ewma_weights()
    num = " + ".join(
        f"coalesce(lag(n, {k}) OVER w * CAST({w!r} AS DOUBLE), 0)"
        for k, w in enumerate(ws)
    )
    den = " + ".join(
        f"CASE WHEN lag(n, {k}) OVER w IS NULL THEN 0 ELSE CAST({w!r} AS DOUBLE) END"
        for k, w in enumerate(ws)
    )
    return f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, n,
               round(({num}) / ({den}), 6) AS ewma
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """


@graded(
    "timeseries_ewma",
    oracle=_ewma_oracle(),
    section="C19,C20,D3",
    description="EWMA smoother of the daily event-count series (half-life "
    "decay, 10-day trailing kernel, partial-window renormalized): dyadic "
    "2^-k weights make every product and partial sum an exact double, so "
    "the result is bit-identical across engines and addition orders; the "
    "lag kernel runs over the AGGREGATED calendar series (days x keys "
    "rows), one keyed sort, no self-join",
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    daily = events.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    ws = _ewma_weights()
    num = None
    den = None
    for k, wt in enumerate(ws):
        lagged = F.lag("n", k).over(w)
        term = F.coalesce(lagged * F.lit(wt), F.lit(0.0))
        wterm = F.when(lagged.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return daily.select(
        "day", "event_type", "n", F.round(num / den, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (moving-average detrend + hour-of-day means)
# ---------------------------------------------------------------------------


@graded(
    "timeseries_seasonal_decompose",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        hours AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
        ),
        spine AS (
            SELECT hours.h, t.event_type
            FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        ),
        hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n FROM events GROUP BY 1, 2
        ),
        dense AS (
            SELECT s.h, s.event_type, COALESCE(hh.n, 0) AS n
            FROM spine s LEFT JOIN hourly hh
              ON hh.h = s.h AND hh.event_type = s.event_type
        ),
        windowed AS (
            SELECT event_type, h, n,
                   CAST(sum(n) OVER w AS BIGINT) AS trend24,
                   count(*) OVER w AS nw
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY h
                         ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
        )
        SELECT event_type,
               CAST(hour(h) AS INT) AS hour_of_day,
               CAST(count(*) AS BIGINT) AS n_obs,
               round(CAST(sum(24 * n - trend24) AS DOUBLE)
                     / (24.0 * count(*)), 4) AS seasonal
        FROM windowed
        WHERE nw = 24
        GROUP BY 1, 2
    """,
    section="C19,C20,E1,F14",
    description="classical seasonal decomposition of the hourly event-count "
    "series: centered 24-hour moving-average detrend (complete windows "
    "only) then hour-of-day means of the detrended series — carried as "
    "24x-scaled INTEGERS (24*n - window_sum) so the only double is the "
    "final mean; the daily-rhythm profile capacity planning and anomaly "
    "baselines read",
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: dense spine (bounded: hours x types), one type-keyed window
    pair for trend, one (type, hour-of-day) aggregation for seasonal —
    nothing touches raw events after the first hourly rollup.  The
    detrended quantity 24*n - Σ_window(n) is integer-exact, so summation
    order cannot perturb the oracle hash (f38 applies only to the final
    division)."""
    events = load(spark, "events", sf_dir)
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    dense = (
        hourly_spine(events)
        .join(hourly, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 11)
    windowed = dense.select(
        "event_type",
        "h",
        "n",
        F.sum("n").over(w).cast("long").alias("trend24"),
        F.count("*").over(w).alias("nw"),
    ).filter(F.col("nw") == 24)
    return (
        windowed.groupBy(
            "event_type", F.hour("h").cast("int").alias("hour_of_day")
        )
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.round(
                F.sum(24 * F.col("n") - F.col("trend24")).cast("double")
                / (24.0 * F.count("*")),
                4,
            ).alias("seasonal"),
        )
    )


# ---------------------------------------------------------------------------
# C9/E3 — interval overlap attribution: sessions × campaign windows
# ---------------------------------------------------------------------------

#: campaign windows (UTC) over the 2024-01 fixture era — literal dims, the
#: broadcast side of the interval join
_CAMPAIGNS = [
    ("newyear", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
    ("midmonth", "2024-01-10 06:00:00", "2024-01-12 18:00:00"),
    ("payday", "2024-01-25 00:00:00", "2024-01-26 00:00:00"),
]


@graded(
    "interval_campaign_overlap",
    oracle="""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS s
            FROM events
        ),
        marked AS (
            SELECT user_id, s,
                   CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s)
                             > 1800 OR lag(s) OVER (PARTITION BY user_id
                                                    ORDER BY s) IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM ev
        ),
        sess AS (
            SELECT user_id,
                   CAST(min(s) AS BIGINT) AS t0, CAST(max(s) AS BIGINT) AS t1
            FROM (
                SELECT user_id, s,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY s)
                           AS sid
                FROM marked
            )
            GROUP BY user_id, sid
        ),
        camp AS (
            SELECT * FROM (VALUES
                ('newyear', epoch_us(TIMESTAMP '2024-01-01 00:00:00') // 1000000,
                            epoch_us(TIMESTAMP '2024-01-03 00:00:00') // 1000000),
                ('midmonth', epoch_us(TIMESTAMP '2024-01-10 06:00:00') // 1000000,
                             epoch_us(TIMESTAMP '2024-01-12 18:00:00') // 1000000),
                ('payday', epoch_us(TIMESTAMP '2024-01-25 00:00:00') // 1000000,
                           epoch_us(TIMESTAMP '2024-01-26 00:00:00') // 1000000)
            ) AS t(campaign, c0, c1)
        )
        SELECT campaign,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(least(t1, c1) - greatest(t0, c0)) AS BIGINT)
                   AS overlap_seconds
        FROM sess JOIN camp
          ON t0 < c1 AND t1 > c0
        GROUP BY 1
    """,
    section="C9,E3,C11,D2",
    description="interval-overlap attribution: 30-min-gap user sessions "
    "(gaps-and-islands sessionization) interval-joined against broadcast "
    "campaign windows, reporting touched sessions/users and exact "
    "overlapped seconds per campaign — the C9 range join with the "
    "overlap-length aggregate real attribution needs (strict overlap, "
    "zero-length touches excluded)",
)
def interval_campaign_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization is the user-keyed lag/cumsum pattern (one shuffle);
    the interval join's small side is a 3-row literal dim — broadcast, so
    the range predicate never shuffles the session table again.  Overlap
    length uses the standard least/greatest clip, integer seconds."""
    ev = load(spark, "events", sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("s")
    sess = (
        ev.withColumn("prev", F.lag("s").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | (F.col("s") - F.col("prev") > 1800)).cast(
                "int"
            ),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("s").alias("t0"), F.max("s").alias("t1"))
    )
    camp = spark.createDataFrame(
        [
            (name, c0, c1)
            for name, c0, c1 in (
                (n, *(_to_epoch(a) for a in (s0, s1)))
                for n, s0, s1 in _CAMPAIGNS
            )
        ],
        "campaign string, c0 long, c1 long",
    )
    return (
        sess.join(
            F.broadcast(camp),
            (F.col("t0") < F.col("c1")) & (F.col("t1") > F.col("c0")),
        )
        .groupBy("campaign")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(
                F.least("t1", "c1") - F.greatest("t0", "c0")
            ).cast("long").alias("overlap_seconds"),
        )
    )


def _to_epoch(ts_str: str) -> int:
    """UTC epoch seconds of a 'YYYY-MM-DD HH:MM:SS' literal (campaign dims
    are defined in UTC; computed driver-side once, 3 rows)."""
    from datetime import datetime, timezone

    return int(
        datetime.fromisoformat(ts_str).replace(tzinfo=timezone.utc).timestamp()
    )
