"""Behavioral analytics over the event stream — cohorts and attribution.

The two reports every product-analytics deployment of a message/event
engine runs (SURVEY.md §2 C/E breadth on the ``events`` table):

* **cohort_retention** — users bucketed by first-seen day, then the
  distinct-active grid (cohort_day × day_offset) with exact counts and
  an IEEE-exact retention ratio.
* **attribution_first_touch** — revenue attributed to each user's first
  event type (first-touch model): deterministic row_number pick of the
  first event, then one broadcast-friendly join onto purchases.

Cross-engine parity: all counts are exact int64s; the retention ratio is
a single double division of identical integers (bit-identical IEEE on
both engines — no rounding step); revenue aggregates in integer cents
(`parity.cents`); first-event ties break on (ts, event_id) so the pick
is total-ordered.

Scale notes (100 TB):

* Both queries shuffle on ``user_id`` — the natural, uniform key.  The
  firsts/actives aggregations are map-side combinable; at 1000 executors
  the cohort grid is tiny (days × offsets) and the per-user firsts frame
  is one row per user — broadcastable if users fit, otherwise the join
  stays co-partitioned on user_id with no extra exchange (AQE picks
  this up from the shared partitioning).
* The retention grid's second aggregation is keyed by (cohort_day,
  day_offset) — hundreds of groups, so the final shuffle is negligible;
  skew cannot arise because the key space is bounded by the calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded


def cohort_grid(events: DataFrame) -> DataFrame:
    """(cohort_day, day_offset) → distinct active users + cohort size.

    Generic form over any frame with ``user_id`` and ``ts`` columns."""
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    active = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    grid = (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    return grid.join(sizes, "cohort_day")


@graded(
    "cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY 1
        ),
        active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        grid AS (
            SELECT f.cohort_day,
                   CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
                   count(DISTINCT a.user_id) AS n_active
            FROM active a JOIN firsts f USING (user_id)
            GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_day, count(*) AS cohort_size FROM firsts GROUP BY 1
        )
        SELECT CAST(g.cohort_day AS VARCHAR) AS cohort_day,
               g.day_offset, g.n_active, s.cohort_size,
               CAST(g.n_active AS DOUBLE) / s.cohort_size AS retention
        FROM grid g JOIN sizes s USING (cohort_day)
    """,
    section="C4,C11,D2",
    description="day-cohort retention grid: first-seen cohorts x day offset "
    "with exact distinct-active counts and IEEE-exact retention ratio "
    "(user_id-keyed shuffles only; grid bounded by the calendar)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    return cohort_grid(events).select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        "day_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


@graded(
    "attribution_first_touch",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id, event_type AS first_touch
            FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id) AS rn
                FROM events
            ) WHERE rn = 1
        )
        SELECT f.first_touch,
               count(*) AS n_purchases,
               CAST(sum({cents_sql('e.value')}) AS BIGINT) AS revenue_cents
        FROM events e JOIN firsts f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1
    """,
    section="C18,C4,C11",
    description="first-touch revenue attribution: deterministic first-event "
    "pick per user (row_number over ts,event_id) joined onto purchases; "
    "integer-cents revenue",
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    firsts = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(cents("value")).alias("revenue_cents"),
        )
    )


@graded(
    "attribution_linear",
    oracle=f"""
        WITH touches AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
            FROM events WHERE event_type != 'purchase'
        ),
        purchases AS (
            SELECT user_id, event_id, {cents_sql('value')} AS v_cents,
                   epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        joined AS (
            SELECT p.event_id AS p_id, p.v_cents, t.event_type,
                   count(*) OVER (PARTITION BY p.event_id) AS n_touches
            FROM purchases p JOIN touches t
              ON p.user_id = t.user_id AND t.ts_us < p.ts_us
        )
        SELECT event_type AS channel,
               count(*) AS n_credits,
               CAST(sum((v_cents * 1000) // n_touches) AS BIGINT) AS credit_millicents
        FROM joined GROUP BY 1
    """,
    section="C18,C4,C11",
    description="linear multi-touch attribution: each purchase's value is "
    "split equally across ALL prior touches of the user (integer "
    "millicents division -- exact, no float allocation drift)",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every prior touch shares the credit equally.

    The join is user-keyed (purchases ⋈ touches co-partition on
    user_id); per-purchase touch counts come from a window over the
    joined frame, not a second join.  Credit is allocated in integer
    millicents via int division — engine-exact, unlike a double split
    that drifts in the last bit when touch counts differ."""
    events = load(spark, "events", sf_dir)
    touches = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("t_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        cents("value").alias("v_cents"),
        F.unix_micros("ts").alias("p_us"),
    )
    joined = purchases.join(touches, "user_id").filter(F.col("t_us") < F.col("p_us"))
    wp = Window.partitionBy("p_id")
    credited = joined.select(
        "channel",
        "v_cents",
        F.count("*").over(wp).alias("n_touches"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").alias("n_credits"),
        F.sum(F.expr("(v_cents * 1000) div n_touches"))
        .cast("long")
        .alias("credit_millicents"),
    )


@graded(
    "path_transitions",
    oracle="""
        WITH pairs AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts), event_id) AS dst
            FROM events
        ),
        counts AS (
            SELECT src, dst, count(*) AS n
            FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2
        )
        SELECT src, dst, n,
               CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
        FROM counts
    """,
    section="C19,C18,C11",
    description="event path analysis: per-user next-event transition matrix "
    "(lead over ts,event_id) with exact counts and IEEE-exact transition "
    "probabilities",
)
def path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition matrix of consecutive events per user.

    One user-keyed window (lead) + one bounded-key aggregation; the
    probability normalization is a window over src — at most
    |event_type|² groups, so the final stages are negligible at any
    scale.  The only real shuffle is the user_id exchange the lead
    window needs, shared with every other per-user analytic here."""
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    pairs = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wsrc)).alias("p"),
    )


@graded(
    "rolling_active_users",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        bounds AS (
            SELECT max(CAST(ts AS DATE)) AS max_day FROM events
        ),
        contrib AS (
            SELECT user_id,
                   day + x.o * INTERVAL 1 DAY AS target_day,
                   x.o AS o
            FROM daily, (SELECT unnest(generate_series(0, 6)) AS o) x
        )
        SELECT CAST(CAST(target_day AS DATE) AS VARCHAR) AS day,
               count(DISTINCT user_id) AS wau,
               count(DISTINCT CASE WHEN o = 0 THEN user_id END) AS dau
        FROM contrib, bounds
        WHERE target_day <= bounds.max_day
        GROUP BY 1
    """,
    section="C12,C19,D5",
    description="rolling 7-day active users (WAU) + DAU per day via the "
    "explode-offset technique -- sliding DISTINCT is not a window frame; "
    "each (user, day) contributes to 7 target days, then one exact "
    "distinct agg per day.  The scale-standard rewrite",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per calendar day.

    Sliding COUNT(DISTINCT) has no window-frame form on any engine; the
    distributed rewrite materializes each (user, day) activity row once
    per day it influences (7 rows — a generator, not a shuffle) and runs
    ONE exact distinct aggregation keyed by target day.  At 100 TB the
    fan-out factor equals the window length — bounded, predictable — and
    the aggregation key (day) is calendar-bounded, so the heavy lifting
    stays in map-side partials over the user dimension."""
    events = load(spark, "events", sf_dir)
    daily = events.select("user_id", F.to_date("ts").alias("day")).distinct()
    max_day = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    contrib = daily.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select(
        "user_id", "o", F.date_add("day", F.col("o")).alias("target_day")
    )
    return (
        contrib.crossJoin(F.broadcast(max_day))
        .filter(F.col("target_day") <= F.col("max_day"))
        .groupBy(F.col("target_day").cast("string").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("wau"),
            F.countDistinct(
                F.when(F.col("o") == 0, F.col("user_id"))
            ).alias("dau"),
        )
    )


# ---------------------------------------------------------------------------
# Session-scoped strict funnel (view -> click -> purchase, in order)
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # same sessionization gap as window_session


@graded(
    "funnel_session_strict",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
                        OR lag(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sessions AS (
            SELECT user_id, event_type, ts_us,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered
        ),
        v AS (
            SELECT user_id, sid, min(ts_us) AS v_us
            FROM sessions WHERE event_type = 'view' GROUP BY 1, 2
        ),
        c AS (
            SELECT s.user_id, s.sid, min(s.ts_us) AS c_us
            FROM sessions s JOIN v ON s.user_id = v.user_id AND s.sid = v.sid
            WHERE s.event_type = 'click' AND s.ts_us > v.v_us
            GROUP BY 1, 2
        ),
        p AS (
            SELECT s.user_id, s.sid, min(s.ts_us) AS p_us
            FROM sessions s JOIN c ON s.user_id = c.user_id AND s.sid = c.sid
            WHERE s.event_type = 'purchase' AND s.ts_us > c.c_us
            GROUP BY 1, 2
        ),
        staged AS (
            SELECT all_s.user_id, all_s.sid,
                   CASE WHEN p.p_us IS NOT NULL THEN 3
                        WHEN c.c_us IS NOT NULL THEN 2
                        WHEN v.v_us IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM (SELECT DISTINCT user_id, sid FROM sessions) all_s
            LEFT JOIN v ON all_s.user_id = v.user_id AND all_s.sid = v.sid
            LEFT JOIN c ON all_s.user_id = c.user_id AND all_s.sid = c.sid
            LEFT JOIN p ON all_s.user_id = p.user_id AND all_s.sid = p.sid
        )
        SELECT stage, count(*) AS n_sessions FROM staged GROUP BY 1
    """,
    section="E3,C19,C4",
    description="session-scoped strict funnel: view -> click -> purchase in "
    "strict event-time order inside 30-min sessions (gaps-and-islands); "
    "per-stage session counts.  All joins co-partition on (user, session)",
)
def funnel_session_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel inside behavioral sessions.

    Stage semantics: a click counts only AFTER the session's first view;
    a purchase only after that qualified click — the strict-order form
    that plain per-session existence checks get wrong (purchase-then-
    view sessions must NOT convert).

    Shape: one user-keyed window pass sessionizes; three aggregates and
    three left joins all share the (user_id, sid) key, so after the
    first exchange everything is co-partitioned — no data moves again.
    At 100 TB sessionization is the same exchange every other per-user
    analytic here reuses."""
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        events.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.when(
                (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) >= _GAP_US)
                | F.lag(F.unix_micros("ts")).over(w).isNull(),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        .withColumn("sid", F.sum("new_session").over(wcum))
    )
    keys = ["user_id", "sid"]
    v = (
        sessions.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts_us").alias("v_us"))
    )
    c = (
        sessions.join(v, keys)
        .filter((F.col("event_type") == "click") & (F.col("ts_us") > F.col("v_us")))
        .groupBy(*keys)
        .agg(F.min("ts_us").alias("c_us"))
    )
    p = (
        sessions.join(c, keys)
        .filter((F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("c_us")))
        .groupBy(*keys)
        .agg(F.min("ts_us").alias("p_us"))
    )
    staged = (
        sessions.select(*keys)
        .distinct()
        .join(v, keys, "left")
        .join(c, keys, "left")
        .join(p, keys, "left")
        .select(
            F.when(F.col("p_us").isNotNull(), 3)
            .when(F.col("c_us").isNotNull(), 2)
            .when(F.col("v_us").isNotNull(), 1)
            .otherwise(0)
            .alias("stage")
        )
    )
    return staged.groupBy("stage").agg(F.count("*").alias("n_sessions"))


# ---------------------------------------------------------------------------
# Activity heatmap and share-of-total reports
# ---------------------------------------------------------------------------


@graded(
    "activity_heatmap",
    oracle="""
        SELECT CAST(extract(isodow FROM ts) AS INT) AS dow,
               CAST(extract(hour FROM ts) AS INT) AS hour,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
    """,
    section="C11,D2",
    description="day-of-week x hour activity heatmap with exact event and "
    "distinct-user counts (ISO dow: Monday=1 on both engines -- Spark's "
    "weekday()+1, dodging the dayofweek Sunday-first trap)",
)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap cells.  ISO day-of-week is the portable choice:
    Spark ``dayofweek`` is Sunday=1 while DuckDB ``dow`` is Sunday=0 —
    both engines agree only on ISO numbering (Monday=1)."""
    events = load(spark, "events", sf_dir)
    return events.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@graded(
    "share_of_total",
    oracle=f"""
        WITH per_type AS (
            SELECT event_type,
                   CAST(sum({cents_sql('value')}) AS BIGINT) AS v_cents
            FROM events GROUP BY 1
        )
        SELECT event_type, v_cents,
               CAST(v_cents AS DOUBLE) / sum(v_cents) OVER () AS share
        FROM per_type
    """,
    section="C19,C11",
    description="percent-of-total report (ratio_to_report): per-type value "
    "share via an unpartitioned window over the k-row aggregate -- the "
    "window runs on aggregated rows, never on raw data, so the global "
    "frame is k rows, not a single-partition scan of the corpus",
)
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global-window trap, done right: computing shares with a window
    over RAW rows collapses everything to one partition.  Aggregate
    first, then cross-join the broadcast 1-row grand total back — the
    share math never runs through a window at all, so the plan is
    parallel (and WindowExec-warning-free) end to end."""
    events = load(spark, "events", sf_dir)
    per_type = events.groupBy("event_type").agg(
        F.sum(cents("value")).alias("v_cents")
    )
    total = per_type.agg(F.sum("v_cents").alias("__tot"))
    return per_type.crossJoin(F.broadcast(total)).select(
        "event_type",
        "v_cents",
        (F.col("v_cents").cast("double") / F.col("__tot")).alias("share"),
    )


@graded(
    "cohort_retention_monthly",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey, min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cm
            FROM orders GROUP BY 1
        ),
        active AS (
            SELECT DISTINCT o_custkey,
                   date_trunc('month', CAST(o_orderdate AS DATE)) AS m
            FROM orders
        )
        SELECT strftime(f.cm, '%Y-%m') AS cohort_month,
               CAST((extract(year FROM a.m) - extract(year FROM f.cm)) * 12
                    + (extract(month FROM a.m) - extract(month FROM f.cm)) AS BIGINT)
                   AS month_offset,
               count(DISTINCT a.o_custkey) AS n_active
        FROM active a JOIN firsts f USING (o_custkey)
        GROUP BY 1, 2
    """,
    section="C4,C11,D2",
    description="monthly customer cohorts over the 1995-2001 order history: "
    "integer year*12+month offset arithmetic (identical on both engines -- "
    "months_between's fractional semantics are the trap avoided)",
)
def cohort_retention_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.to_date("o_orderdate"))).alias("cm")
    )
    active = orders.select(
        "o_custkey", F.date_trunc("month", F.to_date("o_orderdate")).alias("m")
    ).distinct()
    off = (
        (F.year("m") - F.year("cm")) * 12 + (F.month("m") - F.month("cm"))
    ).cast("long")
    return (
        active.join(firsts, "o_custkey")
        .groupBy(
            F.date_format("cm", "yyyy-MM").alias("cohort_month"),
            off.alias("month_offset"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )


@graded(
    "session_top_paths",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {_GAP_US}
                        OR lag(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sessions AS (
            SELECT user_id, event_type, ts_us, event_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ordered
        ),
        paths AS (
            SELECT user_id, sid,
                   string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
            FROM sessions GROUP BY 1, 2
        )
        SELECT path, count(*) AS n_sessions
        FROM paths GROUP BY 1 HAVING count(*) >= 3
    """,
    section="C15,C19,E3",
    description="frequent session paths: per-session ordered event-type "
    "sequences (total order ts,event_id -- array_sort of structs, no "
    "window needed) counted across the corpus; >=3 threshold instead of "
    "LIMIT so ties cannot make the result set engine-dependent",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The click-path report: which exact event sequences recur?

    Path assembly uses ``array_sort(collect_list(struct(ts, id, type)))``
    — the struct sort gives the total order without a window pass, and
    collect_list is bounded by session length (watermark-bounded in the
    streaming twin).  Both aggregations key on uniform ids."""
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = events.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.sum(
            F.when(
                (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) >= _GAP_US)
                | F.lag(F.unix_micros("ts")).over(w).isNull(),
                1,
            ).otherwise(0)
        )
        .over(wcum)
        .alias("sid"),
    )
    paths = sess.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda x: x.event_type,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") >= 3)
    )


@graded(
    "rfm_segmentation",
    oracle=f"""
        WITH bounds AS (
            SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders
        ),
        per_cust AS (
            SELECT o_custkey,
                   max(CAST(o_orderdate AS DATE)) AS last_d,
                   count(*) AS n_orders,
                   CAST(sum({cents_sql('o_totalprice')}) AS BIGINT) AS m_cents
            FROM orders GROUP BY 1
        )
        SELECT CAST(date_diff('day', last_d, bounds.max_d) // 365 AS BIGINT) AS r_years,
               CAST(n_orders // 5 AS BIGINT) AS f_bucket,
               CAST(m_cents // 100000000 AS BIGINT) AS m_bucket,
               count(*) AS n_customers,
               CAST(sum(m_cents) AS BIGINT) AS segment_cents
        FROM per_cust, bounds
        GROUP BY 1, 2, 3
    """,
    section="C11,D2,D3",
    description="RFM customer segmentation: recency (years since last "
    "order vs corpus max date), frequency (orders//5), monetary "
    "(cents//1e8 = $1M buckets) -- all integer floor-division bucketing, "
    "no ntile (rank ties are engine-dependent; fixed thresholds are not)",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment cells over (recency, frequency, monetary) buckets.

    Bucket arithmetic is exact integer floor division — deliberately NOT
    ntile: quantile bucketing of tied values depends on engine sort
    stability, while fixed thresholds are reproducible everywhere.  The
    corpus max date is a broadcast 1-row bound, same as the WAU cap."""
    orders = load(spark, "orders", sf_dir)
    bounds = orders.agg(F.max(F.to_date("o_orderdate")).alias("max_d"))
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("m_cents"),
    )
    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .select(
            F.expr("datediff(max_d, last_d) div 365").cast("long").alias("r_years"),
            F.expr("n_orders div 5").cast("long").alias("f_bucket"),
            F.expr("m_cents div 100000000").cast("long").alias("m_bucket"),
            "m_cents",
        )
        .groupBy("r_years", "f_bucket", "m_bucket")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("m_cents").cast("long").alias("segment_cents"),
        )
    )


# ---------------------------------------------------------------------------
# inter-event gap profile (dwell-time distribution)
# ---------------------------------------------------------------------------


@graded(
    "interevent_gap_profile",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   epoch_us(ts) // 1000000
                     - lag(epoch_us(ts) // 1000000)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
            FROM events
        )
        SELECT CAST(floor(log2(gap_s + 1)) AS BIGINT) AS gap_bucket_log2,
               count(*) AS n_gaps,
               min(gap_s) AS min_gap_s,
               max(gap_s) AS max_gap_s
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY 1
    """,
    section="C19,D2,C11",
    description="inter-event gap profile: per-user consecutive-event gaps "
    "in exact integer seconds (lag over a total order), bucketed by "
    "floor(log2(gap+1)) — the dwell-time / bot-cadence distribution that "
    "drives session-timeout and rate-limit tuning",
)
def interevent_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One user-keyed window pass (each user's series sorts locally after
    one keyed exchange — never a global sort), then a tiny bucket agg.
    log2 on an exact int64+1 is the same double op on both engines; the
    floor result is re-cast to int, so the output is hash-exact."""
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    gaps = events.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy(
            F.floor(F.log2(F.col("gap_s") + 1)).cast("long").alias("gap_bucket_log2")
        )
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
    )


@graded(
    "funnel_conversion_lag",
    oracle="""
        WITH first_view AS (
            SELECT user_id, min(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY 1
        ),
        first_purchase AS (
            SELECT e.user_id,
                   min((epoch_us(e.ts) - epoch_us(v.t_view)) // 1000000) AS lag_s
            FROM events e JOIN first_view v ON e.user_id = v.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= v.t_view
            GROUP BY 1
        ),
        cohort AS (
            SELECT p.user_id,
                   CAST((day(v.t_view) - 1) // 7 AS INTEGER) AS cohort_week,
                   p.lag_s
            FROM first_purchase p JOIN first_view v ON p.user_id = v.user_id
        ),
        per_value AS (
            SELECT cohort_week AS g, lag_s AS v, CAST(count(*) AS BIGINT) AS cnt
            FROM cohort GROUP BY 1, 2
        ),
        c AS (
            SELECT g, v,
                   CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM per_value
        )
        SELECT g AS cohort_week, max(n) AS n_converted,
               min(v) AS median_lag_s
        FROM c WHERE 2 * cum >= n GROUP BY g
    """,
    section="C4,C11,C14,E3",
    description="view-to-purchase conversion latency per weekly cohort: "
    "first view per user, earliest subsequent purchase, integer lag "
    "seconds, LOWER-median per cohort via the per-value + prefix-scan "
    "order statistic (no per-row keyed window) -- the funnel-latency "
    "metric a growth dashboard tracks; user-keyed joins, uniform hash keys",
)
def funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.operators.robust import lower_median_cents

    ev = load(spark, "events", sf_dir)
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    lag = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.floor(
                    (F.unix_micros("ts") - F.unix_micros("t_view")) / 1000000
                ).cast("long")
            ).alias("lag_s")
        )
    )
    cohort = lag.join(first_view, "user_id").select(
        F.floor((F.dayofmonth("t_view") - 1) / 7).cast("int").alias("g"),
        F.col("lag_s"),
    )
    med = lower_median_cents(cohort, "g", F.col("lag_s"))
    counts = cohort.groupBy("g").agg(F.count("*").alias("n_converted"))
    return (
        med.join(counts, "g")
        .select(
            F.col("g").alias("cohort_week"),
            "n_converted",
            F.col("med_cents").alias("median_lag_s"),
        )
    )


@graded(
    "forecast_seasonal_backtest",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT d.event_type, d.n, p.n AS pred
            FROM daily d
            JOIN daily p ON p.event_type = d.event_type
                        AND CAST(p.day AS DATE) = CAST(d.day AS DATE) - 7
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days_scored,
               CAST(sum(abs(n - pred)) AS DOUBLE) / count(*) AS mae,
               round(CAST(sum(abs(n - pred)) AS DOUBLE)
                     / CAST(sum(n) AS BIGINT), 6) AS wape
        FROM scored GROUP BY event_type
    """,
    section="C4,C11,D2,F14",
    description="seasonal-naive forecast backtest per event type: predict "
    "each day's count with the count 7 days earlier (calendar self-join on "
    "the AGGREGATED daily series), score with MAE and WAPE -- both exact "
    "integer ratios (sum of integer absolute errors over integer "
    "denominators), no per-row double summation; the baseline every "
    "forecasting pipeline must beat",
)
def forecast_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    pred = daily.select(
        F.col("event_type"),
        F.date_add("d", 7).alias("d"),
        F.col("n").alias("pred"),
    )
    scored = daily.join(pred, ["event_type", "d"])
    return scored.groupBy("event_type").agg(
        F.count("*").alias("n_days_scored"),
        (
            F.sum(F.abs(F.col("n") - F.col("pred"))).cast("double") / F.count("*")
        ).alias("mae"),
        F.round(
            F.sum(F.abs(F.col("n") - F.col("pred"))).cast("double")
            / F.sum("n"),
            6,
        ).alias("wape"),
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival (time-to-purchase with administrative censoring)
# ---------------------------------------------------------------------------


@graded(
    "survival_kaplan_meier",
    oracle="""
        WITH starts AS (
            SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        raw AS (
            SELECT s.user_id,
                   CAST((epoch_us(min(e.ts)) - epoch_us(min(s.t0)))
                        // 86400000000 AS BIGINT) AS dur_raw
            FROM starts s JOIN events e
              ON e.user_id = s.user_id AND e.event_type = 'purchase'
             AND e.ts >= s.t0
            GROUP BY 1
        ),
        subj AS (
            SELECT user_id,
                   least(dur_raw, 5) AS dur,
                   CASE WHEN dur_raw <= 5 THEN 1 ELSE 0 END AS event
            FROM raw
        ),
        per_t AS (
            SELECT dur, CAST(sum(event) AS BIGINT) AS d,
                   CAST(sum(1 - event) AS BIGINT) AS c
            FROM subj GROUP BY 1
        ),
        scan AS (
            SELECT dur, d, c,
                   (SELECT count(*) FROM subj)
                     - CAST(COALESCE(sum(d + c) OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS n_risk
            FROM per_t
        )
        SELECT dur AS dur_days, n_risk, d AS n_events, c AS n_censored,
               CASE WHEN n_risk = d THEN 0.0
                    ELSE round(exp(sum(CASE WHEN n_risk > d
                                   THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                                   ELSE 0.0 END)
                              OVER (ORDER BY dur)), 4) END AS survival
        FROM scan
    """,
    section="C11,C20,F14",
    description="Kaplan-Meier product-limit survival of time-to-purchase "
    "(first view -> first purchase, administratively censored at 5 days): "
    "risk sets from an EXCLUSIVE prefix of (events+censored) per distinct "
    "day, survival via exp of the running log-sum — integer risk/event "
    "counts exact, one log/exp chain at the end (f38 tolerance class); "
    "the estimator product never materializes per-user rows after the "
    "first aggregation",
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival curve every conversion/retention analysis wants but
    naive 'conversion rate by day' gets wrong under censoring (users the
    study window cuts off are neither converted nor failed — KM removes
    them from later risk sets instead of mislabeling).  Shape: per-user
    reduction, then EVERYTHING runs on the per-distinct-day aggregate
    (calendar-bounded) through the two-phase prefix scan — same
    no-global-window contract as KS/W1."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    ev = load(spark, "events", sf_dir)
    starts = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .join(starts, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(
            (
                (F.unix_micros(F.min("ts")) - F.unix_micros(F.min("t0")))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("dur_raw")
        )
    )
    subj = raw.select(
        F.least(F.col("dur_raw"), F.lit(5)).alias("dur"),
        (F.col("dur_raw") <= 5).cast("int").alias("event"),
    )
    totals = subj.agg(F.count("*").alias("n_subj"))
    per_t = (
        subj.groupBy("dur")
        .agg(
            F.sum("event").alias("d"),
            F.sum(1 - F.col("event")).alias("c"),
        )
        .withColumn("dc", F.col("d") + F.col("c"))
        .withColumn("g", F.lit(0))
    )
    scan1 = distributed_prefix_sums(per_t, "g", ["dur"], {"dc": "cum_dc"})
    # ln(0) guard: if the final risk set exhausts (n_risk == d, no
    # censoring at the last event time) Kaplan-Meier is exactly 0 there —
    # Spark's log(0)->NULL would silently drop the term while DuckDB's
    # ln(0) raises, so BOTH sides special-case it (review r04 finding)
    scan1 = scan1.crossJoin(F.broadcast(totals)).withColumn(
        "n_risk", F.col("n_subj") - (F.col("cum_dc") - F.col("dc"))
    ).withColumn(
        "lnterm",
        F.when(
            F.col("n_risk") > F.col("d"),
            F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")),
        ).otherwise(F.lit(0.0)),
    ).withColumn("g", F.lit(0))
    scan2 = distributed_prefix_sums(scan1, "g", ["dur"], {"lnterm": "cum_ln"})
    return scan2.select(
        F.col("dur").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.when(F.col("n_risk") == F.col("d"), F.lit(0.0))
        .otherwise(F.round(F.exp("cum_ln"), 4))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution of the event-transition chain
# ---------------------------------------------------------------------------


@graded(
    "behavior_markov_stationary",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        trans AS (
            SELECT event_type AS f, nxt AS t, CAST(count(*) AS BIGINT) AS c
            FROM ordered WHERE nxt IS NOT NULL
            GROUP BY 1, 2
        ),
        rowtot AS (SELECT f, CAST(sum(c) AS BIGINT) AS ct FROM trans GROUP BY 1),
        types AS (SELECT DISTINCT f AS et FROM trans),
        p0 AS (
            SELECT et, CAST(1000000000 // (SELECT count(*) FROM types)
                            AS BIGINT) AS p
            FROM types
        ),
        it1 AS (
            SELECT tr.t AS et, CAST(sum((p.p * tr.c) // rt.ct) AS BIGINT) AS p
            FROM trans tr JOIN p0 p ON p.et = tr.f
            JOIN rowtot rt ON rt.f = tr.f GROUP BY 1
        ),
        it2 AS (
            SELECT tr.t AS et, CAST(sum((p.p * tr.c) // rt.ct) AS BIGINT) AS p
            FROM trans tr JOIN it1 p ON p.et = tr.f
            JOIN rowtot rt ON rt.f = tr.f GROUP BY 1
        ),
        it3 AS (
            SELECT tr.t AS et, CAST(sum((p.p * tr.c) // rt.ct) AS BIGINT) AS p
            FROM trans tr JOIN it2 p ON p.et = tr.f
            JOIN rowtot rt ON rt.f = tr.f GROUP BY 1
        ),
        it4 AS (
            SELECT tr.t AS et, CAST(sum((p.p * tr.c) // rt.ct) AS BIGINT) AS p
            FROM trans tr JOIN it3 p ON p.et = tr.f
            JOIN rowtot rt ON rt.f = tr.f GROUP BY 1
        ),
        it5 AS (
            SELECT tr.t AS et, CAST(sum((p.p * tr.c) // rt.ct) AS BIGINT) AS p
            FROM trans tr JOIN it4 p ON p.et = tr.f
            JOIN rowtot rt ON rt.f = tr.f GROUP BY 1
        )
        SELECT et AS event_type, p AS stationary_scaled,
               round(CAST(p AS DOUBLE) / 1000000000, 6) AS stationary
        FROM it5
    """,
    section="F14,C11,C18,C19",
    description="Markov stationary distribution of the user event chain: "
    "per-user lag pairs -> transition counts, then 5 integer-scaled power "
    "iterations (p'_j = sum_i (p_i * c_ij) DIV c_i, 1e-9 quantization — "
    "same engine-exact recurrence trick as integer PageRank) vs a "
    "5x-unrolled oracle: where user journeys settle in the long run",
)
def behavior_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chain-level summary over path_transitions' edge counts: the
    long-run share of time spent in each event state.  Scale: the lag
    window is user-partitioned (the one data-sized shuffle); everything
    after runs on the |types|^2 transition matrix — O(1) per iteration
    regardless of corpus size, with the driver loop carrying only the
    iteration index."""
    from pyspark.sql import Window as W

    ev = load(spark, "events", sf_dir)
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(w_lag).alias("nxt")
    )
    trans = (
        ordered.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("f"), F.col("nxt").alias("t"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    rowtot = trans.groupBy("f").agg(F.sum("c").alias("ct"))
    types = trans.select(F.col("f").alias("et")).distinct()
    n_types = types.count()
    p = types.withColumn(
        "p", F.lit(1_000_000_000 // n_types).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(5):
        p = (
            trans.join(p, trans["f"] == p["et"])
            .join(rowtot, "f")
            .select(F.col("t"), F.expr("(p * c) DIV ct").alias("term"))
            .groupBy(F.col("t").alias("et"))
            .agg(F.sum("term").cast("long").alias("p"))
            .localCheckpoint(eager=True)
        )
    return p.select(
        F.col("et").alias("event_type"),
        F.col("p").alias("stationary_scaled"),
        F.round(F.col("p").cast("double") / 1e9, 6).alias("stationary"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest daily-activity streak per user
# ---------------------------------------------------------------------------


@graded(
    "behavior_activity_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT) AS d
            FROM events
        ),
        isl AS (
            SELECT user_id, d,
                   d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                       AS grp
            FROM days
        ),
        streaks AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS len,
                   CAST(min(d) AS BIGINT) AS start_day
            FROM isl GROUP BY user_id, grp
        ),
        best AS (
            SELECT user_id, len, start_day,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY len DESC, start_day) AS rn
            FROM streaks
        )
        SELECT user_id, len AS longest_streak_days, start_day
        FROM best WHERE rn = 1 AND len >= 3
    """,
    section="C18,C11,F14",
    description="longest consecutive-day activity streak per user "
    "(gaps-and-islands: day minus row_number is constant within a run), "
    "reporting users with streaks >= 3 days and when the streak started "
    "— the canonical islands idiom as a first-class graded op (the same "
    "trick powering span islands in f61 and sessionization)",
)
def behavior_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything is user-partitioned: distinct day collapse, the islands
    window, the per-user best pick — one shuffle class end to end."""
    from pyspark.sql import Window as W

    days = (
        load(spark, "events", sf_dir)
        .select(
            "user_id",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
        )
        .distinct()
    )
    w_isl = W.partitionBy("user_id").orderBy("d")
    streaks = (
        days.withColumn("grp", F.col("d") - F.row_number().over(w_isl))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"), F.min("d").alias("start_day"))
    )
    w_best = W.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
    return (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("len") >= 3))
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak_days"),
            F.col("start_day").cast("long").alias("start_day"),
        )
    )


# ---------------------------------------------------------------------------
# Per-session event-type PMI (co-occurrence association)
# ---------------------------------------------------------------------------


@graded(
    "behavior_session_pmi",
    oracle="""
        WITH ts_marked AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts)
                             - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts_us, event_id)
                             >= 1800000000
                             OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                        ORDER BY ts_us, event_id)
                                IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, event_type,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM ts_marked
        ),
        pres AS (SELECT DISTINCT user_id, sid, event_type FROM sessions),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_sessions
            FROM (SELECT DISTINCT user_id, sid FROM pres)
        ),
        per_type AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
            FROM pres GROUP BY 1
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM pres a JOIN pres b
              ON a.user_id = b.user_id AND a.sid = b.sid
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_ab,
               ta.n_t AS n_a, tb.n_t AS n_b, n_sessions,
               round(ln(CAST(n_ab AS DOUBLE) * n_sessions
                        / (CAST(ta.n_t AS DOUBLE) * tb.n_t)), 6) AS pmi
        FROM pairs
        JOIN per_type ta ON ta.event_type = type_a
        JOIN per_type tb ON tb.event_type = type_b
        CROSS JOIN tot
    """,
    section="C4,C11,C18,F14",
    description="pointwise mutual information between event types "
    "co-occurring in the same 30-min behavioral session: PMI = "
    "ln(P(a,b)/(P(a)P(b))) over session presence sets — positive pairs "
    "co-occur more than independence predicts (the association signal "
    "basket lift gives for products, here for behavior).  One user-keyed "
    "sessionization pass, then every aggregate/join runs on the "
    "session-presence set and the |types|^2 pair frame",
)
def behavior_session_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize once (the same gaps-and-islands exchange every per-user
    analytic shares), collapse to DISTINCT (user, sid, type) presence
    rows, then: total sessions (1-row broadcast), per-type session
    counts (|types| rows), and the same-session self-join on the
    presence set keyed by (user, sid) — co-partitioned with the
    sessionization exchange, pair output bounded by |types|² per
    session.  PMI math is double-on-exact-ints, deterministic."""
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pres = (
        events.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.when(
                (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) >= _GAP_US)
                | F.lag(F.unix_micros("ts")).over(w).isNull(),
                1,
            )
            .otherwise(0)
            .alias("new_session"),
        )
        .withColumn("sid", F.sum("new_session").over(wcum))
        .select("user_id", "sid", "event_type")
        .distinct()
    )
    tot = (
        pres.select("user_id", "sid")
        .distinct()
        .agg(F.count("*").alias("n_sessions"))
    )
    per_type = pres.groupBy("event_type").agg(F.count("*").alias("n_t"))
    b = pres.select(
        "user_id", "sid", F.col("event_type").alias("type_b")
    )
    pairs = (
        pres.withColumnRenamed("event_type", "type_a")
        .join(b, ["user_id", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    ta = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    tb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_sessions",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_sessions")
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@graded(
    "behavior_markov_entropy",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        trans AS (
            SELECT event_type AS f, nxt AS t, CAST(count(*) AS BIGINT) AS c
            FROM ordered WHERE nxt IS NOT NULL
            GROUP BY 1, 2
        ),
        rowtot AS (SELECT f, CAST(sum(c) AS BIGINT) AS ct FROM trans GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM trans)
        SELECT tr.f AS event_type,
               rt.ct AS n_out,
               CAST(count(*) AS BIGINT) AS n_next_types,
               round(-sum((CAST(tr.c AS DOUBLE) / rt.ct)
                          * ln(CAST(tr.c AS DOUBLE) / rt.ct)), 6)
                   AS entropy_nats,
               round(CAST(rt.ct AS DOUBLE) / t.n, 6) AS weight
        FROM trans tr
        JOIN rowtot rt ON rt.f = tr.f
        CROSS JOIN tot t
        GROUP BY tr.f, rt.ct, t.n
    """,
    section="C11,C19,F14",
    description="next-event predictability per state: Shannon entropy (nats) "
    "of each event type's MLE transition distribution over the per-user "
    "event stream, plus its transition-mass weight — sum(weight*entropy) "
    "is the corpus conditional cross-entropy H(next|cur), exp of it the "
    "Markov perplexity (pytest-pinned); the behavioral twin of f54's "
    "bigram LM perplexity.  Counts are exact integers; the ~|types| "
    "double log terms per state are the f38/f54 accepted rounding class",
)
def behavior_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One user-keyed lead() pass (the exchange every behavioral analytic
    shares) collapses to the |types|² transition-count frame; everything
    after — row totals, grand total, entropies — is broadcast-tiny."""
    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("f"),
            F.lead("event_type").over(w).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("f", "t")
        .agg(F.count("*").alias("c"))
    )
    rowtot = trans.groupBy("f").agg(F.sum("c").alias("ct"))
    tot = trans.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("ct")
    return (
        trans.join(F.broadcast(rowtot), "f")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("f").alias("event_type"), "ct", "n")
        .agg(
            F.count("*").alias("n_next_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        )
        .select(
            "event_type",
            F.col("ct").alias("n_out"),
            "n_next_types",
            "entropy_nats",
            F.round(F.col("ct").cast("double") / F.col("n"), 6).alias("weight"),
        )
    )
