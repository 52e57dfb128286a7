"""C-series graded queries — the relational core (SURVEY.md §2.C).

All built-in Catalyst operators; the engineering effort is oracle parity
(aliasing, float canonicalization, deterministic tiebreaks) and scale
hygiene (broadcast hints for dims, no driver-side collects, pushdown-friendly
predicates).

Money-aggregate rule (see ``operators/parity.py``): products of 2dp columns
are computed in exact integer cents (cents × cents → int ten-thousandths),
summed as int64 — order-independent and bit-identical across engines —
then divided back once.  This is how TPC-H-Q1-style queries hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load, register_temp_views
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded

# ---------------------------------------------------------------------------
# C1/C2/C11 — scan + filter + hash aggregate (TPC-H-Q1-like pricing summary)
# ---------------------------------------------------------------------------


@graded(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               sum({cents_sql('l_extendedprice')} * {cents_sql('1 - l_discount')}) / 10000.0 AS sum_disc_price,
               sum({cents_sql('l_extendedprice')} * {cents_sql('1 - l_discount')} * {cents_sql('1 + l_tax')}) / 1000000.0 AS sum_charge,
               (sum({cents_sql('l_quantity')}) / count(*)) / 100 AS avg_qty,
               (sum({cents_sql('l_extendedprice')}) / count(*)) / 100 AS avg_price,
               (sum({cents_sql('l_discount')}) / count(*)) / 100 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    section="C1,C2,C11,A1",
    description="pricing summary: filter + groupBy + 8 aggregates (TPC-H Q1 shape)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    disc_price_c4 = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    charge_c6 = disc_price_c4 * cents(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            (F.sum(disc_price_c4) / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_c6) / 1000000.0).alias("sum_charge"),
            ((F.sum(cents("l_quantity")) / F.count("*")) / 100).alias("avg_qty"),
            ((F.sum(cents("l_extendedprice")) / F.count("*")) / 100).alias("avg_price"),
            ((F.sum(cents("l_discount")) / F.count("*")) / 100).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# C4/C8/C22 — 3-table join, aggregate, deterministic top-k
# ---------------------------------------------------------------------------


@graded(
    "q3_top_revenue",
    oracle=f"""
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
               sum({cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}) / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY 1, 2
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
    """,
    section="C4,C22",
    description="3-table equi-join + aggregate + ordered top-10 (TPC-H Q3 shape)",
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    lineitem = load(spark, "lineitem", sf_dir)
    revenue_c4 = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > "1996-01-01")
        # group on the native timestamp (8-byte shuffle key, no per-row
        # formatting); render the string only on the ~|orders| group rows
        .groupBy("o_orderkey", "o_orderdate")
        .agg((F.sum(revenue_c4) / 10000.0).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Composite workload queries (TPC-H shapes expressible on the fixture subset)
# ---------------------------------------------------------------------------


@graded(
    "q5_local_supplier_revenue",
    oracle=f"""
        SELECT n.n_name,
               sum({cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}) / 10000.0
                 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
    section="C4,C8",
    description="local-supplier revenue by nation (TPC-H Q5 shape): 6-table "
    "star join; dims broadcast, fact side never shuffled for the joins",
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    revenue_c4 = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg((F.sum(revenue_c4) / 10000.0).alias("revenue"))
    )


@graded(
    "q6_forecast_revenue",
    oracle=f"""
        SELECT sum({cents_sql('l_extendedprice')} * {cents_sql('l_discount')}) / 10000.0
                 AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    section="C2,C11",
    description="forecast revenue change (TPC-H Q6 shape): pure scan+filter+agg "
    "— the pushdown showcase, no shuffle beyond the final reduce",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")) / 10000.0).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@graded(
    "q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               sum({cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}) / 10000.0
                 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    section="C4,C22",
    description="top returned-item customers (TPC-H Q10 shape)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    n = load(spark, "nation", sf_dir)
    revenue_c4 = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-07-01")
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(revenue_c4) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@graded(
    "q14_promo_revenue_share",
    oracle=f"""
        SELECT
          100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN {cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}
                      ELSE 0 END)
              / sum({cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')})
            AS promo_share_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    section="C4,C11,D4",
    description="promo revenue share (TPC-H Q14 shape): conditional aggregate "
    "ratio — exact int sums, one identical double division",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir)
    rev = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (100.0 * F.sum(promo) / F.sum(rev)).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# C5 — outer joins
# ---------------------------------------------------------------------------


@graded(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey,
               count(o.o_orderkey) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1
    """,
    section="C5",
    description="left outer join preserving order-less customers",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@graded(
    "join_full_outer",
    oracle="""
        WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
                   WHERE c_acctbal > 4000 GROUP BY 1),
             s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
                   WHERE s_acctbal > 4000 GROUP BY 1)
        SELECT coalesce(c.nk, s.nk) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    section="C5",
    description="full outer join of two filtered aggregates with non-overlapping keys",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 4000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") > 4000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, F.col("c_nk") == F.col("s_nk"), "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# C6 — semi / anti joins
# ---------------------------------------------------------------------------


@graded(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_nationkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    section="C6",
    description="left-semi join: customers having a big order",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    big_orders = load(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_nationkey")


@graded(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
    """,
    section="C6",
    description="left-anti join: customers with no urgent order",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    urgent = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# C7 — cross join (kept tiny by design: region × nation)
# ---------------------------------------------------------------------------


@graded(
    "join_cross",
    oracle="""
        SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    section="C7",
    description="Cartesian product of the two tiny dims (125 rows)",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, "region", sf_dir)
    nation = load(spark, "nation", sf_dir)
    return region.crossJoin(nation).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# C8 — broadcast join (plan-level: oracle sees the same logical join)
# ---------------------------------------------------------------------------


@graded(
    "join_broadcast_dims",
    oracle="""
        SELECT r.r_name, count(*) AS n_customers,
               round(sum(c.c_acctbal), 2) AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
    """,
    section="C8",
    description="explicit broadcast of the dim chain into the fact scan — at "
    "100 TB this is a map-side join with zero shuffle of the big side",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir)
    dims = F.broadcast(
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        customer.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# C9 — theta / range join
# ---------------------------------------------------------------------------


@graded(
    "join_range_theta",
    oracle="""
        SELECT s.s_nationkey AS nationkey, count(*) AS n_pairs
        FROM supplier s
        JOIN customer c
          ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
        GROUP BY 1
    """,
    section="C9",
    description="equi + inequality join condition (range/theta component)",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, "supplier", sf_dir)
    customer = load(spark, "customer", sf_dir)
    return (
        supplier.join(
            customer,
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.col("s_acctbal") > F.col("c_acctbal")),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# C10 — as-of join (nearest prior event), emulated identically on both engines
# ---------------------------------------------------------------------------


@graded(
    "join_asof",
    oracle="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'click'),
             matched AS (
               SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                      p.ts_us - c.ts_us AS gap_us,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY c.ts_us DESC, c.event_id DESC) AS rn
               FROM p JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us)
        SELECT purchase_id, click_id, gap_us FROM matched WHERE rn = 1
    """,
    section="C10",
    description="as-of join: most recent prior click per purchase, per user "
    "(range join + row_number emulation; DuckDB ASOF JOIN semantics)",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_ts"),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("c_ts"), F.desc("click_id")
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user")) & (F.col("c_ts") <= F.col("p_ts")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id", "click_id", (F.col("p_ts") - F.col("c_ts")).alias("gap_us")
        )
    )


# ---------------------------------------------------------------------------
# C10 — as-of join, FORWARD direction with a tolerance bound
# ---------------------------------------------------------------------------


@graded(
    "join_asof_tolerance",
    oracle="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'click'),
             matched AS (
               SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                      c.ts_us - p.ts_us AS gap_us,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY c.ts_us ASC, c.event_id ASC) AS rn
               FROM p JOIN c ON p.user_id = c.user_id
                AND c.ts_us > p.ts_us
                AND c.ts_us <= p.ts_us + CAST(3600 AS BIGINT) * 1000000)
        SELECT p.event_id AS purchase_id, m.click_id,
               m.gap_us AS next_click_gap_us
        FROM p LEFT JOIN matched m
          ON m.purchase_id = p.event_id AND m.rn = 1
    """,
    section="C10,C5",
    description="forward as-of join WITH tolerance: earliest following "
    "click per purchase per user, at most 1h later, LEFT semantics (a "
    "purchase with no in-window click keeps a null match) — the other "
    "half of the as-of family next to join_asof's backward form; the "
    "tolerance turns the range join's per-row scan span from unbounded "
    "history into a fixed window (the property that makes it "
    "partition-prunable at 100 TB)",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of answers "what led to this"; the forward+tolerance
    form answers "what did this lead to within the SLA window" (purchase →
    next click ≤ 1h).  Same emulation shape as join_asof (range join +
    per-left-row rank) with two differences that matter at scale: the
    tolerance bounds the join's time span — on a time-partitioned layout
    each left row touches at most two partitions — and the LEFT join
    preserves unmatched rows, so downstream rates are computed over the
    full population."""
    tol_us = 3600 * 1_000_000
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_ts"),
    )
    w = Window.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    matched = (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") > F.col("p_ts"))
            & (F.col("c_ts") <= F.col("p_ts") + F.lit(tol_us)),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("purchase_id").alias("m_purchase_id"),
            "click_id",
            (F.col("c_ts") - F.col("p_ts")).alias("next_click_gap_us"),
        )
    )
    return purchases.join(
        matched, purchases.purchase_id == matched.m_purchase_id, "left"
    ).select("purchase_id", "click_id", "next_click_gap_us")


# ---------------------------------------------------------------------------
# C10 — as-of join, NEAREST direction (minimal absolute gap)
# ---------------------------------------------------------------------------


@graded(
    "join_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'click'),
             matched AS (
               SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                      abs(c.ts_us - p.ts_us) AS abs_gap_us,
                      row_number() OVER (PARTITION BY p.event_id
                                         ORDER BY abs(c.ts_us - p.ts_us),
                                                  c.ts_us, c.event_id) AS rn
               FROM p JOIN c ON p.user_id = c.user_id
                AND c.ts_us >= p.ts_us - CAST(3600 AS BIGINT) * 1000000
                AND c.ts_us <= p.ts_us + CAST(3600 AS BIGINT) * 1000000)
        SELECT purchase_id, click_id, abs_gap_us
        FROM matched WHERE rn = 1
    """,
    section="C10",
    description="nearest-direction as-of join: the click with the MINIMAL "
    "absolute gap to each purchase within a symmetric 1h tolerance (ties "
    "break to the earlier click, then id) — completing the as-of family: "
    "backward (join_asof), forward+tolerance (join_asof_tolerance), "
    "nearest (this); the sensor-fusion alignment mode",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol_us = 3600 * 1_000_000
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("c_ts"),
    )
    gap = F.abs(F.col("c_ts") - F.col("p_ts"))
    w = Window.partitionBy("purchase_id").orderBy(
        gap, F.col("c_ts"), F.col("click_id")
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.lit(tol_us))
            & (F.col("c_ts") <= F.col("p_ts") + F.lit(tol_us)),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "click_id", gap.alias("abs_gap_us"))
    )


# ---------------------------------------------------------------------------
# C3 — distinct
# ---------------------------------------------------------------------------


@graded(
    "agg_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    section="C3",
    description="duplicate elimination over a composite key",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, "customer", sf_dir).select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# C12 — count distinct (exact graded; approx is rows-only)
# ---------------------------------------------------------------------------


@graded(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    section="C12",
    description="exact distinct aggregation",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@graded(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketches differ by design across engines (SURVEY §7.4.9)
    section="C12",
    description="approx_count_distinct (HLL) — rows-only by design",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey").alias("approx_customers"))
    )


# ---------------------------------------------------------------------------
# C13 — statistical aggregates
# ---------------------------------------------------------------------------


@graded(
    "agg_stats",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_discount), 8) AS var_disc,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_discount), 8) AS covar_qty_disc
        FROM lineitem GROUP BY 1
    """,
    section="C13",
    description="stddev / variance / correlation / covariance",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 8).alias("covar_qty_disc"),
    )


@graded(
    "q7_volume_shipping",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS ship_year,
               sum({cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}) / 10000.0
                 AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    section="C4,C8,D2",
    description="cross-nation shipping volume by year (TPC-H Q7 shape): "
    "double-aliased dim join (nation twice)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, "supplier", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    pair = ("NATION_1", "NATION_2")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    revenue_c4 = cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg((F.sum(revenue_c4) / 10000.0).alias("volume"))
    )


@graded(
    "q13_order_count_distribution",
    oracle="""
        SELECT n_orders, count(*) AS n_customers FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                               AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1
        ) GROUP BY 1
    """,
    section="C5,C11",
    description="customer order-count histogram (TPC-H Q13 shape): outer join "
    "with join-side predicate, then a second aggregation level",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderpriority") != "1-URGENT")
    per_customer = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@graded(
    "q18_large_orders",
    oracle="""
        SELECT o.o_orderkey, round(o.o_totalprice, 2) AS total_price,
               sum(l.l_quantity) AS total_qty
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
        HAVING sum(l.l_quantity) > 135
    """,
    section="C4,C11",
    description="large-quantity orders (TPC-H Q18 shape): aggregate + HAVING",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 135)
    )


@graded(
    "funnel_conversion",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   lag(event_type) OVER w AS prev_type,
                   lag(event_type, 2) OVER w AS prev2_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        )
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' AND prev_type = 'click'
                        THEN 1 ELSE 0 END) AS BIGINT) AS click_to_purchase,
               CAST(sum(CASE WHEN event_type = 'purchase' AND prev_type = 'click'
                             AND prev2_type = 'view'
                        THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
        FROM seq GROUP BY 1
    """,
    section="C19,E3",
    description="message-analytics funnel: view→click→purchase sequences per "
    "user via ordered lag windows",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = load(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("event_type", 2).over(w).alias("prev2_type"),
    )
    c2p = (F.col("event_type") == "purchase") & (F.col("prev_type") == "click")
    full = c2p & (F.col("prev2_type") == "view")
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(c2p.cast("int")).cast("long").alias("click_to_purchase"),
        F.sum(full.cast("int")).cast("long").alias("full_funnel"),
    )


# ---------------------------------------------------------------------------
# C13b — higher moments from exact integer power sums
# ---------------------------------------------------------------------------
# Built-in skewness/kurtosis differ across engines (population vs
# bias-corrected estimators), so the graded query computes the population
# moments from *exact integer* power sums of cents values: the sums are
# order-independent int64s, every downstream double op is identical, and
# tests/test_moments.py pins Spark's built-in F.skewness to this formula.


@graded(
    "agg_moments_exact",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum({cents_sql('l_quantity')}) AS BIGINT) AS s1,
                   CAST(sum({cents_sql('l_quantity')} * {cents_sql('l_quantity')}) AS BIGINT) AS s2,
                   CAST(sum({cents_sql('l_quantity')} * {cents_sql('l_quantity')}
                            * {cents_sql('l_quantity')}) AS BIGINT) AS s3
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, n,
               round((s2 / n - (s1 / n) * (s1 / n)) / 10000.0, 6) AS variance_pop,
               round((s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
                     / power(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skewness_pop
        FROM s
    """,
    section="C13",
    description="population variance + skewness from exact integer power "
    "sums — deterministic higher moments (built-ins are estimator-divergent)",
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    c = cents("l_quantity")
    grouped = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
        F.sum(c * c * c).alias("s3"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    var_c = m2 - m1 * m1  # in cents², population
    skew = (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / F.pow(var_c, 1.5)
    return grouped.select(
        "l_returnflag",
        "n",
        F.round(var_c / 10000.0, 6).alias("variance_pop"),
        F.round(skew, 6).alias("skewness_pop"),
    )


# ---------------------------------------------------------------------------
# Composite pipeline: selector → broadcast enrich → session windows
# ---------------------------------------------------------------------------


@graded(
    "pipeline_composite",
    oracle="""
        WITH filtered AS (
            SELECT e.user_id, epoch_us(e.ts) AS ts_us, n.n_name
            FROM events e
            JOIN nation n ON e.user_id % 25 = n.n_nationkey
            WHERE TRY_CAST(json_extract_string(e.props, '$.k') AS DOUBLE) > 30
              AND e.event_type IN ('click', 'purchase', 'view')
        ), ordered AS (
            SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w >= 1800000000
                           OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM filtered
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        ), sessions AS (
            SELECT n_name, user_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered
        )
        SELECT n_name, count(*) AS n_sessions
        FROM (SELECT n_name, user_id, session_id FROM sessions GROUP BY 1, 2, 3)
        GROUP BY 1
    """,
    section="B12,E3,E6,C8",
    description="end-to-end pipeline: compiled selector → broadcast dim "
    "enrichment → 30-min session windows → sessions per nation (the "
    "deployment shape, batch-graded; identical under readStream)",
)
def pipeline_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_message_filter_spark.selector import Selector

    sel = Selector("props.k > 30 AND event_type IN ('click', 'purchase', 'view')")
    events = load(spark, "events", sf_dir).filter(sel.column())
    nation = load(spark, "nation", sf_dir)
    enriched = events.join(
        F.broadcast(nation), (F.col("user_id") % 25) == F.col("n_nationkey")
    )
    sessions = enriched.groupBy(
        F.session_window("ts", "30 minutes"), "user_id", "n_name"
    ).agg(F.count("*").alias("n_events"))
    return sessions.groupBy("n_name").agg(F.count("*").alias("n_sessions"))


# ---------------------------------------------------------------------------
# C14 — percentiles / median (exact; approx is rows-only)
# ---------------------------------------------------------------------------


@graded(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
               round(median(l_extendedprice), 4) AS median_price
        FROM lineitem GROUP BY 1
    """,
    section="C14",
    description="exact interpolated percentiles + median",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.median("l_extendedprice"), 4).alias("median_price"),
    )


@graded(
    "agg_approx_percentile",
    oracle=None,  # KLL/GK sketches differ across engines by design
    section="C14",
    description="approx_percentile — rows-only by design",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10000)).alias(
                "approx_p50"
            )
        )
    )


# ---------------------------------------------------------------------------
# C15 — array aggregation (deterministic: sorted, joined to string)
# ---------------------------------------------------------------------------


@graded(
    "agg_collect_sorted",
    oracle="""
        SELECT c_nationkey,
               string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
        FROM customer GROUP BY 1
    """,
    section="C15",
    description="collect_set + sort_array, canonicalized to a joined string",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "customer", sf_dir)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), ","
            ).alias("segments")
        )
    )


# ---------------------------------------------------------------------------
# C16 — rollup / cube
# ---------------------------------------------------------------------------


@graded(
    "agg_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    section="C16",
    description="hierarchical rollup with subtotal rows",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@graded(
    "agg_cube",
    oracle="""
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
    """,
    section="C16",
    description="cube over two dimensions (all grouping sets)",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "customer", sf_dir)
        .cube("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# C17 — pivot (manual CASE on the oracle side for parity)
# ---------------------------------------------------------------------------


@graded(
    "agg_pivot",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS f_price,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END), 2) AS o_price
        FROM lineitem GROUP BY 1
    """,
    section="C17",
    description="categorical pivot to columns",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_extendedprice"), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("f_price"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("o_price"),
    )


@graded(
    "agg_unpivot",
    oracle="""
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        FROM part WHERE p_partkey < 500
        UNION ALL
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part WHERE p_partkey < 500
    """,
    section="C17,C23",
    description="unpivot/melt (inverse of pivot): wide numeric columns to "
    "long (key, metric, value) rows — oracle as a manual UNION ALL for parity",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.col("p_retailprice"),
            F.col("p_size").cast("double").alias("p_size"),
        )
    )
    return wide.unpivot(
        ids="p_partkey",
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# C18 — ranking window functions
# ---------------------------------------------------------------------------


@graded(
    "window_rank",
    oracle="""
        SELECT s_suppkey, s_nationkey,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    section="C18",
    description="row_number / rank / dense_rank / ntile with deterministic tiebreak",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return load(spark, "supplier", sf_dir).select(
        "s_suppkey",
        "s_nationkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# C19 — analytic window functions
# ---------------------------------------------------------------------------


@graded(
    "window_lag_lead",
    oracle="""
        SELECT o_orderkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               first_value(o_totalprice) OVER w AS first_price
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    section="C19",
    description="lag / lead / first_value per customer order history",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.first("o_totalprice").over(w).alias("first_price"),
        )
    )


# ---------------------------------------------------------------------------
# C20 — frame-spec aggregates (running totals, exact via integer cents)
# ---------------------------------------------------------------------------


@graded(
    "window_running_sum",
    oracle=f"""
        SELECT o_orderkey,
               sum({cents_sql('o_totalprice')}) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0 AS running_total
        FROM orders WHERE o_custkey < 100
    """,
    section="C20",
    description="running total with explicit ROWS frame (exact integer cents)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("running_total"),
        )
    )


# ---------------------------------------------------------------------------
# C18/C19 — distribution window functions (exact rational outputs)
# ---------------------------------------------------------------------------


@graded(
    "window_distribution",
    oracle="""
        SELECT s_suppkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    section="C18,C19",
    description="percent_rank / cume_dist — exact (rank-1)/(n-1) rationals, "
    "bit-identical across engines",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return load(spark, "supplier", sf_dir).select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# C20 — RANGE frame (value-based window bounds)
# ---------------------------------------------------------------------------


@graded(
    "window_range_frame",
    oracle="""
        SELECT p_partkey,
               count(*) OVER (ORDER BY p_size RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                 AS n_within_5
        FROM part WHERE p_partkey < 500
    """,
    section="C20",
    description="RANGE frame: peers within a value distance (not row count)",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame semantics without any window: a value-distance frame
    over a column depends only on the per-VALUE counts, so collapse to
    the distinct-size aggregate (bounded: p_size cardinality), theta-join
    sizes within the 5-unit band — a |sizes|² join on a ~50-row table —
    and join the per-size answer back to the rows.  The same query via
    ``Window.orderBy(p_size).rangeBetween(-5, 0)`` serializes every row
    into one task; this form is parallel at any row count because the
    only non-broadcast shuffle is the p_size aggregate."""
    part = load(spark, "part", sf_dir).filter(F.col("p_partkey") < 500)
    sizes = part.groupBy("p_size").agg(F.count("*").alias("n"))
    other = sizes.select(F.col("p_size").alias("s2"), F.col("n").alias("n2"))
    within = (
        sizes.join(
            F.broadcast(other),
            (F.col("s2") <= F.col("p_size")) & (F.col("s2") >= F.col("p_size") - 5),
        )
        .groupBy("p_size")
        .agg(F.sum("n2").alias("n_within_5"))
    )
    return part.join(F.broadcast(within), "p_size").select(
        "p_partkey", "n_within_5"
    )


# ---------------------------------------------------------------------------
# C24 — INTERSECT ALL / EXCEPT ALL (bag semantics with multiplicities)
# ---------------------------------------------------------------------------


@graded(
    "setop_all_variants",
    oracle="""
        SELECT 'intersect_all' AS op, l_quantity FROM (
            SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A' AND l_orderkey < 500
            INTERSECT ALL
            SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey < 500
        )
        UNION ALL
        SELECT 'except_all' AS op, l_quantity FROM (
            SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A' AND l_orderkey < 500
            EXCEPT ALL
            SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey < 500
        )
    """,
    section="C24",
    description="bag-semantics set ops: multiplicity-aware intersect/except",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 500)
    a = li.filter(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.filter(F.col("l_returnflag") == "R").select("l_quantity")
    inter = a.intersectAll(r).select(F.lit("intersect_all").alias("op"), "l_quantity")
    exc = a.exceptAll(r).select(F.lit("except_all").alias("op"), "l_quantity")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# C23 — union-by-name with missing columns
# ---------------------------------------------------------------------------


@graded(
    "setop_union_missing_cols",
    oracle="""
        SELECT c_custkey AS entity_id, c_acctbal AS balance, c_mktsegment AS segment
        FROM customer WHERE c_custkey < 100
        UNION ALL
        SELECT s_suppkey AS entity_id, s_acctbal AS balance, NULL AS segment
        FROM supplier WHERE s_suppkey < 50
    """,
    section="C23",
    description="unionByName(allowMissingColumns): absent columns null-filled",
)
def setop_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") < 100)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_suppkey") < 50)
        .select(
            F.col("s_suppkey").alias("entity_id"),
            F.col("s_acctbal").alias("balance"),
        )
    )
    return cust.unionByName(supp, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# C21 — top-k per group
# ---------------------------------------------------------------------------


@graded(
    "topk_per_group",
    oracle="""
        SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
            SELECT o_orderstatus, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    section="C21",
    description="top-3 orders by value within each status (rank-then-filter)",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        load(spark, "orders", sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# C22 — global sort / limit (planner emits TakeOrderedAndProject)
# ---------------------------------------------------------------------------


@graded(
    "global_topk",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 15
    """,
    section="C22",
    description="global ordered top-k — physical plan is TakeOrderedAndProject, "
    "a per-partition heap + driver merge: no global sort at 100 TB",
)
def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "lineitem", sf_dir)
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(15)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# C23 — union
# ---------------------------------------------------------------------------


@graded(
    "setop_union_all",
    oracle="""
        SELECT nationkey, role, count(*) AS n FROM (
            SELECT c_nationkey AS nationkey, 'customer' AS role FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 'supplier' AS role FROM supplier
        ) GROUP BY 1, 2
    """,
    section="C23",
    description="bag union of two role-tagged projections",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("role")
    )
    supp = load(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("role")
    )
    return cust.unionByName(supp).groupBy("nationkey", "role").agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# C24 — intersect / except
# ---------------------------------------------------------------------------


@graded(
    "setop_intersect_except",
    oracle="""
        SELECT 'intersect' AS op, p_size FROM (
            SELECT p_size FROM part WHERE p_type LIKE 'SMALL%'
            INTERSECT
            SELECT p_size FROM part WHERE p_type LIKE 'LARGE%'
        )
        UNION ALL
        SELECT 'except' AS op, p_size FROM (
            SELECT p_size FROM part WHERE p_type LIKE 'SMALL%'
            EXCEPT
            SELECT p_size FROM part WHERE p_type LIKE 'PROMO%'
        )
    """,
    section="C24",
    description="set intersection and difference over part sizes",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, "part", sf_dir)
    small = part.filter(F.col("p_type").like("SMALL%")).select("p_size")
    large = part.filter(F.col("p_type").like("LARGE%")).select("p_size")
    promo = part.filter(F.col("p_type").like("PROMO%")).select("p_size")
    inter = small.intersect(large).select(F.lit("intersect").alias("op"), "p_size")
    exc = small.subtract(promo).select(F.lit("except").alias("op"), "p_size")
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# C25 — scalar subquery / decorrelation (SQL surface)
# ---------------------------------------------------------------------------


@graded(
    "scalar_subquery",
    oracle="""
        SELECT o_orderstatus, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        GROUP BY 1
    """,
    section="C25",
    description="scalar subquery in predicate, via the spark.sql surface",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# C26 — sampling (rows-only: RNG differs across engines by design)
# ---------------------------------------------------------------------------


@graded(
    "sample_seeded",
    oracle=None,
    section="C26",
    description="reproducible Bernoulli sample (seeded) — rows-only by design",
)
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .sample(fraction=0.05, seed=42)
        .select("o_orderkey", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# C13 (depth) — exact correlation/covariance from integer power sums
# ---------------------------------------------------------------------------


@graded(
    "agg_corr_exact",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sx,
                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
                          * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sxx,
                   CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)
                          * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)
                          * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, n,
               round(sxy / n - (sx / n) * (sy / n), 4) AS cov_pop,
               round((sxy / n - (sx / n) * (sy / n))
                     / sqrt((sxx / n - (sx / n) * (sx / n))
                          * (syy / n - (sy / n) * (sy / n))), 6) AS corr
        FROM s
    """,
    section="C13",
    description="exact Pearson correlation + covariance (quantity-cents vs "
    "floored-dollar price) from integer power sums — one grouped pass, "
    "deterministic across engines/partitionings where the built-in "
    "streaming corr estimator is not.  Dollar (not cent) scaling on the "
    "price keeps sum(y*y) within int64 out to ~sf100",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    x = cents("l_quantity")
    y = F.floor("l_extendedprice").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    cov = F.col("sxy") / F.col("n") - mx * my
    varx = F.col("sxx") / F.col("n") - mx * mx
    vary = F.col("syy") / F.col("n") - my * my
    return s.select(
        "l_returnflag",
        "n",
        F.round(cov, 4).alias("cov_pop"),
        F.round(cov / F.sqrt(varx * vary), 6).alias("corr"),
    )


@graded(
    "window_value_functions",
    oracle="""
        SELECT o_orderkey,
               first_value(o_orderkey) OVER w AS first_k,
               last_value(o_orderkey) OVER w AS last_k,
               nth_value(o_orderkey, 2) OVER w AS second_k
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="C19",
    description="window value functions: first_value / last_value / "
    "nth_value over a full-partition frame with a total order "
    "(o_orderdate, o_orderkey tie-break) — deterministic across engines",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_k"),
            F.last("o_orderkey").over(w).alias("last_k"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_k"),
        )
    )


@graded(
    "agg_gini_exact",
    oracle=f"""
        WITH ranked AS (
            SELECT c_mktsegment,
                   {cents_sql('o_totalprice')} AS v,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY {cents_sql('o_totalprice')}, o_orderkey) AS i
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum(v) AS BIGINT) AS total_cents,
               round((2.0 * CAST(sum(i * v) AS DOUBLE))
                       / (CAST(count(*) AS DOUBLE) * CAST(sum(v) AS DOUBLE))
                     - (count(*) + 1.0) / count(*), 6) AS gini
        FROM ranked GROUP BY 1
    """,
    section="C11,C18,C13",
    description="exact Gini coefficient of revenue concentration per "
    "segment: rank-weighted integer-cents sums over a total order "
    "(price, orderkey tie-break) — the inequality/concentration measure, "
    "deterministic across engines; one keyed window + one grouped agg",
)
def agg_gini_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted values.

    Σ(i·xᵢ) is a SUM of up-to-10¹⁴ terms, so it leaves int64 around
    n≈10⁵·(10⁷-cent values)·64× replication — the x64 ladder found this.
    Spark therefore sums in decimal(38,0) (exact 128-bit partial aggs),
    matching DuckDB's automatic HUGEINT sum; both render to DOUBLE of the
    same exact integer, so the final expression is still the identical
    double arithmetic on identical values.  Σx and the denominator are
    multiplied in double for the same reason (n·Σx ≈ 8×10¹⁹ at x64)."""
    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", cents("o_totalprice").alias("v")
    )
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    )
    w = Window.partitionBy("c_mktsegment").orderBy("v", "o_orderkey")
    ranked = joined.select(
        "c_mktsegment", "v", F.row_number().over(w).alias("i")
    )
    iv = F.col("i").cast("decimal(38,0)") * F.col("v")
    return ranked.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("total_cents"),
        F.round(
            (2.0 * F.sum(iv).cast("double"))
            / (F.count("*").cast("double") * F.sum("v").cast("double"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


@graded(
    "agg_mode_exact",
    oracle="""
        SELECT o_custkey, o_orderpriority AS modal_priority, n
        FROM (
            SELECT o_custkey, o_orderpriority, count(*) AS n,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY count(*) DESC, o_orderpriority) AS r
            FROM orders GROUP BY 1, 2
        ) WHERE r = 1
    """,
    section="C11,C18",
    description="exact per-group mode with deterministic tiebreak: most "
    "frequent order priority per customer (count desc, value asc) — the "
    "two-level groupBy + rank idiom that replaces a non-deterministic "
    "mode() on any engine",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per (group, value), then rank-1 per group: both shuffles are
    keyed (group, value) then (group) — map-side combined, no value-list
    materialization per group, skew-safe for bounded value domains."""
    orders = load(spark, "orders", sf_dir)
    counts = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("n"), "o_orderpriority")
    return (
        counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("modal_priority"), "n")
    )


@graded(
    "global_dense_ids",
    oracle="""
        SELECT o_orderkey, global_id FROM (
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                       AS global_id
            FROM orders
        ) WHERE o_orderkey < 2000
    """,
    section="C18,C22,F14",
    description="global contiguous row ids over a total order WITHOUT a "
    "single-partition window: constant-group distributed prefix sum of 1s "
    "(range partition -> parallel local row_numbers -> tiny offset "
    "broadcast) — the scalable zipWithIndex; oracle is the plain global "
    "row_number, so both algorithms must assign identical ids",
)
def global_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` forces every row through ONE
    task (Spark even warns).  The distributed prefix sum assigns the
    identical ids with all sorts partition-parallel — the standard
    re-id/compaction primitive for 100 TB tables (stable ids for
    training-example manifests, densified join keys, file ordinals)."""
    from pulsar_message_filter_spark.functions.prefix import distributed_prefix_sum

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", F.lit(0).alias("__g"), F.lit(1).alias("__one")
    )
    ids = distributed_prefix_sum(
        orders, "__g", ["o_orderdate", "o_orderkey"], "__one", out_col="global_id"
    )
    return ids.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", F.col("global_id").cast("long").alias("global_id")
    )


# ---------------------------------------------------------------------------
# C11/C13 — predicate-aggregate family (count_if / bool_and / bool_or /
# FILTER-style conditional aggregation)
# ---------------------------------------------------------------------------


@graded(
    "agg_predicate_family",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
                   AS n_big,
               bool_and(o_totalprice > 900) AS all_over_900,
               bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
               CAST(min(o_custkey) FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS BIGINT) AS first_urgent_cust,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS BIGINT) AS urgent_cents
        FROM orders
        GROUP BY 1
    """,
    section="C11,C13,D4",
    description="predicate aggregates: count_if, every/bool_and, "
    "some/bool_or, and FILTER-style conditional min/sum per group — the "
    "conditional-aggregation surface (Spark count_if/every/some = DuckDB "
    "FILTER clauses and bool aggregates), all map-side combinable",
)
def agg_predicate_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.every(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.some(urgent).alias("any_urgent"),
        F.min(F.when(urgent, F.col("o_custkey"))).alias("first_urgent_cust"),
        F.sum(F.when(urgent, cents("o_totalprice"))).alias("urgent_cents"),
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (the classic operator Spark has no keyword for)
# ---------------------------------------------------------------------------


@graded(
    "pareto_frontier_2d",
    oracle="""
        WITH o AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                   CAST(epoch_us(o_orderdate) // 1000000 // 86400 AS BIGINT)
                       AS day
            FROM orders WHERE o_orderkey < 5000
        ),
        dedup AS (
            SELECT min(o_orderkey) AS o_orderkey, price_cents, day
            FROM o GROUP BY price_cents, day
        ),
        scanned AS (
            SELECT o_orderkey, price_cents, day,
                   max(day) OVER (ORDER BY price_cents DESC, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS best_day_above
            FROM dedup
        )
        SELECT o_orderkey, price_cents, day
        FROM scanned
        WHERE best_day_above IS NULL OR day > best_day_above
    """,
    section="C22,C20,F14",
    description="2-D skyline (Pareto frontier): orders not dominated in "
    "(price, recency) — maximize both — via the sort-and-running-max "
    "trick: ordered by price desc, a row survives iff its day beats the "
    "prefix max day of strictly-better-priced rows (EXCLUSIVE frame so "
    "price ties cannot knock each other out); exact-duplicate "
    "(price, day) points collapse to the lowest o_orderkey BEFORE the "
    "scan — a tied point is not dominated under strict dominance, so "
    "without the dedup the later duplicate would be wrongly excluded; "
    "the classic DB operator "
    "Spark has no SKYLINE keyword for, in one window pass over a bounded "
    "subset (scale path: two-phase distributed prefix MAX, same contract "
    "as functions/prefix.py's sums)",
)
def pareto_frontier_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sorted pass replaces the naive O(n²) dominance anti-join, and
    the sorted pass itself is the two-phase distributed prefix MAX
    (functions/prefix.py): range-partition on (price desc, key), local
    exclusive running max per partition, broadcast the per-partition
    inclusive maxima — so the skyline scan stays parallel at corpus
    scale instead of relying on the o_orderkey < 5000 bound."""
    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < 5000)
        .select(
            "o_orderkey",
            cents("o_totalprice").alias("price_cents"),
            (F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("day"),
        )
        # collapse exact-duplicate points to the lowest key: a tied point
        # is not dominated (strict dominance), so it must not be excluded
        # by its twin surviving the scan first
        .groupBy("price_cents", "day")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
    )
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_max,
    )

    return (
        distributed_prefix_max(
            o,
            [F.desc("price_cents"), "o_orderkey"],
            "day",
            "best_day_above",
            exclusive=True,
        )
        .filter(
            F.col("best_day_above").isNull()
            | (F.col("day") > F.col("best_day_above"))
        )
        .select("o_orderkey", "price_cents", "day")
    )
