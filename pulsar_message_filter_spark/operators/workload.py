"""Extended TPC-H-shape workload queries (SURVEY.md §2.C composite coverage).

The fixture schema is a TPC-H *subset* (FIXTURES.md: no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode, single-word p_type), so each
query keeps the upstream query's *shape* — the operator composition the
optimizer must handle — with predicates adapted to the columns that exist:

* Q4's  "commit < receipt" lateness  → ``l_shipdate > o_orderdate + 30 days``
* Q12's ship-mode buckets            → fast/slow ship-latency buckets
* Q17/Q20/Q22's correlated averages  → exact integer-cents cross-multiplied
  comparisons (`qty * 2n < sum` instead of `qty < 0.5 * avg`), so the
  predicate is bit-identical on both engines — no float-boundary flakes
  (SURVEY.md §7.4.3, memory: oracle-parity-traps)
* partsupp-based supplier relations (Q16/Q20) → derived from lineitem

Scale posture: every dim join is broadcast (region/nation/supplier/part at
100 TB remain MB–GB-scale), fact-side aggregates are partial-before-shuffle
(Catalyst default for all aggs used), EXISTS/NOT EXISTS compile to left-semi
/ left-anti joins — no correlated per-row subquery execution anywhere.

Reference parity note: the snapshot at /root/reference contains only
README.md:1 (project title); these queries implement the graded relational
surface defined by SURVEY.md §2.C/§0.3, not ported reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded

_REV_C4 = None  # computed per-query: cents(price) * cents(1 - discount)


def _rev_c4() -> F.Column:
    return cents("l_extendedprice") * cents(F.lit(1) - F.col("l_discount"))


_REV_C4_SQL = f"{cents_sql('l.l_extendedprice')} * {cents_sql('1 - l.l_discount')}"


@graded(
    "q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY 1
    """,
    section="C6,C25,C11",
    description="order-priority check (TPC-H Q4 shape): correlated EXISTS "
    "with a non-equi time condition, compiled to a left-semi join",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@graded(
    "q8_market_share",
    oracle=f"""
        WITH base AS (
          SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                 {_REV_C4_SQL} AS rev_c4,
                 sn.n_name AS supp_nation
          FROM lineitem l
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
          JOIN region r   ON cn.n_regionkey = r.r_regionkey
          JOIN part p     ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
          WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        SELECT o_year,
               100.0 * sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_c4 ELSE 0 END)
                     / sum(rev_c4) AS mkt_share_pct
        FROM base GROUP BY 1
    """,
    section="C4,C8,C11,D4",
    description="national market share (TPC-H Q8 shape): 8-table star join, "
    "conditional-aggregate ratio on exact integer cents",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, "customer", sf_dir)
    cn = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    p = load(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    s = load(spark, "supplier", sf_dir)
    sn = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    base = (
        # broadcast the selective part filter FIRST: it prunes lineitem on
        # the scan side, so the expensive l_orderkey join moves ~p_type
        # selectivity fewer rows — the semi-join-pushdown shape that
        # dominates q8 cost at scale
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_c4().alias("rev_c4"),
            F.col("supp_nation"),
        )
    )
    return base.groupBy("o_year").agg(
        (
            100.0
            * F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev_c4")).otherwise(F.lit(0)))
            / F.sum("rev_c4")
        ).alias("mkt_share_pct")
    )


@graded(
    "q9_product_profit",
    oracle=f"""
        SELECT sn.n_name AS supp_nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               sum({_REV_C4_SQL}) / 10000.0 AS profit
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    section="C4,C8,C11,D2",
    description="product-type profit by nation and year (TPC-H Q9 shape)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_name").like("%widget%"))
    s = load(spark, "supplier", sf_dir)
    sn = load(spark, "nation", sf_dir)
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(_rev_c4()) / 10000.0).alias("profit"))
    )


@graded(
    "q11_important_parts",
    oracle=f"""
        WITH pv AS (SELECT l.l_partkey,
                           CAST(sum({_REV_C4_SQL}) AS BIGINT) AS value_c4
                    FROM lineitem l GROUP BY 1),
             tot AS (SELECT CAST(sum(value_c4) AS BIGINT) AS total_c4,
                            count(*) AS n_parts
                     FROM pv)
        SELECT pv.l_partkey, pv.value_c4 / 10000.0 AS part_value
        FROM pv, tot
        WHERE 2 * pv.value_c4 * tot.n_parts > 3 * tot.total_c4
    """,
    section="C11,C25",
    description="important parts (TPC-H Q11 shape): parts worth >1.5x the "
    "average part value — scalar-subquery threshold cross-multiplied to "
    "exact integers, scale-invariant across SFs",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    pv = li.groupBy("l_partkey").agg(F.sum(_rev_c4()).alias("value_c4"))
    tot = pv.agg(F.sum("value_c4").alias("total_c4"), F.count("*").alias("n_parts"))
    return (
        pv.join(F.broadcast(tot))
        .filter(2 * F.col("value_c4") * F.col("n_parts") > 3 * F.col("total_c4"))
        .select("l_partkey", (F.col("value_c4") / 10000.0).alias("part_value"))
    )


@graded(
    "q12_shipping_buckets",
    oracle="""
        SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                    THEN 'fast' ELSE 'slow' END AS ship_speed,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
    section="C4,C11,D4",
    description="shipping-latency priority buckets (TPC-H Q12 shape, "
    "ship-mode replaced by fast/slow latency buckets)",
)
def q12_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                "fast",
            )
            .otherwise("slow")
            .alias("ship_speed"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).alias("low_line_count"),
        )
    )


@graded(
    "q15_top_supplier",
    oracle=f"""
        WITH rev AS (SELECT l.l_suppkey,
                            CAST(sum({_REV_C4_SQL}) AS BIGINT) AS rev_c4
                     FROM lineitem l
                     WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
                     GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, rev.rev_c4 / 10000.0 AS total_revenue
        FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        WHERE rev.rev_c4 = (SELECT max(rev_c4) FROM rev)
    """,
    section="C25,C11,C4",
    description="top supplier (TPC-H Q15 shape): max-revenue scalar subquery "
    "against a derived revenue view; equality on exact integer cents",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, "supplier", sf_dir)
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_c4()).alias("rev_c4"))
    mx = rev.agg(F.max("rev_c4").alias("max_c4"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_c4") == F.col("max_c4"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_c4") / 10000.0).alias("total_revenue"))
    )


@graded(
    "q16_part_supplier_variety",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        LIMIT 20
    """,
    section="C4,C12,C22",
    description="part-supplier variety (TPC-H Q16 shape, lineitem as the "
    "partsupp stand-in): count-distinct with full deterministic tiebreak",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@graded(
    "q17_small_qty_revenue",
    oracle=f"""
        WITH pq AS (SELECT l_partkey,
                           CAST(sum({cents_sql('l_quantity')}) AS BIGINT) AS sum_qc,
                           count(*) AS n
                    FROM lineitem GROUP BY 1)
        SELECT CAST(sum({cents_sql('l.l_extendedprice')}) AS BIGINT) / 700.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#3'
        JOIN pq     ON pq.l_partkey = l.l_partkey
        WHERE {cents_sql('l.l_quantity')} * 2 * pq.n < pq.sum_qc
    """,
    section="C25,C11",
    description="small-quantity revenue (TPC-H Q17 shape): per-part average "
    "threshold, cross-multiplied to exact integers (qty*2n < sum) so the "
    "correlated-average comparison is bit-identical on both engines",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(cents("l_quantity")).alias("sum_qc"), F.count("*").alias("n")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .filter(cents("l_quantity") * 2 * F.col("n") < F.col("sum_qc"))
        .agg((F.sum(cents("l_extendedprice")) / 700.0).alias("avg_yearly"))
    )


@graded(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT sum({_REV_C4_SQL}) / 10000.0 AS revenue,
               count(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    section="C4,C2,C11",
    description="disjunctive predicate revenue (TPC-H Q19 shape): OR-of-ANDs "
    "across both join sides — exercises CNF extraction for pushdown",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            (F.sum(_rev_c4()) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@graded(
    "q20_dominant_suppliers",
    oracle=f"""
        WITH ps AS (SELECT l_partkey, l_suppkey,
                           CAST(sum({cents_sql('l_quantity')}) AS BIGINT) AS q
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                    GROUP BY 1, 2),
             pt AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tot,
                           count(*) AS nsupp
                    FROM ps GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, count(*) AS n_dominated_parts
        FROM ps
        JOIN pt ON ps.l_partkey = pt.l_partkey
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        WHERE pt.nsupp >= 2 AND 2 * ps.q > pt.tot
        GROUP BY 1, 2
    """,
    section="C25,C11,C4",
    description="dominant suppliers (TPC-H Q20 shape, lineitem as partsupp "
    "stand-in): suppliers shipping >50% of a multi-supplier part's 1997 "
    "volume — nested aggregate thresholds on exact integer quantities",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load(spark, "supplier", sf_dir)
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(cents("l_quantity")).alias("q"))
    pt = ps.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("q").alias("tot"), F.count("*").alias("nsupp")
    )
    return (
        ps.join(pt, F.col("l_partkey") == F.col("pt_partkey"))
        .filter((F.col("nsupp") >= 2) & (2 * F.col("q") > F.col("tot")))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominated_parts"))
    )


@graded(
    "q21_waiting_suppliers",
    oracle="""
        WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
                           CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END AS late
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey
                    WHERE o.o_orderstatus = 'F'),
             os AS (SELECT l_orderkey,
                           count(DISTINCT l_suppkey) AS ns,
                           count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nl,
                           max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
                    FROM lo GROUP BY 1)
        SELECT s.s_name, count(*) AS numwait
        FROM os JOIN supplier s ON os.late_supp = s.s_suppkey
        WHERE os.ns >= 2 AND os.nl = 1
        GROUP BY 1
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
    """,
    section="C25,C12,C22",
    description="suppliers who kept multi-supplier orders waiting (TPC-H Q21 "
    "shape): the sole late supplier among >=2 on finished orders — the "
    "EXISTS/NOT-EXISTS double correlation rewritten as one grouped pass",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    s = load(spark, "supplier", sf_dir)
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.col("l_suppkey"),
    )
    os = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.countDistinct(late).alias("nl"),
            F.max(late).alias("late_supp"),
        )
    )
    return (
        os.filter((F.col("ns") >= 2) & (F.col("nl") == 1))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@graded(
    "join_null_safe",
    oracle="""
        WITH a AS (SELECT o_orderkey,
                          CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                               ELSE o_orderpriority END AS prio
                   FROM orders WHERE o_orderkey < 2000),
             b AS (SELECT CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                               ELSE o_orderpriority END AS prio,
                          CAST(count(*) AS BIGINT) AS n_all
                   FROM orders GROUP BY 1)
        SELECT a.o_orderkey, coalesce(a.prio, 'NULL') AS prio_str, b.n_all
        FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
    section="C4,D4",
    description="null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other, unlike plain equality's 3VL drop",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    nullable_prio = F.when(
        F.col("o_orderpriority") == "5-LOW", F.lit(None)
    ).otherwise(F.col("o_orderpriority"))
    a = orders.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", nullable_prio.alias("prio_a")
    )
    b = orders.groupBy(nullable_prio.alias("prio_b")).agg(
        F.count("*").alias("n_all")
    )
    return (
        a.join(F.broadcast(b), F.col("prio_a").eqNullSafe(F.col("prio_b")))
        .select(
            "o_orderkey",
            F.coalesce(F.col("prio_a"), F.lit("NULL")).alias("prio_str"),
            "n_all",
        )
    )


@graded(
    "rollup_two_level",
    oracle=f"""
        WITH hourly AS (
          SELECT date_trunc('hour', l_shipdate) AS h,
                 l_returnflag,
                 CAST(sum({cents_sql('l_extendedprice')}) AS BIGINT) AS price_c,
                 CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1, 2)
        SELECT CAST(date_trunc('day', h) AS DATE)::VARCHAR AS d,
               l_returnflag,
               CAST(sum(price_c) AS BIGINT) AS price_cents,
               CAST(sum(n) AS BIGINT) AS n_lines
        FROM hourly GROUP BY 1, 2
    """,
    section="C11,E1",
    description="two-level re-aggregation (continuous-aggregate pattern): "
    "hourly partials re-aggregated to daily — the decomposable-aggregate "
    "contract that makes streaming rollups and incremental materialized "
    "views exact; graded against a direct daily aggregation",
)
def rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    hourly = li.groupBy(
        F.date_trunc("hour", "l_shipdate").alias("h"), "l_returnflag"
    ).agg(
        F.sum(cents("l_extendedprice")).alias("price_c"),
        F.count("*").alias("n"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("d"),
        "l_returnflag",
    ).agg(
        F.sum("price_c").alias("price_cents"),
        F.sum("n").alias("n_lines"),
    )


@graded(
    "order_nulls_last",
    oracle=f"""
        WITH recent AS (SELECT * FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
             per_cust AS (
          SELECT c.c_custkey,
                 max({cents_sql('o.o_totalprice')}) AS max_price_c
          FROM customer c
          LEFT JOIN recent o ON c.c_custkey = o.o_custkey
          GROUP BY 1)
        SELECT c_custkey, max_price_c
        FROM per_cust
        ORDER BY max_price_c ASC NULLS FIRST, c_custkey
        LIMIT 25
    """,
    section="C22,C5",
    description="explicit null ordering: outer-join-produced NULLs (max over "
    "an empty group) placed NULLS FIRST with a deterministic id tiebreak — "
    "the graded top-25 actually contains NULL rows at every SF",
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderdate") >= "2000-01-01")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.max(cents("o_totalprice")).alias("max_price_c"))
    )
    return per_cust.orderBy(
        F.col("max_price_c").asc_nulls_first(), "c_custkey"
    ).limit(25)


@graded(
    "q22_idle_customers",
    oracle=f"""
        WITH avgbal AS (SELECT CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS s,
                               count(*) AS n
                        FROM customer WHERE c_acctbal > 0)
        SELECT c.c_nationkey, count(*) AS n_cust,
               CAST(sum({cents_sql('c.c_acctbal')}) AS BIGINT) / 100.0 AS total_bal
        FROM customer c, avgbal
        WHERE {cents_sql('c.c_acctbal')} * avgbal.n > avgbal.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY 1
    """,
    section="C6,C25,C11",
    description="lapsed wealthy customers (TPC-H Q22 shape): above-average "
    "balance (exact cross-multiplied compare) with no orders since 2000 "
    "(anti-join), grouped by nation",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    avgbal = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("s"), F.count("*").alias("n")
    )
    return (
        c.join(F.broadcast(avgbal))
        .filter(cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("total_bal"),
        )
    )


@graded(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   min({cents_sql('l_extendedprice')}) AS cost_c
            FROM lineitem GROUP BY 1, 2
        ), eu AS (
            SELECT ps.l_partkey AS p_partkey, s.s_name, n.n_name,
                   s.s_acctbal, ps.cost_c
            FROM ps
            JOIN supplier s ON ps.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            JOIN part p     ON ps.l_partkey = p.p_partkey
            WHERE r.r_name = 'EUROPE' AND p.p_size = 15
        )
        SELECT p_partkey, s_name, n_name, s_acctbal, cost_c
        FROM (SELECT *, min(cost_c) OVER (PARTITION BY p_partkey) AS mc FROM eu)
        WHERE cost_c = mc
    """,
    section="C4,C8,C11,C25",
    description="min-cost supplier per part (TPC-H Q2 shape): partsupp relation "
    "derived from lineitem (fixture has no partsupp table), correlated-min "
    "subquery expressed as a window min — exact integer-cents cost, no float "
    "boundary",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over the fixture subset.

    The correlated scalar subquery (``cost = (SELECT min(cost) ... WHERE
    partkey = p_partkey)``) is expressed as a partition-window min over the
    already-filtered join — one shuffle keyed by part, no per-row subquery.
    Scale posture: part/supplier/nation/region are broadcast dims; the only
    fact-side shuffles are the partsupp derivation (partial-aggregated
    groupBy) and the window partition, both keyed by ~uniform part keys.
    """
    ps = (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("cost_c"))
    )
    p = load(spark, "part", sf_dir).filter(F.col("p_size") == 15)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    eu = (
        ps.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "cost_c")
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("mc", F.min("cost_c").over(w))
        .filter(F.col("cost_c") == F.col("mc"))
        .drop("mc")
    )
