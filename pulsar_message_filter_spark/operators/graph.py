"""Distributed graph analytics over co-occurrence graphs (SURVEY.md §2.F14
scale patterns; complements the iterative ops in dedup.py —
``connected_components`` label propagation and ``pagerank_neardup_hubs``).

Triangle counting is the canonical "looks quadratic, isn't" distributed
graph kernel: the naive wedge join explodes on hub nodes (a node of degree
d contributes d² wedge candidates), so at 100 TB the standard fix is
**degree orientation** (Cohen 2009; Suri & Vassilvitskii "MapReduce
triangle counting", WWW 2011 — public): orient every undirected edge from
its lower-(degree, id) endpoint to the higher one.  The oriented
out-degree is bounded by O(√m) regardless of skew, so the wedge join's
fan-out is bounded per node — hub nodes stop being quadratic hot keys.
Each triangle {a ≺ b ≺ c} (≺ = the degree-then-id total order) is counted
exactly once: as the wedge (b, c) at its smallest vertex a closed by the
oriented edge b→c.

Everything is DataFrame algebra: two self-equi-joins on int keys (shuffle
on node id, AQE-skew-splittable) and one semi-join — no UDF, no driver
state.  The triangle count is orientation-invariant, so the DuckDB oracle
uses the plain a<b<c triple-join form; matching counts across two
*different* algorithms is a stronger check than re-running the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Distinct undirected co-occurrence edges (u < v): items appearing in
    the same group.  The self-join is keyed by ``group_col`` — per-group
    fan-out is C(group size, 2), fine for bounded baskets (orders average
    ~4 parts); for heavy groups, cap or sample the group upstream."""
    pairs = df.select(group_col, item_col).distinct()
    a, b = pairs.alias("a"), pairs.alias("b")
    return (
        a.join(b, group_col)
        .filter(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .select(
            F.col(f"a.{item_col}").alias("u"),
            F.col(f"b.{item_col}").alias("v"),
        )
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Node degrees of an undirected (u < v) edge set."""
    nodes = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("deg"))


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Orient each edge from its lower-(deg, id) endpoint to the higher —
    the O(√m)-out-degree transformation that makes the wedge join safe on
    skewed (hub-heavy) graphs."""
    deg = degrees(edges)
    e = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("sdeg"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count via degree-oriented wedge join.

    Wedges are enumerated at each triangle's ≺-smallest vertex (bounded
    out-degree), ordered (b ≺ c) so each candidate appears once, then
    closed by a semi-join against the oriented edge list.  Three shuffles
    total (degree agg, wedge join on src, closing join on (b, c)) — the
    100 TB shape; no node ever materializes a d² candidate set where d is
    its full undirected degree."""
    # no .persist(): a graded sweep runs hundreds of queries in one
    # session and caches without a matching unpersist leak for its
    # lifetime; Catalyst's ReusedExchange dedups the shared subplan here.
    # A production caller doing ONE big count should persist + unpersist
    # around the action.
    o = orient_by_degree(edges)
    e1 = o.select(
        F.col("src"),
        F.col("dst").alias("b"),
        F.col("ddeg").alias("bdeg"),
    )
    e2 = o.select(
        F.col("src"),
        F.col("dst").alias("c"),
        F.col("ddeg").alias("cdeg"),
    )
    wedges = e1.join(e2, "src").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closing, ["b", "c"], "left_semi").agg(
        F.count("*").alias("n_triangles")
    )


@graded(
    "graph_triangle_count",
    oracle="""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, count(*) AS d
            FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
            GROUP BY 1
        ),
        tri AS (
            SELECT count(*) AS t
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT count(*) FROM deg) AS n_nodes,
               (SELECT count(*) FROM e) AS n_edges,
               (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
               (SELECT t FROM tri) AS n_triangles,
               (3.0 * (SELECT t FROM tri))
                   / (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
                   AS global_clustering
    """,
    section="C4,C11,F14",
    description="exact triangle count on the part co-purchase graph via "
    "degree-oriented wedge join (O(sqrt m) out-degree bound — the "
    "skew-safe distributed shape); oracle runs the naive a<b<c triple "
    "join, so matching counts cross-checks two different algorithms",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = degrees(edges)
    tri = triangle_count(edges)
    summary = edges.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges"),
        )
    )
    return summary.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        ((F.lit(3.0) * F.col("n_triangles")) / F.col("n_wedges")).alias(
            "global_clustering"
        ),
    )


# ---------------------------------------------------------------------------
# Bounded k-hop reachability (the recursive-CTE gap, closed iteratively)
# ---------------------------------------------------------------------------


def khop_counts(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Per-seed node counts at each minimum hop distance ≤ ``max_hops``.

    Spark has no recursive CTE; the engine idiom is driver-side iteration
    over DataFrame joins — each hop is one equi-join frontier expansion
    plus an anti-join against the visited set (exactly the Pregel/BFS
    superstep, expressed relationally).  The loop bound is a Python int,
    so the plan is a fixed DAG of ``max_hops`` joins — no unbounded
    recursion, checkpoint-able between supersteps on long chains.

    The DuckDB oracle uses a genuine ``WITH RECURSIVE`` walk with min-hop
    aggregation — matching counts cross-check the iterative relational
    BFS against real recursion.

    Scale: frontier and visited are (seed, node) sets shuffled on node —
    the standard distributed BFS; on power-law graphs the visited
    anti-join keeps the frontier from re-expanding hubs every superstep.
    """
    sym = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    visited = seeds.select(
        F.col("seed"), F.col("seed").alias("node"), F.lit(0).alias("hop")
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        expanded = (
            frontier.join(sym, frontier.node == sym.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        fresh = expanded.join(visited.select("seed", "node"), ["seed", "node"], "left_anti")
        frontier = fresh.withColumn("hop", F.lit(hop)).localCheckpoint(eager=True)
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return (
        visited.groupBy("seed", "hop")
        .agg(F.count("*").alias("n_nodes"))
    )


@graded(
    "graph_khop_reachability",
    oracle="""
        WITH RECURSIVE pl AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        walk(seed, node, hop) AS (
            SELECT l_partkey, l_partkey, 0 FROM (
                SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey < 5
            )
            UNION ALL
            SELECT w.seed, e.v, w.hop + 1
            FROM walk w JOIN e ON w.node = e.u
            WHERE w.hop < 2
        ),
        minhop AS (
            SELECT seed, node, min(hop) AS hop FROM walk GROUP BY 1, 2
        )
        SELECT seed, hop, count(*) AS n_nodes
        FROM minhop GROUP BY 1, 2
    """,
    section="C4,C6,F14",
    description="bounded 2-hop BFS reachability on the part co-purchase "
    "graph from seed parts <5: iterative frontier-join BFS (the Spark "
    "answer to recursive CTEs) vs a genuine WITH RECURSIVE min-hop walk "
    "in the oracle — two different algorithms must agree",
)
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    seeds = (
        li.filter(F.col("l_partkey") < 5)
        .select(F.col("l_partkey").alias("seed"))
        .distinct()
    )
    return khop_counts(edges, seeds, max_hops=2)


# ---------------------------------------------------------------------------
# Market-basket association (support / lift)
# ---------------------------------------------------------------------------


def basket_lift(
    baskets: DataFrame, group_col: str, item_col: str, min_pair_count: int
) -> DataFrame:
    """Pairwise association strength over baskets: for items co-occurring
    in ≥ ``min_pair_count`` baskets, ``lift = P(ab)/(P(a)P(b))`` computed
    as the exact integer cross-ratio ``n_ab·N / (n_a·n_b)``.

    The pair join is the same group-keyed self-join as
    :func:`cooccurrence_edges` (bounded basket fan-out); item counts
    broadcast onto the pair table.  The min-support filter runs BEFORE
    the count join — at 100 TB the long tail of 1-basket pairs never
    reaches the join, which is the difference between Apriori's candidate
    pruning and a blowup."""
    pairs = baskets.select(group_col, item_col).distinct()
    a, b = pairs.alias("a"), pairs.alias("b")
    pair_counts = (
        a.join(b, group_col)
        .filter(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .groupBy(
            F.col(f"a.{item_col}").alias("u"), F.col(f"b.{item_col}").alias("v")
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    item_counts = pairs.groupBy(item_col).agg(F.count("*").alias("n_item"))
    n_baskets = pairs.select(group_col).distinct().count()
    return (
        pair_counts.join(
            F.broadcast(item_counts.select(F.col(item_col).alias("u"),
                                           F.col("n_item").alias("n_a"))), "u")
        .join(
            F.broadcast(item_counts.select(F.col(item_col).alias("v"),
                                           F.col("n_item").alias("n_b"))), "v")
        .select(
            "u", "v", "n_ab", "n_a", "n_b",
            ((F.col("n_ab") * F.lit(n_baskets)) / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        )
    )


@graded(
    "basket_lift_pairs",
    oracle="""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pair_counts AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS n_ab
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 3
        ),
        item_counts AS (SELECT l_partkey, count(*) AS n_item FROM pl GROUP BY 1),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM pl)
        SELECT u, v, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
               (n_ab * n_baskets) / (ia.n_item * ib.n_item) AS lift
        FROM pair_counts
        JOIN item_counts ia ON ia.l_partkey = u
        JOIN item_counts ib ON ib.l_partkey = v
        CROSS JOIN n
        ORDER BY lift DESC, u, v LIMIT 20
    """,
    section="C4,C11,C22,F14",
    description="market-basket lift: top-20 part pairs by n_ab*N/(n_a*n_b) "
    "with min-support pruning before the count join (the Apriori "
    "anti-blowup), broadcast item counts, TakeOrdered top-k — exact "
    "integer cross-ratio, deterministic tiebreak",
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    out = basket_lift(li, "l_orderkey", "l_partkey", min_pair_count=3)
    return out.orderBy(F.desc("lift"), "u", "v").limit(20)


@graded(
    "basket_lift_weekly",
    oracle="""
        WITH pl AS (
            SELECT DISTINCT CAST((day(ts) - 1) // 7 AS INTEGER) AS week,
                   user_id, CAST(ts AS DATE) AS d, event_type AS item
            FROM events
        ),
        pair_counts AS (
            SELECT a.week, a.item AS u, b.item AS v, CAST(count(*) AS BIGINT) AS n_ab
            FROM pl a JOIN pl b
              ON a.week = b.week AND a.user_id = b.user_id AND a.d = b.d
             AND a.item < b.item
            GROUP BY 1, 2, 3 HAVING count(*) >= 20
        ),
        item_counts AS (
            SELECT week, item, CAST(count(*) AS BIGINT) AS n_item
            FROM pl GROUP BY 1, 2
        ),
        n AS (
            SELECT week, CAST(count(*) AS BIGINT) AS n_baskets
            FROM (SELECT DISTINCT week, user_id, d FROM pl) GROUP BY 1
        )
        SELECT pc.week AS week, u, v, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
               round((n_ab * n_baskets) / (ia.n_item * ib.n_item), 6) AS lift
        FROM pair_counts pc
        JOIN item_counts ia ON ia.week = pc.week AND ia.item = u
        JOIN item_counts ib ON ib.week = pc.week AND ib.item = v
        JOIN n ON n.week = pc.week
        ORDER BY pc.week, u, v
    """,
    section="C4,C11,F14",
    description="association-trend mining: market-basket lift per calendar "
    "week (basket = user-day, items = event types) -- shows whether an "
    "item association strengthens or decays over time; same Apriori-style "
    "min-support pruning before the count join as basket_lift_pairs, "
    "per-week item counts and basket totals broadcast onto the pair table",
)
def basket_lift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    pl = ev.select(
        F.floor((F.dayofmonth("ts") - 1) / 7).cast("int").alias("week"),
        "user_id",
        F.to_date("ts").alias("d"),
        F.col("event_type").alias("item"),
    ).distinct()
    a, b = pl.alias("a"), pl.alias("b")
    pair_counts = (
        a.join(b, ["week", "user_id", "d"])
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy("week", F.col("a.item").alias("u"), F.col("b.item").alias("v"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    item_counts = pl.groupBy("week", "item").agg(F.count("*").alias("n_item"))
    n_baskets = (
        pl.select("week", "user_id", "d")
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("n_baskets"))
    )
    return (
        pair_counts.join(
            F.broadcast(
                item_counts.select(
                    "week", F.col("item").alias("u"), F.col("n_item").alias("n_a")
                )
            ),
            ["week", "u"],
        )
        .join(
            F.broadcast(
                item_counts.select(
                    "week", F.col("item").alias("v"), F.col("n_item").alias("n_b")
                )
            ),
            ["week", "v"],
        )
        .join(F.broadcast(n_baskets), "week")
        .select(
            "week", "u", "v", "n_ab", "n_a", "n_b",
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("week", "u", "v")
    )


# ---------------------------------------------------------------------------
# Per-node local clustering coefficient (triangle attribution)
# ---------------------------------------------------------------------------


def node_triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts via the degree-oriented
    wedge join — same O(√m)-bounded enumeration as :func:`triangle_count`,
    but the closing join is an INNER join (not semi) so each triangle's
    three vertices can be attributed: the (src, b, c) triple is exploded
    to its three member nodes and count-aggregated.  Output ``(node,
    n_tri)``; nodes in no triangle are absent (left-join + coalesce at the
    caller)."""
    # o feeds three branches (both wedge sides + the closing join) with
    # different projections - checkpoint it so the degree joins run once;
    # it is n_edges rows of 4 ints, the cheapest frame in the pipeline
    o = orient_by_degree(edges).localCheckpoint(eager=True)
    e1 = o.select("src", F.col("dst").alias("b"), F.col("ddeg").alias("bdeg"))
    e2 = o.select("src", F.col("dst").alias("c"), F.col("ddeg").alias("cdeg"))
    wedges = e1.join(e2, "src").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    triangles = wedges.join(closing, ["b", "c"]).select("src", "b", "c")
    # one narrow 1->3 explode, NOT a 3-way unionAll of selects: the union
    # form re-evaluates the wedge+closing join once per branch (no common
    # exchange to reuse across differing projections) - measured 16 s vs
    # ~2 s at sf0.1 for the exploded single-pass form
    members = triangles.select(
        F.explode(F.array("src", "b", "c")).alias("node")
    )
    return members.groupBy("node").agg(F.count("*").alias("n_tri"))


@graded(
    "graph_local_clustering",
    oracle="""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT node, count(*) AS deg
            FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
            GROUP BY 1
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        per_node AS (
            SELECT node, count(*) AS n_tri
            FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            )
            GROUP BY 1
        )
        SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
               CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
               round(CAST(2 * COALESCE(p.n_tri, 0) AS DOUBLE)
                     / (d.deg * (d.deg - 1)), 6) AS local_cc
        FROM deg d LEFT JOIN per_node p ON p.node = d.node
        WHERE d.deg >= 2
    """,
    section="C4,C11,F14",
    description="per-node local clustering coefficient on the part "
    "co-purchase graph: 2*tri(v)/(deg(v)*(deg(v)-1)) for deg>=2 — triangle "
    "attribution via the same degree-oriented wedge join as the global "
    "count (inner closing join + 3-way member explode), cross-checked "
    "against the naive a<b<c triple-join oracle",
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The node-level refinement of :func:`graph_triangle_count`: which
    parts sit in densely cross-sold neighborhoods (template/bundle
    detection — the graph analog of the near-dup hub score).  Shape: the
    wedge join is the only super-linear-risk step and stays O(√m)-bounded
    per node; everything else is keyed aggregation."""
    li = load(spark, "lineitem", sf_dir)
    # materialize the co-occurrence self-join ONCE: degrees, orientation
    # and the closing join all branch from `edges` with different
    # projections, so ReusedExchange cannot dedup them - without the
    # checkpoint the lineitem self-join runs 4x (measured 12 s vs ~3 s at
    # sf0.1).  Same lineage-truncation pattern as connected_components.
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint(
        eager=True
    )
    deg = degrees(edges)
    per_node = node_triangle_counts(edges)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, deg.node == per_node.node, "left")
        .select(
            deg.node.alias("node"),
            F.col("deg").cast("long").alias("deg"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                (2 * F.coalesce(F.col("n_tri"), F.lit(0))).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("local_cc"),
        )
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (fixed synchronous iterations)
# ---------------------------------------------------------------------------


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, public), made deterministic: every node starts with its own id
    as label; each iteration every node adopts the most frequent label
    among its NEIGHBORS, ties broken by the smallest label.  A fixed
    iteration count (not convergence polling) keeps the plan a static DAG
    and the result engine-exact — same design choice as
    :func:`~pulsar_message_filter_spark.operators.dedup.pagerank_lite_int`.

    Per iteration: one labels-to-edges equi-join, one (node, label) count
    aggregation, one node-partitioned rank window — all keyed by node id,
    ``localCheckpoint`` lineage truncation between rounds.
    Input: ``(u, v)`` undirected edges.  Output: ``(node, label)``.
    """
    sym = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    ).distinct().localCheckpoint(eager=True)
    labels = sym.select("node").distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)
    from pyspark.sql import Window

    for _ in range(iters):
        nbr_labels = sym.join(
            labels.select(F.col("node").alias("nbr"), "label"), "nbr"
        )
        counted = nbr_labels.groupBy("node", "label").agg(
            F.count("*").alias("cnt")
        )
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), "label")
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels


@graded(
    "graph_label_propagation",
    oracle="""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_orderkey < 2000),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ),
        sym AS (
            SELECT u AS node, v AS nbr FROM e
            UNION SELECT v, u FROM e
        ),
        l0 AS (SELECT DISTINCT node, node AS label FROM sym),
        it1 AS (
            SELECT node, label FROM (
                SELECT s.node, l.label,
                       row_number() OVER (PARTITION BY s.node
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM sym s JOIN l0 l ON l.node = s.nbr
                GROUP BY s.node, l.label
            ) WHERE rn = 1
        ),
        it2 AS (
            SELECT node, label FROM (
                SELECT s.node, l.label,
                       row_number() OVER (PARTITION BY s.node
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM sym s JOIN it1 l ON l.node = s.nbr
                GROUP BY s.node, l.label
            ) WHERE rn = 1
        ),
        it3 AS (
            SELECT node, label FROM (
                SELECT s.node, l.label,
                       row_number() OVER (PARTITION BY s.node
                           ORDER BY count(*) DESC, l.label) AS rn
                FROM sym s JOIN it2 l ON l.node = s.nbr
                GROUP BY s.node, l.label
            ) WHERE rn = 1
        )
        SELECT label AS community,
               CAST(count(*) AS BIGINT) AS n_members
        FROM it3
        GROUP BY 1
    """,
    section="F14,C11,C18",
    description="label-propagation communities (3 synchronous iterations, "
    "min-label tie-break -> engine-exact) on the bounded part co-purchase "
    "graph, community sizes vs a 3x-unrolled SQL oracle — the third "
    "iterative-algorithm representative next to connected components "
    "(reachability) and PageRank (centrality): mesoscale structure",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 2000)
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    labels = label_propagation(edges, iters=3)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").cast("long").alias("n_members")
    )


# ---------------------------------------------------------------------------
# Association rules: the directed support/confidence form of basket lift
# ---------------------------------------------------------------------------


@graded(
    "basket_rules",
    oracle="""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pair_counts AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM pl a JOIN pl b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 3
        ),
        item_counts AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
            FROM pl GROUP BY 1
        ),
        n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
                  AS n_baskets FROM pl),
        rules AS (
            SELECT u AS antecedent, v AS consequent, n_ab,
                   ia.n_item AS n_ante, n_baskets
            FROM pair_counts
            JOIN item_counts ia ON ia.l_partkey = u
            CROSS JOIN n
            UNION ALL
            SELECT v, u, n_ab, ib.n_item, n_baskets
            FROM pair_counts
            JOIN item_counts ib ON ib.l_partkey = v
            CROSS JOIN n
        )
        SELECT antecedent, consequent, n_ab,
               round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support,
               round(CAST(n_ab AS DOUBLE) / n_ante, 6) AS confidence
        FROM rules
        WHERE n_ab * 20 >= n_ante  -- confidence >= 0.05, integer form
    """,
    section="C4,C11,F14",
    description="association rules (directed support/confidence form of "
    "basket lift): each surviving pair emits both rule directions, "
    "confidence = P(consequent|antecedent) with an integer-cross-"
    "multiplied 0.05 floor — min-support pruning BEFORE the direction "
    "fan-out keeps the Apriori anti-blowup",
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift says a pair co-occurs beyond chance; the RULE form adds
    direction (which item predicts which) — the actually actionable
    output.  Shape: the basket_lift machinery up to pair counts, then a
    2x direction fan-out (narrow) and a broadcast item-count join."""
    pl = (
        load(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pair_counts = (
        pl.alias("a")
        .join(
            pl.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    item_counts = pl.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    n = pl.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    fwd = pair_counts.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"), "n_ab"
    )
    bwd = pair_counts.select(
        F.col("v").alias("antecedent"), F.col("u").alias("consequent"), "n_ab"
    )
    rules = fwd.unionByName(bwd).join(
        F.broadcast(
            item_counts.select(
                F.col("l_partkey").alias("antecedent"),
                F.col("n_item").alias("n_ante"),
            )
        ),
        "antecedent",
    )
    return (
        rules.filter(F.col("n_ab") * 20 >= F.col("n_ante"))
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_ante"), 6
            ).alias("confidence"),
        )
    )
