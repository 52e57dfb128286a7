"""Shared-dialect SQL surface (SURVEY.md §2.C25/B12 alternate entry path).

The engine's tables are exposed as views (``io.register_temp_views``) so
users can drive it with ``spark.sql`` instead of the DataFrame API.  The
queries here make the strongest possible parity statement: **the Spark SQL
text and the DuckDB oracle SQL are the same string** — one query text,
two engines, hash-identical results.  That pins down a portable dialect
subset (ANSI joins, EXISTS/IN subqueries, GROUPING SETS, CASE, CAST,
TIMESTAMP literals, exact integer-cents arithmetic) that survives engine
swaps — the practical definition of "standard SQL" for this engine.

Dialect subset rules (what keeps a text bi-runnable, learned from the
parity traps in tools/check_parity.py):

* alias every output column; CAST integer sums to BIGINT (DuckDB widens
  to HUGEINT, Spark stays long);
* no bare timestamp outputs (render or compare only);
* no engine-specific functions (strftime/date_format, year()'s return
  width differs — use extract-free shapes or CAST);
* floats only via the exact-cents pattern (operators/parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pulsar_message_filter_spark.io import register_temp_views
from pulsar_message_filter_spark.registry import graded

# one query text, two engines — the dict IS both sides
SHARED_SQL: dict[str, str] = {
    "sql_shared_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "sql_shared_exists": """
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND c.c_acctbal > 0
    """,
    "sql_shared_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "sql_shared_in_subquery": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    "sql_shared_case_join": """
        SELECT n.n_name,
               CAST(sum(CASE WHEN s.s_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
               CAST(sum(CASE WHEN s.s_acctbal <= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rest
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "sql_shared_window": """
        SELECT s_nationkey, s_suppkey,
               CAST(row_number() OVER (PARTITION BY s_nationkey
                                       ORDER BY s_acctbal DESC, s_suppkey)
                    AS BIGINT) AS rnk,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT))
                        OVER (PARTITION BY s_nationkey
                              ORDER BY s_acctbal DESC, s_suppkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS run_cents
        FROM supplier
    """,
    "sql_shared_cte_setops": """
        WITH hi AS (
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        ),
        lo AS (
            SELECT o_custkey FROM orders WHERE o_totalprice < 10000
        )
        SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT o_custkey FROM hi INTERSECT SELECT o_custkey FROM lo
        )
        UNION ALL
        SELECT 'hi_only', CAST(count(*) AS BIGINT) FROM (
            SELECT o_custkey FROM hi EXCEPT SELECT o_custkey FROM lo
        )
    """,
    # WITH RECURSIVE is new in Spark 4 (SPARK-24497) and long-standing in
    # DuckDB — one text, two engines, bounded-depth transitive closure
    # over a DERIVED edge set (event-type transition graph).  The depth
    # guard makes it terminate on the cyclic graph; min(depth) collapses
    # the path multiset to shortest-hops, so the result is set-stable.
    # LATERAL correlated subquery — the top-1-per-group idiom in its
    # portable SQL form (Spark 4 lateral subquery ⇄ DuckDB LATERAL)
    "sql_shared_lateral_top1": """
        SELECT n.n_name, t.top_cust, t.top_bal_cents
        FROM nation n, LATERAL (
            SELECT c.c_name AS top_cust,
                   CAST(round(c.c_acctbal * 100) AS BIGINT) AS top_bal_cents
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c.c_acctbal DESC, c.c_custkey
            LIMIT 1
        ) t
    """,
    "sql_shared_recursive_reach": """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT event_type AS src, next_type AS dst
            FROM (
                SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                           AS next_type
                FROM events
            ) WHERE next_type IS NOT NULL AND next_type <> event_type
        ),
        reach(src, dst, depth) AS (
            SELECT src, dst, 1 AS depth FROM edges
            UNION ALL
            SELECT r.src, e.dst, r.depth + 1
            FROM reach r JOIN edges e ON r.dst = e.src
            WHERE r.depth < 3
        )
        SELECT src, dst, CAST(min(depth) AS BIGINT) AS min_hops
        FROM reach GROUP BY src, dst
    """,
    # FILTER clause on aggregates (ANSI 2003) — incl. inside HAVING;
    # the conditional-aggregate idiom without CASE wrappers
    "sql_shared_filter_clause": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big,
               CAST(sum(CAST(round(value * 100) AS BIGINT))
                    FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS even_cents
        FROM events
        GROUP BY event_type
        HAVING count(*) FILTER (WHERE value > 100) > 10
    """,
    # inline VALUES relation as a join dimension — the portable way to
    # ship a tiny band/config table inside the query text itself
    "sql_shared_values_dim": """
        SELECT b.band, CAST(count(*) AS BIGINT) AS n
        FROM events e
        JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
                     ('high', 150.0, 1e9))
             AS b(band, lo, hi)
          ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    # value-based RANGE frame (not ROWS) over an integer ORDER BY —
    # the sliding numeric-band aggregate in portable form
    "sql_shared_range_frame": """
        SELECT user_id,
               CAST(sum(CAST(count(*) AS BIGINT)) OVER (
                   ORDER BY user_id
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS n_in_band
        FROM events
        WHERE user_id < 200
        GROUP BY user_id
    """,
}


def _make(name: str, sql: str, section: str, description: str) -> None:
    @graded(name, oracle=sql, section=section, description=description)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_temp_views(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name


_make(
    "sql_shared_pricing",
    SHARED_SQL["sql_shared_pricing"],
    "B12,C11,C1",
    "shared-dialect SQL: scan+filter+agg — identical text on both engines",
)
_make(
    "sql_shared_exists",
    SHARED_SQL["sql_shared_exists"],
    "B12,C25,C6",
    "shared-dialect SQL: correlated EXISTS — identical text on both engines",
)
_make(
    "sql_shared_grouping_sets",
    SHARED_SQL["sql_shared_grouping_sets"],
    "B12,C16",
    "shared-dialect SQL: GROUPING SETS — identical text on both engines",
)
_make(
    "sql_shared_in_subquery",
    SHARED_SQL["sql_shared_in_subquery"],
    "B12,C25",
    "shared-dialect SQL: IN subquery — identical text on both engines",
)
_make(
    "sql_shared_window",
    SHARED_SQL["sql_shared_window"],
    "B12,C18,C20",
    "shared-dialect SQL: ranking + running-sum windows with explicit ROWS "
    "frame — identical text on both engines (integer-cents running sum, "
    "BIGINT-cast row_number)",
)
_make(
    "sql_shared_cte_setops",
    SHARED_SQL["sql_shared_cte_setops"],
    "B12,C24,C25",
    "shared-dialect SQL: CTEs + INTERSECT/EXCEPT + UNION ALL summary — "
    "identical text on both engines",
)
_make(
    "sql_shared_case_join",
    SHARED_SQL["sql_shared_case_join"],
    "B12,C4,D4",
    "shared-dialect SQL: join + CASE aggregates — identical text on both engines",
)
_make(
    "sql_shared_lateral_top1",
    SHARED_SQL["sql_shared_lateral_top1"],
    "B12,C25,C21",
    "shared-dialect SQL: LATERAL correlated top-1 subquery per dim row — "
    "identical text on both engines",
)
_make(
    "sql_shared_recursive_reach",
    SHARED_SQL["sql_shared_recursive_reach"],
    "B12,C25,C4",
    "shared-dialect SQL: WITH RECURSIVE bounded transitive closure over a "
    "derived transition graph (Spark-4 recursive CTE) — identical text on "
    "both engines",
)
_make(
    "sql_shared_filter_clause",
    SHARED_SQL["sql_shared_filter_clause"],
    "B12,C11,D4",
    "shared-dialect SQL: ANSI FILTER clause on aggregates, incl. inside "
    "HAVING — identical text on both engines",
)
_make(
    "sql_shared_values_dim",
    SHARED_SQL["sql_shared_values_dim"],
    "B12,C9,C7",
    "shared-dialect SQL: inline VALUES relation joined as a band "
    "dimension (value-range theta join) — identical text on both engines",
)
_make(
    "sql_shared_range_frame",
    SHARED_SQL["sql_shared_range_frame"],
    "B12,C20",
    "shared-dialect SQL: value-based RANGE frame over integer ORDER BY — "
    "identical text on both engines",
)
