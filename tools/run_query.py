"""Run any graded query by name from the command line.

The operator surface is a Python API first, but an engine needs a door a
user can open without writing code::

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py f25_pii_scrub --sf /root/testdata/sf0.01 -n 5
    python tools/run_query.py f2_minhash_lsh --explain
    python tools/run_query.py --list          # every query + description
    python tools/run_query.py --sql q3_top_revenue   # the DuckDB-dialect oracle

``--explain`` prints the formatted physical plan instead of executing —
the first thing to read when a query misbehaves at scale (check for
broadcast hints honored, filters pushed to the scan, no stray Exchange).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("name", nargs="?", help="graded query name (see --list)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan, don't execute")
    ap.add_argument("--sql", action="store_true", help="print the query's DuckDB oracle SQL")
    ap.add_argument("--list", action="store_true", help="list all graded queries")
    args = ap.parse_args()

    from pulsar_message_filter_spark import registry

    graded = registry.all_graded()

    if args.list:
        width = max(len(n) for n in graded)
        for name, g in sorted(graded.items()):
            kind = "oracle" if g.oracle else "rows-only"
            print(f"{name:<{width}}  [{g.section or '-'}] ({kind}) {g.description}")
        return 0

    if not args.name:
        ap.error("query name required (or --list)")
    if args.name not in graded:
        import difflib

        hint = difflib.get_close_matches(args.name, graded, n=3)
        ap.error(f"unknown query {args.name!r}" + (f"; close: {', '.join(hint)}" if hint else ""))

    g = graded[args.name]
    if args.sql:
        print(g.oracle if g.oracle else f"-- {args.name} is rows-only (no oracle SQL)")
        return 0

    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-run-query")
    df = g.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.rows, truncate=40)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
