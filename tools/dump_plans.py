"""Dump ``explain('formatted')`` for bench headliners to plans/<tag>/.

Usage::

    python tools/dump_plans.py before            # plans/$PMF_PLAN_ROUND/<q>_before.txt
    python tools/dump_plans.py after q1 q2 ...   # subset

Plans are captured at the bench scale factor (default sf0.1) so scan
statistics and AQE thresholds match what the bench executes.  Planning
only — nothing runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PMF_PLAN_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-plan-dump")
    graded = registry.all_graded()
    names = [n for n in bench.HEADLINE if n in graded]
    if only:
        # honor explicitly requested non-headliner graded names too
        names = [n for n in names if n in only] + sorted(
            (only - set(names)) & set(graded)
        )
    for name in names:
        df = graded[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
