"""Degeneracy audit: flag graded queries that return ZERO rows at the
gate scale factor.

Why: the driver's correctness compare hashes sorted values — an EMPTY
result on both engines hash-matches trivially, so a query whose filter
accidentally excludes everything still grades green.  (Found the hard
way in round 7: basket_rules' first confidence floor emptied the result
on the fixture and the parity gate stayed green.)  Run after adding
operators or regenerating testdata::

    python tools/zero_row_audit.py            # sf0.01 (the gate SF)
    python tools/zero_row_audit.py /root/testdata/sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pmf-zero-row-audit")
    flagged = []
    for name, g in registry.all_graded().items():
        try:
            n = g.fn(spark, sf).count()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            flagged.append((name, f"ERROR {type(e).__name__}"))
            print(f"FLAG {name}: {type(e).__name__}: {e}", flush=True)
            continue
        if n == 0:
            flagged.append((name, "0 rows"))
            print(f"FLAG {name}: 0 rows", flush=True)
    print(f"{len(flagged)} flagged of {len(registry.all_graded())}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
