"""Record physical-plan fingerprints for every graded query (TODO.md:
plan-regression harness).

Usage::

    python tools/plan_snapshot.py            # regenerate PLAN_SNAPSHOTS.json
    python tools/plan_snapshot.py --check    # diff current plans vs snapshot

``tests/test_plan_snapshots.py`` runs the --check logic in CI form; when a
plan change is *intentional* (new operator, better strategy), regenerate
and commit the JSON — the diff then documents the plan change in review.

Fingerprints are structural only (operator-kind multiset + pushed-filter
shapes, see ``plans.inspect.plan_fingerprint``): stable across sessions,
sensitive to exactly the regressions that matter at 100 TB — a join
strategy flipping off broadcast, a new Exchange, a filter no longer
reaching the scan, Python eval leaking into a hot path.

CAVEAT (ADVICE r14): paths that call ``io.widen`` decide at plan-build
time from the scan's partition count vs the host's parallelism, so their
snapshots are PARALLELISM-DEPENDENT — regenerate and compare on the same
core count (the committed JSON was captured at local[32]).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_SNAPSHOTS.json"
)
SF_DIR = "/root/testdata/sf0.001"  # plans only — never executed; sf sets stats


def current_fingerprints(spark) -> dict[str, dict]:
    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.plans import plan_fingerprint

    out: dict[str, dict] = {}
    for name, g in sorted(registry.all_graded().items()):
        out[name] = plan_fingerprint(g.fn(spark, SF_DIR))
    return out


def diff(old: dict[str, dict], new: dict[str, dict]) -> list[str]:
    msgs: list[str] = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            msgs.append(f"{name}: NEW (not in snapshot — regenerate)")
            continue
        if name not in new:
            msgs.append(f"{name}: REMOVED from registry")
            continue
        o, n = old[name], new[name]
        if o == n:
            continue
        for op in sorted(set(o["ops"]) | set(n["ops"])):
            a, b = o["ops"].get(op, 0), n["ops"].get(op, 0)
            if a != b:
                msgs.append(f"{name}: {op} {a} -> {b}")
        if o["pushed"] != n["pushed"]:
            lost = set(o["pushed"]) - set(n["pushed"])
            gained = set(n["pushed"]) - set(o["pushed"])
            if lost:
                msgs.append(f"{name}: pushdown LOST {sorted(lost)}")
            if gained:
                msgs.append(f"{name}: pushdown gained {sorted(gained)}")
    return msgs


def main() -> None:
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-plan-snapshot")
    new = current_fingerprints(spark)
    if "--check" in sys.argv:
        if not os.path.exists(SNAPSHOT_PATH):
            print("no snapshot recorded — run: python tools/plan_snapshot.py")
            sys.exit(1)
        with open(SNAPSHOT_PATH) as f:
            old = json.load(f)
        msgs = diff(old, new)
        for m in msgs:
            print(m)
        print(f"{len(msgs)} plan drift(s) across {len(new)} queries")
        sys.exit(1 if msgs else 0)
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(new, f, indent=1, sort_keys=True)
    print(f"wrote {SNAPSHOT_PATH}: {len(new)} query plans")


if __name__ == "__main__":
    main()
