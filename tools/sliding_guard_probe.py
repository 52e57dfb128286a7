"""Leg C of the round-16 ladder: demonstrate the sliding_distinct auto
guard FIRING in the regime where exact sliding distinct was measured
super-linear (SCALING.md round-15 x256 diagnosis).

For each density-preserving factor this records:

* the ``sliding_key_space`` pre-flight estimate for the 4h/1h spec,
* which method ``sliding_distinct(method='auto')`` picks at the default
  50M-pair budget (read from the analyzed plan — no semantics guessed),
* min-of-2 warm timings for the exact form (e2c), the auto form (e2d),
  and the per-window HLL replacement (e2e).

Usage::

    python tools/sliding_guard_probe.py          # factors 64, 256
    python tools/sliding_guard_probe.py 16 64    # custom
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [64, 256]

    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import (
        sliding_distinct,
        sliding_distinct_budget,
        sliding_key_space,
    )
    from pulsar_message_filter_spark.session import get_spark
    from tools.scale_smoke import replicate

    spark = get_spark("pmf-sliding-guard")
    graded = registry.all_graded()
    root = tempfile.mkdtemp(prefix="pmf_guard_")
    # session-derived (partitions × per-partition allowance); 50M on the
    # reference 32-partition session
    out = {"budget": sliding_distinct_budget(spark), "factors": {}}
    try:
        for n in factors:
            d = os.path.join(root, f"x{n}")
            replicate(spark, n, d, density_preserving=True)
            ev = load(spark, "events", d)
            t0 = time.time()
            est = sliding_key_space(ev, "ts", "user_id", "4 hours", "1 hour")
            preflight_sec = round(time.time() - t0, 3)
            auto_df = sliding_distinct(
                ev, "ts", "user_id", "4 hours", "1 hour", method="auto"
            )
            plan = auto_df._jdf.queryExecution().analyzed().toString().lower()
            picked = "approx" if "approx_count_distinct" in plan else "exact"

            def timed(fn):
                fn().write.format("noop").mode("overwrite").save()  # warm
                ts = []
                for _ in range(2):
                    t0 = time.time()
                    fn().write.format("noop").mode("overwrite").save()
                    ts.append(time.time() - t0)
                return round(min(ts), 3)

            row = {
                "key_space_estimate": est,
                "preflight_sec": preflight_sec,
                "auto_picked": picked,
                "e2d_auto_sec": timed(
                    lambda: graded["e2d_sliding_reach_auto"].fn(spark, d)
                ),
                "e2c_exact_sec": timed(
                    lambda: graded["e2c_sliding_revenue"].fn(spark, d)
                ),
                "e2e_hll_sec": timed(
                    lambda: graded["e2e_sliding_reach_hll"].fn(spark, d)
                ),
            }
            out["factors"][f"x{n}"] = row
            print(f"-- x{n}: {row}", file=sys.stderr)
            shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
