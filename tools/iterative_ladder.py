"""Ladder legs for the iterative-join family (VERDICT r06 #7).

``connected_components`` (behind ``linkage_entity_clusters`` /
``f20_dedup_clusters``) and ``khop_counts`` (behind
``graph_khop_reachability``) are the repo's only O(iterations)-shaped
plans — their scale risk is not a single shuffle but ROUNDS × per-round
cost.  The replication fixture in scale_smoke.py can't probe this (clone
replication densifies pair graphs quadratically by construction), so this
tool builds controlled chain graphs where the two axes move independently:

* **volume leg** — component diameter FIXED (chains of 8), edge count
  grows ×factor: iteration count must stay constant and runtime ~linear.
* **diameter leg** — edge count ~fixed, component diameter grows ×factor:
  with pointer-jump shortcutting, iterations must grow ~log(diameter),
  not ~diameter (the plain-propagation column is measured alongside as
  the named scale-killer).
* **khop volume leg** — fixed 4 hops over a growing edge set: rounds are
  structurally constant; runtime ~linear.

Each leg verifies correctness (labels == component minimum, component
count exact) before recording its timing row.  Output: one JSON line +
a SCALING.md-ready table.

Usage::

    python tools/iterative_ladder.py             # factors 1,4,16,64
    python tools/iterative_ladder.py 1 8         # custom factors
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_COMPONENTS = 2_000
BASE_CHAIN = 8  # volume-leg component diameter (fixed)
DIAMETER_EDGES = 16_000  # diameter-leg total edge budget (~fixed)


def chain_pairs(spark, n_components: int, chain_len: int):
    """``n_components`` disjoint paths of ``chain_len`` edges each:
    node ids are ``comp * stride + offset`` so every component's min label
    is ``comp * stride`` — the exact ground truth for the checks."""
    from pyspark.sql import functions as F

    stride = chain_len + 10
    return (
        spark.range(n_components * chain_len)
        .select(
            (
                (F.col("id") / chain_len).cast("long") * stride
                + F.col("id") % chain_len
            ).alias("id_a")
        )
        .withColumn("id_b", F.col("id_a") + 1)
    )


def run_cc(spark, n_components: int, chain_len: int, shortcut: bool) -> dict:
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.dedup import connected_components

    pairs = chain_pairs(spark, n_components, chain_len).localCheckpoint(eager=True)
    stats: dict = {}
    t0 = time.time()
    labels = connected_components(
        pairs, max_iterations=4 * chain_len + 8, shortcut=shortcut, stats=stats
    )
    check = labels.agg(
        F.count_distinct("cluster_id").alias("n_comp"),
        F.sum(
            (F.col("cluster_id") != (F.col("node") - F.col("node") % (chain_len + 10)))
            .cast("long")
        ).alias("n_wrong"),
    ).collect()[0]
    sec = time.time() - t0
    assert check["n_comp"] == n_components, (check["n_comp"], n_components)
    assert check["n_wrong"] == 0, check["n_wrong"]
    return {"sec": round(sec, 2), "iterations": stats["iterations"]}


def run_khop(spark, n_components: int, chain_len: int, hops: int = 4) -> dict:
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.graph import khop_counts

    pairs = chain_pairs(spark, n_components, chain_len)
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).localCheckpoint(eager=True)
    # seeds: every chain head — each hop h reaches exactly one new node per
    # seed (paths), so sum(n_nodes) per hop == n_components for h<=chain_len
    seeds = (
        spark.range(n_components)
        .select((F.col("id") * (chain_len + 10)).alias("seed"))
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    rows = (
        khop_counts(edges, seeds, max_hops=hops)
        .groupBy("hop")
        .agg(F.sum("n_nodes").alias("total"))
        .collect()
    )
    sec = time.time() - t0
    by_hop = {r["hop"]: r["total"] for r in rows}
    want = {h: n_components for h in range(1, min(hops, chain_len) + 1)}
    assert all(by_hop.get(h) == n for h, n in want.items()), by_hop
    return {"sec": round(sec, 2), "iterations": hops}


def exponent(t1: float, tn: float, n: int) -> float | None:
    if n <= 1:  # single-factor run: no span to fit an exponent over
        return None
    return round(math.log(max(tn, 1e-9) / max(t1, 1e-9)) / math.log(n), 2)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]

    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-iterative-ladder")
    report: dict = {"factors": factors, "legs": {}}

    legs = {
        # name -> factory(factor) -> result dict
        "cc_volume": lambda f: run_cc(spark, BASE_COMPONENTS * f, BASE_CHAIN, True),
        "cc_diameter_shortcut": lambda f: run_cc(
            spark, max(DIAMETER_EDGES // (BASE_CHAIN * f), 8), BASE_CHAIN * f, True
        ),
        "cc_diameter_plain": lambda f: run_cc(
            spark, max(DIAMETER_EDGES // (BASE_CHAIN * f), 8), BASE_CHAIN * f, False
        ),
        "khop_volume": lambda f: run_khop(spark, BASE_COMPONENTS * f, BASE_CHAIN),
    }
    for name, fn in legs.items():
        rows = {}
        # the plain-propagation leg exists to MEASURE the named scale-killer
        # (O(diameter) rounds); past x16 (~130 rounds) the trend is
        # unambiguous and the remaining legs would just burn minutes — cap
        # it and log the cap (no silent truncation).
        leg_factors = [f for f in factors if not (name == "cc_diameter_plain" and f > 16)]
        if leg_factors != factors:
            print(f"  {name}: capped at x16 (O(diameter) rounds)", file=sys.stderr)
        for f in leg_factors:
            rows[f"x{f}"] = fn(f)
            print(f"  {name} x{f}: {rows[f'x{f}']}", file=sys.stderr)
        t1 = rows[f"x{leg_factors[0]}"]["sec"]
        tn = rows[f"x{leg_factors[-1]}"]["sec"]
        rows["time_exponent"] = exponent(t1, tn, leg_factors[-1] // leg_factors[0])
        report["legs"][name] = rows

    print(json.dumps({"metric": "iterative_ladder", **report}))


if __name__ == "__main__":
    main()
