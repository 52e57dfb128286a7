"""Job/stage-level wall-clock profile of a graded query (guide §1).

Runs the named queries through the noop sink in a fresh session with the
Spark event log enabled, then parses the log into a per-job breakdown:
job description, wall seconds, stage task counts and task-time totals.
This answers "where does the 2 s go?" — scheduling overhead vs shuffle
vs compute — which `time.time()` around the action cannot.

Usage::

    python tools/profile_query.py eval_auc_rank agg_kth_smallest
    python tools/profile_query.py --runs 2 f21_topk_int8
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> list[dict]:
    """Per-job summary rows from the (single) event log file in log_dir."""
    files = []
    for root, _dirs, names in os.walk(log_dir):
        for f in names:
            if f.startswith("events_") or f.startswith("local-"):
                files.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    jobs[jid] = {
                        "job": jid,
                        "desc": ev.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "t0": ev["Submission Time"],
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                    }
                elif kind == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                        "wall_ms": si.get("Completion Time", 0)
                        - si.get("Submission Time", 0),
                    }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        j_stages = [
            dict(stages[s], stage=s) for s in j["stages"] if s in stages
        ]
        out.append(
            {
                "job": jid,
                "desc": j["desc"],
                "wall_ms": j.get("t1", j["t0"]) - j["t0"],
                "stages": j_stages,
            }
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--stages", action="store_true", help="print per-stage rows")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="pmf-evlog-")
    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark(
        "pmf-profile",
        extra_confs={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{log_dir}",
        },
    )
    graded = registry.all_graded()
    sc = spark.sparkContext

    for name in args.names:
        g = graded[name]
        # warm run (plan/JIT), untimed and unlabeled
        sc.setJobDescription(f"warm:{name}")
        df = g.fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        for r in range(args.runs):
            sc.setJobDescription(f"{name}#r{r}")
            t0 = time.time()
            df = g.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            print(f"== {name} run{r}: {time.time() - t0:.3f}s wall")
        sc.setJobDescription(None)

    spark.stop()
    time.sleep(1.0)
    per_job = parse_event_log(log_dir)
    for j in per_job:
        desc = j["desc"]
        if not desc or desc.startswith("warm:"):
            continue
        n_tasks = sum(s["tasks"] for s in j["stages"])
        print(
            f"[{desc}] job {j['job']}: {j['wall_ms']} ms, "
            f"{len(j['stages'])} stages, {n_tasks} tasks"
        )
        if args.stages:
            for s in sorted(j["stages"], key=lambda s: -s["wall_ms"]):
                print(
                    f"    stage {s['stage']}: {s['wall_ms']} ms, "
                    f"{s['tasks']} tasks  {s['name']}"
                )
    shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
