"""The batch curation job CLI must run end-to-end and pass its own DQ gate."""

from __future__ import annotations

import pytest

# end-to-end curation job (~0.5 min): slow tier — excluded from the default (driver-verify) run
pytestmark = pytest.mark.slow

import json
import os
import subprocess
import sys


def test_curation_job_runs_and_gates(tmp_path):
    out_dir = str(tmp_path / "out")
    res = subprocess.run(
        [
            sys.executable,
            "tools/curation_job.py",
            "--sf",
            "/root/testdata/sf0.001",
            "--out",
            out_dir,
            "--shards",
            "8",
        ],
        cwd="/root/repo",
        env=dict(os.environ, SPARK_GRAFT_CPUS="8"),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    c = report["counts"]
    # monotone pipeline: each stage can only drop rows
    assert c["input"] >= c["after_quality"] >= c["after_exact_dedup"] >= c["after_near_dedup"]
    assert c["written"] == c["after_near_dedup"] > 0
    assert not any(report["dq_violations"].values())
    # layout: split=… / shard=… directories exist
    splits = {d.split("=")[1] for d in os.listdir(out_dir) if d.startswith("split=")}
    assert "train" in splits
