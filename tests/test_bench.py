"""bench.py is a driver artifact — it must emit exactly one valid JSON line
with the contracted fields (guards BENCH_r{N}.json against harness rot)."""

from __future__ import annotations

import pytest

# runs the full 75-headliner bench (~4 min): slow tier — excluded from the default (driver-verify) run
pytestmark = pytest.mark.slow

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"])  # non-empty
    assert payload["value"] == round(sum(payload["queries"].values()), 3)
