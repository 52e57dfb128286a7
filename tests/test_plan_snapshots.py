"""Plan-regression harness (TODO.md round-2 item): every graded query's
physical-plan fingerprint must match the recorded snapshot.

A failure here means the *shape* of a plan changed — a join strategy flip,
a new shuffle, a lost pushdown, Python eval appearing in a hot path.  If
the change is intentional, regenerate and commit the snapshot:

    python tools/plan_snapshot.py
"""

from __future__ import annotations

import pytest

# plans all 397 queries (~2 min): slow tier — excluded from the default (driver-verify) run
pytestmark = pytest.mark.slow

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_plans_match_recorded_snapshots(spark):
    import plan_snapshot

    assert os.path.exists(plan_snapshot.SNAPSHOT_PATH), (
        "no plan snapshot recorded — run: python tools/plan_snapshot.py"
    )
    with open(plan_snapshot.SNAPSHOT_PATH) as f:
        old = json.load(f)
    new = plan_snapshot.current_fingerprints(spark)
    msgs = plan_snapshot.diff(old, new)
    assert not msgs, "plan drift (regenerate via tools/plan_snapshot.py if intentional):\n" + "\n".join(msgs)
