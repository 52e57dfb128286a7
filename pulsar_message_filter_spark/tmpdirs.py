"""Run-scoped temporary directories for store- and fixture-building queries.

Several graded queries materialise an on-disk artefact (a signature store,
a partitioned fixture, a CSV round-trip dir) before answering.  Two naming
schemes were tried and both have a failure mode:

* ``mkdtemp()`` per invocation — leaks one /tmp dir per gate/bench run
  (VERDICT r07 hygiene note), and the store-reuse semantics some queries
  want ("repeated runs overwrite in place") are lost.
* a fixed, fully deterministic ``/tmp/pmf_<tag>`` path — two CONCURRENT
  processes on the same sf (gate + bench, pytest-xdist) race: one wipes or
  rewrites the store mid-run of the other, and a predictable name in a
  world-writable /tmp is a pre-creation/symlink hazard on shared hosts
  (ADVICE r08, medium).

The fix is a **per-process run root**: one directory per interpreter,
named with the pid plus a random token minted at import time.  Within a
process every call with the same tag returns the same path — gate runs
still overwrite in place instead of leaking — while concurrent processes
can never collide, and the random token defeats pre-creation.  The whole
root is removed at interpreter exit (best-effort), so nothing accumulates
across runs either.

Scale note: these paths are driver-local bookkeeping only; the data under
them is written/read by Spark executors through the normal committers.  On
a real cluster the stores would live on shared storage (the functions all
take the path as an argument) — this module only picks the LOCAL default.
"""

from __future__ import annotations

import atexit
import os
import secrets
import shutil
import tempfile

# Minted once per interpreter: stable within a run, unique across runs.
_RUN_ROOT = os.path.join(
    tempfile.gettempdir(), f"pmf_run_{os.getpid()}_{secrets.token_hex(4)}"
)
# A fork()ed child inherits both _RUN_ROOT and the atexit handler; without
# a pid check an exiting child would rmtree the PARENT's still-live root —
# the exact mid-run wipe this module exists to prevent (ADVICE r09).
_OWNER_PID = os.getpid()


def _cleanup() -> None:  # pragma: no cover - exit hook
    if os.getpid() == _OWNER_PID:
        shutil.rmtree(_RUN_ROOT, ignore_errors=True)


atexit.register(_cleanup)


def run_scoped_dir(tag: str) -> str:
    """Deterministic-within-this-process path for ``tag``.

    The parent run root is created on first use; the returned leaf is NOT
    created (Spark writers want to create it themselves with
    ``mode("overwrite")``).
    """
    os.makedirs(_RUN_ROOT, exist_ok=True)
    return os.path.join(_RUN_ROOT, tag)
