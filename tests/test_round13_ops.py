"""Round-13 ops: ADVICE-r09 hardening pins + this round's widening queries.

Covers the fork-safety guard in tmpdirs (an exiting fork()ed child must
not rmtree the parent's live run root) and the empty-subscription parity
guard on selector_fanout_nway's oracle.
"""

from __future__ import annotations

import os

import pytest


def test_run_root_survives_forked_child_exit():
    """A fork()ed child inherits _RUN_ROOT and the atexit hook; its exit
    must NOT delete the parent's still-live run root (ADVICE r09)."""
    from pulsar_message_filter_spark import tmpdirs

    path = tmpdirs.run_scoped_dir("fork_guard_probe")
    os.makedirs(path, exist_ok=True)
    assert tmpdirs._OWNER_PID == os.getpid()

    pid = os.fork()
    if pid == 0:  # child: run the cleanup hook directly, then hard-exit
        try:
            tmpdirs._cleanup()
        finally:
            os._exit(0)
    _, status = os.waitpid(pid, 0)
    assert os.waitstatus_to_exitcode(status) == 0
    assert os.path.isdir(path), "child exit wiped the parent's run root"


def test_fanout_oracle_emits_no_row_for_empty_subscription():
    """Each oracle branch carries GROUP BY/HAVING so a zero-match
    subscription yields NO row — matching Spark's filter(matched) side
    (ADVICE r09: ungrouped branches emit (0, NULL) on empty input)."""
    import duckdb

    from pulsar_message_filter_spark.registry import all_graded

    oracle = all_graded()["selector_fanout_nway"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE, "
                "user_id BIGINT, props VARCHAR)")
    # Empty table: every subscription matches nothing → zero rows total.
    out = con.execute(oracle).fetchall()
    assert out == []
