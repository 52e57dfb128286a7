"""Round-8 breadth queries (operators/breadth.py): semantics pins the
oracle hash can't express — gap-boundary conventions, plan shapes, flag
identities — plus the TWS-twin binding contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE

from pulsar_message_filter_spark.operators.breadth import (
    a_partition_pruned_read,
    cross_lang_source_grid,
    dlq_reject_reasons,
    f78_token_budget_curve,
    grouping_id_measures,
    pivot_two_measures,
    session_ttl_batch_twin,
    stream_dedup_keep_last,
)
from pulsar_message_filter_spark.io import load


def test_session_ttl_batch_gap_boundary(spark):
    """Spark MERGES touching session windows: an event at EXACTLY
    last + gap joins the session; only strictly-beyond-gap starts a new
    one.  The DuckDB oracles use the matching strict-> convention
    (probed here so a convention drift fails loudly, not silently at some
    future fixture)."""
    from pulsar_message_filter_spark.streaming.pipeline import session_ttl_batch

    gap_ms = 60_000
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:01:00"),  # exactly gap after → SAME session
            (1, "2024-01-01 10:02:00.001"),  # 1ms beyond gap → new session
            (2, "2024-01-01 10:00:00"),
            (2, "2024-01-01 10:00:59.999"),  # inside gap → same session
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    rows = session_ttl_batch(df, gap_ms=gap_ms).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert sorted(s.n_events for s in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1
    assert by_user[2][0].n_events == 2
    # emit schema matches the TWS op: last-event end, not last + gap
    sess = by_user[2][0]
    assert sess.session_end_ms - sess.session_start_ms == 59_999


def test_session_twin_matches_tws_default_gap():
    """The graded query and session_ttl_tws share the same default gap, so
    the driver's hash evidence covers the streaming op's parameters."""
    import inspect

    from pulsar_message_filter_spark.operators import breadth
    from pulsar_message_filter_spark.streaming.pipeline import session_ttl_tws

    sig = inspect.signature(session_ttl_tws)
    assert breadth._TTL_GAP_MS == sig.parameters["gap_ms"].default


def test_partition_pruned_read_plan(spark):
    """The lang filter must reach the scan as a PARTITION filter (directory
    pruning), not a post-scan row filter."""
    plan = a_partition_pruned_read(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruning predicate mentions the partition column, inside the
    # PartitionFilters clause rather than an empty one
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "lang" in pf


def test_keep_last_is_latest_per_key(spark):
    out = stream_dedup_keep_last(spark, SF_SMOKE)
    ev = load(spark, "events", SF_SMOKE)
    # one row per observed key
    assert out.count() == ev.select("user_id", "event_type").distinct().count()
    # spot-check: the emitted ts is the max per key
    mx = ev.groupBy("user_id", "event_type").agg(
        F.max(F.unix_micros("ts")).alias("mx")
    )
    joined = out.join(mx, ["user_id", "event_type"])
    assert joined.filter(F.col("last_ts_us") != F.col("mx")).count() == 0


def test_dlq_reasons_partition_events(spark):
    rows = dlq_reject_reasons(spark, SF_SMOKE).collect()
    reasons = {r.reason: r.n for r in rows}
    assert set(reasons) <= {"accepted", "rejected_unknown_3vl", "rejected_no_match"}
    assert sum(reasons.values()) == load(spark, "events", SF_SMOKE).count()
    # the fixture exercises all three legs (3VL UNKNOWN included)
    assert len(reasons) == 3
    verdicts = {(r.verdict, r.reason) for r in rows}
    assert ("ACCEPT", "accepted") in verdicts
    assert all(v == "REJECT" for v, rr in verdicts if rr != "accepted")


def test_grid_is_dense_and_zero_filled(spark):
    out = cross_lang_source_grid(spark, SF_SMOKE)
    docs = load(spark, "documents", SF_SMOKE)
    n_lang = docs.select("lang").distinct().count()
    n_src = docs.select("source").distinct().count()
    assert out.count() == n_lang * n_src
    assert out.filter(F.col("n_docs").isNull()).count() == 0


def test_grouping_id_is_flag_composition(spark):
    rows = grouping_id_measures(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.gid == 2 * r.g_lang + r.g_source
    # all four grouping sets present
    assert {(r.g_lang, r.g_source) for r in rows} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_pivot_zero_cells_are_zero_not_null(spark):
    out = pivot_two_measures(spark, SF_SMOKE)
    for v in ("de", "en", "es", "fr", "zh"):
        assert out.filter(F.col(f"{v}_n").isNull()).count() == 0


def test_token_budget_curve_monotone(spark):
    rows = sorted(
        f78_token_budget_curve(spark, SF_SMOKE).collect(), key=lambda r: r.cutoff
    )
    totals = {r.tokens_total for r in rows}
    assert len(totals) == 1  # same corpus total on every cutoff row
    kept = [r.tokens_kept for r in rows]
    docs = [r.n_docs_within for r in rows]
    assert kept == sorted(kept) and docs == sorted(docs)
    assert kept[-1] <= totals.pop()


def test_session_twin_graded_runs(spark):
    out = session_ttl_batch_twin(spark, SF_SMOKE)
    assert out.columns == [
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
    ]
    assert out.count() > 0
