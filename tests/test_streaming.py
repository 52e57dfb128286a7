"""Streaming-machinery tests (SURVEY.md §5.3.3): E4/E5/E8/E9/E10 semantics
on deterministic file-stream input — the parts the batch oracle can't grade.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest

# streaming/TWS soak paths (~8 min): slow tier — excluded from the default (driver-verify) run
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from pulsar_message_filter_spark.filtering import ACCEPT, REJECT, RESCHEDULE
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.selector import Selector
from pulsar_message_filter_spark.sources import file_message_stream
from pulsar_message_filter_spark.streaming import (
    filtered_sink_pipeline,
    stateful_user_stats,
    windowed_event_counts,
)
from pulsar_message_filter_spark.streaming.pipeline import redelivery_counter_tws
from tests.conftest import SF_SMOKE


def _write_events(spark, rows, path: str) -> None:
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id bigint, event_type string, value double, props string"
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_available(query_builder, name: str):
    q = query_builder.queryName(name).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return q


def test_stream_filter_matches_batch(spark, tmp_path):
    """Unified model: the same selector over readStream == batch filter."""
    input_dir = str(tmp_path / "in")
    # feed the real sf0.001 events through a file stream in 3 chunks
    events = load(spark, "events", SF_SMOKE)
    events.limit(1000).repartition(3).write.parquet(input_dir)

    sel = Selector("props.k > 50 AND event_type IN ('purchase', 'error')")
    stream = file_message_stream(spark, input_dir)
    q = _run_available(
        sel.apply(stream).writeStream.format("memory").outputMode("append"),
        "stream_filter_t",
    )
    got = spark.table("stream_filter_t").count()
    expected = sel.apply(events).count()
    assert got == expected and expected > 0
    q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """E5: a row older than (max event time - watermark) is dropped from the
    windowed aggregation after the watermark has advanced."""
    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()

    stream = file_message_stream(spark, input_dir)
    counts = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    # one continuous query; files dropped between processAllAvailable calls
    # become separate micro-batches, advancing the watermark in between
    q = counts.writeStream.format("memory").outputMode("append").queryName(
        "late_t"
    ).start()
    try:
        # batch 1: events at 10:00 then 14:00 → watermark advances to 13:30
        _write_events(
            spark,
            [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
             (2, "2024-01-01 14:00:00", 1, "click", 1.0, "{}")],
            input_dir,
        )
        q.processAllAvailable()
        # batch 2: a late row at 10:30 (< 13:30 watermark) and an on-time row
        _write_events(
            spark,
            [(3, "2024-01-01 10:30:00", 1, "click", 99.0, "{}"),
             (4, "2024-01-01 15:00:00", 1, "click", 1.0, "{}")],
            input_dir,
        )
        q.processAllAvailable()
        # final batch to flush closed windows into the append sink
        _write_events(
            spark, [(5, "2024-01-01 18:00:00", 1, "click", 1.0, "{}")], input_dir
        )
        q.processAllAvailable()
        rows = {
            r.window_start.strftime("%H:%M"): r.n
            for r in spark.table("late_t").collect()
        }
    finally:
        q.stop()
    # the 10:00 window must hold exactly 1 event — the late 10:30 row dropped
    assert rows.get("10:00") == 1, rows


def test_rocksdb_state_store_windowed_agg(spark, tmp_path):
    """E8/scale posture: the same stateful windowed aggregation runs on the
    RocksDB state-store provider — the store that keeps executor state
    off-heap and disk-backed at 100 TB (HDFS-backed in-memory state OOMs
    once keyspace outgrows executors).  Asserts (a) results identical to
    the batch computation, (b) state survives across micro-batches, and
    (c) RocksDB is actually the provider (its metrics appear in progress).
    """
    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_message_stream(spark, input_dir)
        counts = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        q = (
            counts.writeStream.format("memory")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .queryName("rocksdb_t")
            .start()
        )
        try:
            _write_events(
                spark,
                [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
                 (2, "2024-01-01 10:30:00", 1, "click", 1.0, "{}")],
                input_dir,
            )
            q.processAllAvailable()
            # second micro-batch adds to the SAME window → state carried
            _write_events(
                spark, [(3, "2024-01-01 10:45:00", 1, "click", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            rows = {
                r.window_start.strftime("%H:%M"): r.n
                for r in spark.table("rocksdb_t").collect()
            }
            metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rows.get("10:00") == 3, rows  # all three events, one window, 2 batches
    assert any(k.startswith("rocksdb") for k in metrics), sorted(metrics)[:5]


def test_exactly_once_resume_from_checkpoint(spark, tmp_path):
    """E10: kill + restart from the checkpoint neither loses nor duplicates."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    Path(input_dir).mkdir()

    _write_events(
        spark,
        [(i, f"2024-01-01 10:{i:02d}:00", i % 3, "click", float(i), '{"k": 9}')
         for i in range(10)],
        input_dir,
    )
    stream = file_message_stream(spark, input_dir)
    sink = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .outputMode("append")
    )
    q = _run_available(sink, "eo_t")
    q.stop()
    first = spark.read.parquet(out_dir).count()
    assert first == 10

    # "crash" happened; add more input and resume with the SAME checkpoint
    _write_events(
        spark,
        [(100 + i, f"2024-01-01 11:{i:02d}:00", 1, "view", 1.0, "{}")
         for i in range(5)],
        input_dir,
    )
    q = _run_available(sink, "eo_t2")
    q.stop()
    df = spark.read.parquet(out_dir)
    assert df.count() == 15  # no re-emission of the first 10
    assert df.select("event_id").distinct().count() == 15


def test_verdict_sink_pipeline(spark, tmp_path):
    """B13/A5/A6: one foreachBatch pass routes ACCEPT/REJECT/RESCHEDULE to a
    verdict-partitioned sink; RESCHEDULE rows carry not_before."""
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    Path(input_dir).mkdir()
    _write_events(
        spark,
        [(1, "2024-01-01 10:00:00", 1, "purchase", 10.0, '{"k": 90}'),   # ACCEPT
         (2, "2024-01-01 10:01:00", 1, "view", 10.0, '{"k": 90}'),       # REJECT
         (3, "2024-01-01 10:02:00", 1, "view", 500.0, '{"k": 1}')],      # RESCHEDULE
        input_dir,
    )
    stream = file_message_stream(spark, input_dir)
    sink = filtered_sink_pipeline(
        stream,
        accept="props.k > 50 AND event_type = 'purchase'",
        reschedule="value >= 150",
        out_dir=out_dir,
        checkpoint_dir=chk,
    )
    q = _run_available(sink, "verdict_t")
    q.stop()
    out = spark.read.parquet(out_dir)
    got = {r.verdict: r.event_id for r in out.select("verdict", "event_id").collect()}
    assert got == {ACCEPT: 1, REJECT: 2, RESCHEDULE: 3}
    nb = out.filter(F.col("verdict") == RESCHEDULE).select("not_before").collect()
    assert nb[0].not_before is not None
    ok_null = out.filter(F.col("verdict") == ACCEPT).select("not_before").collect()
    assert ok_null[0].not_before is None


def test_stateful_user_stats_carries_state(spark, tmp_path):
    """E8: applyInPandasWithState accumulates per-key state across batches."""
    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    stream = file_message_stream(spark, input_dir)
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .outputMode("update")
        .queryName("state_t")
        .start()
    )
    try:
        _write_events(
            spark,
            [(1, "2024-01-01 10:00:00", 7, "click", 10.0, "{}"),
             (2, "2024-01-01 10:01:00", 7, "click", 20.0, "{}")],
            input_dir,
        )
        q.processAllAvailable()
        _write_events(
            spark, [(3, "2024-01-01 10:05:00", 7, "click", 5.0, "{}")], input_dir
        )
        q.processAllAvailable()
        rows = spark.table("state_t").collect()
    finally:
        q.stop()
    # last update for user 7 must reflect all 3 events (state carried)
    final = max((r for r in rows if r.user_id == 7), key=lambda r: r.n_events)
    assert final.n_events == 3 and abs(final.total_value - 35.0) < 1e-9


def test_transform_with_state_counter(spark, tmp_path):
    """E8 (Spark 4 API): transformWithStateInPandas value state carries the
    per-user redelivery count across micro-batches (RocksDB provider).

    Skips where the protobuf package (TWS state-server protocol) is absent
    — this container intentionally ships no extra packages."""
    pytest.importorskip("google.protobuf.descriptor")
    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_message_stream(spark, input_dir)
        q = (
            redelivery_counter_tws(stream)
            .writeStream.format("memory")
            .outputMode("update")
            .queryName("tws_t")
            .start()
        )
        try:
            _write_events(
                spark,
                [(1, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
                 (2, "2024-01-01 10:01:00", 3, "view", 1.0, "{}"),
                 (3, "2024-01-01 10:02:00", 4, "view", 1.0, "{}")],
                input_dir,
            )
            q.processAllAvailable()
            _write_events(
                spark, [(4, "2024-01-01 10:05:00", 3, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            rows = spark.table("tws_t").collect()
        finally:
            q.stop()
        latest = {}
        for r in rows:
            latest[r.user_id] = max(latest.get(r.user_id, 0), r.n_seen)
        assert latest == {3: 3, 4: 1}
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_gate_error_is_actionable(spark, tmp_path, monkeypatch):
    """Without protobuf, the TWS builder fails fast with guidance (not a
    mid-query worker crash).  Absence is simulated by poisoning the module
    cache (setting a sys.modules entry to None makes its import raise),
    so this runs whether or not a protobuf is importable here."""
    import sys as _sys

    monkeypatch.setitem(_sys.modules, "google.protobuf", None)
    stream = file_message_stream(spark, str(tmp_path))
    with pytest.raises(RuntimeError, match="applyInPandasWithState"):
        redelivery_counter_tws(stream)


def test_tws_timer_session_expiry(spark, tmp_path):
    """E8 timer surface (VERDICT r06 #8): event-time timers fire when the
    watermark passes ``last_event + gap``, the closed session is emitted
    from handleExpiredTimer, and the key's state is EVICTED (a later event
    starts a fresh session).  Batch-equivalence: emitted sessions equal the
    session_window(E3) aggregation over the same events."""
    pytest.importorskip("google.protobuf.descriptor")
    from pulsar_message_filter_spark.streaming.pipeline import session_ttl_tws

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    gap_ms = 10 * 60 * 1000
    try:
        stream = file_message_stream(spark, input_dir)
        q = (
            session_ttl_tws(stream, gap_ms=gap_ms)
            .writeStream.format("memory")
            .outputMode("append")
            .queryName("tws_sessions")
            .start()
        )
        try:
            _write_events(
                spark,
                [(1, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
                 (2, "2024-01-01 10:01:00", 4, "view", 1.0, "{}"),
                 (3, "2024-01-01 10:02:00", 3, "view", 1.0, "{}")],
                input_dir,
            )
            q.processAllAvailable()
            # extend user 3's session, then push the watermark far past both
            # sessions' expiries via a sentinel user
            _write_events(
                spark, [(4, "2024-01-01 10:05:00", 3, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            _write_events(
                spark, [(5, "2024-01-01 11:00:00", 99, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            _write_events(  # one more batch so the advanced watermark is applied
                spark, [(6, "2024-01-01 11:01:00", 99, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            closed = {r.user_id: r for r in spark.table("tws_sessions").collect()}
            # both sessions closed by the timer; sentinel still open
            assert set(closed) == {3, 4}
            assert closed[3].n_events == 3
            assert closed[4].n_events == 1
            # batch-equivalence twin: session_window over the same events
            # twin = the SHARED batch builder the graded driver query
            # (session_ttl_batch_twin) also runs — binds the driver-hash-
            # checked semantics to this TWS path
            from pulsar_message_filter_spark.streaming.pipeline import (
                session_ttl_batch,
            )

            batch = spark.read.parquet(input_dir).filter("user_id IN (3, 4)")
            twin = {
                r.user_id: r
                for r in session_ttl_batch(batch, gap_ms=gap_ms).collect()
            }
            for uid in (3, 4):
                assert closed[uid].n_events == twin[uid].n_events
                assert closed[uid].session_start_ms == twin[uid].session_start_ms
                assert closed[uid].session_end_ms == twin[uid].session_end_ms
            # eviction: a post-expiry event starts a FRESH session
            _write_events(
                spark, [(7, "2024-01-01 11:30:00", 3, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            _write_events(
                spark, [(8, "2024-01-01 13:00:00", 99, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            _write_events(
                spark, [(9, "2024-01-01 13:01:00", 99, "view", 1.0, "{}")], input_dir
            )
            q.processAllAvailable()
            user3 = [
                r for r in spark.table("tws_sessions").collect() if r.user_id == 3
            ]
            assert sorted(r.n_events for r in user3) == [1, 3]
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_processing_time_idle_eviction(spark, tmp_path):
    """E8 timer surface, processing-time mode: an idle key is evicted by
    wall clock with NO further input — the engine keeps scheduling
    micro-batches so expired timers fire, the tombstone carries the final
    count, and a later event restarts the key from scratch.

    processAllAvailable() is NOT usable here: in ProcessingTime mode the
    engine runs timer-only batches continuously, so the test polls the
    memory sink with a deadline instead."""
    pytest.importorskip("google.protobuf.descriptor")
    from pulsar_message_filter_spark.streaming.pipeline import idle_key_eviction_tws

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def wait_for(row, deadline_s=90):
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if row in {tuple(r) for r in spark.table("tws_idle").collect()}:
                return
            time.sleep(0.5)
        raise AssertionError(f"{row} never appeared in the sink")

    try:
        stream = file_message_stream(spark, input_dir)
        q = (
            idle_key_eviction_tws(stream, idle_ms=200)
            .writeStream.format("memory")
            .outputMode("update")
            .trigger(processingTime="200 milliseconds")
            .queryName("tws_idle")
            .start()
        )
        try:
            _write_events(
                spark,
                [(1, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
                 (2, "2024-01-01 10:01:00", 3, "view", 1.0, "{}")],
                input_dir,
            )
            wait_for((3, 2, False))  # running count seen
            wait_for((3, 2, True))  # evicted by wall clock, no new input
            _write_events(
                spark, [(3, "2024-01-01 10:02:00", 3, "view", 1.0, "{}")], input_dir
            )
            wait_for((3, 1, False))  # state was cleared: restarts at 1
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_map_and_list_state(spark, tmp_path):
    """E8 composite state: MapState sub-key counts accumulate across
    micro-batches, ListState keeps a bounded last-N buffer, and both
    carry per-key isolation (user 4 unaffected by user 3's history)."""
    pytest.importorskip("google.protobuf.descriptor")
    from pulsar_message_filter_spark.streaming.pipeline import user_profile_tws

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_message_stream(spark, input_dir)
        q = (
            user_profile_tws(stream, keep_last=3)
            .writeStream.format("memory")
            .outputMode("update")
            .queryName("tws_profile")
            .start()
        )
        try:
            _write_events(
                spark,
                [(1, "2024-01-01 10:00:00", 3, "view", 1.0, "{}"),
                 (2, "2024-01-01 10:01:00", 3, "click", 2.0, "{}"),
                 (3, "2024-01-01 10:02:00", 3, "view", 3.0, "{}")],
                input_dir,
            )
            q.processAllAvailable()
            _write_events(
                spark,
                [(4, "2024-01-01 10:03:00", 3, "click", 4.0, "{}"),
                 (5, "2024-01-01 10:04:00", 3, "click", 5.0, "{}"),
                 (6, "2024-01-01 10:05:00", 4, "purchase", 9.0, "{}")],
                input_dir,
            )
            q.processAllAvailable()
            latest = {}
            for r in spark.table("tws_profile").collect():
                if (
                    r.user_id not in latest
                    or r.n_events > latest[r.user_id].n_events
                ):
                    latest[r.user_id] = r
            u3 = latest[3]
            # MapState across batches: view=2, click=3 → top=click, 5 events
            assert u3.n_types == 2 and u3.n_events == 5
            assert u3.top_type == "click"
            # ListState bounded buffer: last 3 of values [1..5] as cents
            assert u3.recent_csv == "300:400:500"
            u4 = latest[4]
            assert (u4.n_types, u4.n_events, u4.top_type) == (1, 1, "purchase")
            assert u4.recent_csv == "900"
            # binding: the SHARED batch builder the graded driver query
            # (user_profile_batch_twin) runs reproduces the final state
            # rows exactly — MapState/ListState semantics carry oracle
            # evidence through that twin
            from pulsar_message_filter_spark.streaming.pipeline import (
                user_profile_batch,
            )

            twin = {
                r.user_id: r
                for r in user_profile_batch(
                    spark.read.parquet(input_dir), keep_last=3
                ).collect()
            }
            for uid in (3, 4):
                got, want = latest[uid], twin[uid]
                assert (got.n_types, got.top_type, got.n_events) == (
                    want.n_types,
                    want.top_type,
                    want.n_events,
                )
                assert got.recent_csv == want.recent_csv
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_state_ttl_expires_by_wall_clock(spark, tmp_path):
    """E8 state TTL: value state declared with ttlDurationMs is evicted by
    the store itself — a key arriving within the TTL accumulates, one
    arriving after it restarts from zero, with no timer code."""
    pytest.importorskip("google.protobuf.descriptor")
    from pulsar_message_filter_spark.streaming.pipeline import ttl_counter_tws

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def wait_for_count(n, times=1, deadline_s=90):
            t0 = time.time()
            while time.time() - t0 < deadline_s:
                counts = [r.n_seen for r in spark.table("tws_ttl").collect()]
                if counts.count(n) >= times:
                    return
                time.sleep(0.5)
            raise AssertionError(f"count {n} (x{times}) never appeared")

        stream = file_message_stream(spark, input_dir)
        # ProcessingTime mode (required for TTL) runs batches continuously,
        # so processAllAvailable() hangs — poll the sink instead (same
        # pattern as test_tws_processing_time_idle_eviction).
        q = (
            ttl_counter_tws(stream, ttl_ms=30_000)
            .writeStream.format("memory")
            .outputMode("update")
            .trigger(processingTime="200 milliseconds")
            .queryName("tws_ttl")
            .start()
        )
        try:
            _write_events(
                spark, [(1, "2024-01-01 10:00:00", 3, "view", 1.0, "{}")], input_dir
            )
            wait_for_count(1)
            # within TTL: state carries
            _write_events(
                spark, [(2, "2024-01-01 10:01:00", 3, "view", 1.0, "{}")], input_dir
            )
            wait_for_count(2)
            time.sleep(35.0)  # wall clock past the 30 s TTL
            _write_events(
                spark, [(3, "2024-01-01 10:02:00", 3, "view", 1.0, "{}")], input_dir
            )
            # restarted from zero after TTL eviction: a SECOND n_seen=1 row
            wait_for_count(1, times=2)
            counts = [r.n_seen for r in spark.table("tws_ttl").collect()]
            assert 3 not in counts  # expired state never reached 3
        finally:
            q.stop()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_pb_shim_scoped_to_jvm(spark):
    """ADVICE r06: the protobuf shim must reach Spark's Python workers via
    the JVM's inherited env only — the test process's own ``PYTHONPATH``
    is restored once the JVM is up, so subprocesses spawned by tests do
    not silently load the shim's ``sitecustomize``."""
    import os

    assert "_pb_shim" not in os.environ.get("PYTHONPATH", "")


def test_retry_loop_redelivers_then_dead_letters(spark, tmp_path):
    """B13/§7.4.6 full retry loop: a RESCHEDULEd message is re-ingested
    with an incremented redelivery count and dead-letters (REJECT) once
    max_redeliveries is exhausted — the broker's maxRedeliverCount rule."""
    from pulsar_message_filter_spark.streaming.pipeline import (
        reingest_due_retries,
        route_batch,
    )

    out_dir = str(tmp_path / "out")
    accept = "event_type = 'purchase'"
    resched = "value >= 150"  # stays true forever → must eventually DLQ

    batch = spark.createDataFrame(
        [(1, 1, "view", 500.0, "{}")],
        "event_id bigint, user_id bigint, event_type string, value double, props string",
    )
    # cycle 0: initial routing (immediate visibility for the test)
    route_batch(batch, accept, resched, retry_delay="0 SECONDS",
                max_redeliveries=2).write.mode("append").partitionBy("verdict").parquet(out_dir)
    counts = []
    for generation in range(3):
        due = reingest_due_retries(spark, out_dir, generation=generation)
        rows = due.collect()
        if not rows:
            break
        counts.append(rows[0].redelivery_count)
        route_batch(due, accept, resched, retry_delay="0 SECONDS",
                    max_redeliveries=2).write.mode("append").partitionBy("verdict").parquet(out_dir)
        # consumed retries would be acked on a broker; emulate by tracking
        # only the latest generation below

    out = spark.read.parquet(out_dir)
    # generations: rc=0 RESCHEDULE, rc=1 RESCHEDULE, rc=2 -> REJECT (DLQ)
    resched_rcs = sorted(
        r.redelivery_count for r in out.filter("verdict = 'RESCHEDULE'").collect()
    )
    dlq_rcs = [r.redelivery_count for r in out.filter("verdict = 'REJECT'").collect()]
    assert resched_rcs == [0, 1]
    assert dlq_rcs == [2]
    assert counts[:2] == [1, 2]


def test_compact_parquet_streaming_sink(spark, tmp_path):
    """A micro-batched parquet sink produces one small file per trigger;
    compact_parquet must collapse them to the target count, preserve every
    row, drop the _spark_metadata log, and leave a plain batch-readable dir."""
    from pulsar_message_filter_spark.streaming import (
        compact_parquet,
        sink_file_stats,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    # 12 input files consumed 1/trigger -> 12 micro-batches -> >=12 sink files
    for i in range(12):
        _write_events(
            spark,
            [(i * 10 + j, f"2024-01-01 00:{i:02d}:{j:02d}", j, "purchase", 1.0, "{}")
             for j in range(5)],
            input_dir,
        )
    stream = (
        spark.readStream.schema(spark.read.parquet(input_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    _run_available(
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "chk")),
        "compact_src",
    )
    before = sink_file_stats(spark, out_dir)
    assert before["n_files"] >= 12
    assert (Path(out_dir) / "_spark_metadata").exists()
    n_rows_before = spark.read.parquet(out_dir).count()

    stats = compact_parquet(spark, out_dir, target_file_bytes=1 << 30)
    assert stats["compacted"] is True
    assert stats["files_before"] == before["n_files"]
    assert stats["files_after"] == 1  # everything fits one 1 GiB target file
    assert not (Path(out_dir) / "_spark_metadata").exists()
    assert not Path(out_dir + "__compact_tmp").exists()
    assert not Path(out_dir + "__compact_old").exists()
    out = spark.read.parquet(out_dir)
    assert out.count() == n_rows_before == 60
    # idempotent second run is a no-op
    again = compact_parquet(spark, out_dir, target_file_bytes=1 << 30)
    assert again["compacted"] is False and again["files_after"] == 1


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """E4's Spark-4 variant: dropDuplicatesWithinWatermark keeps dedup state
    only for the watermark horizon — duplicates arriving within it are
    dropped even across micro-batches, and state cannot grow unboundedly
    (the 100 TB posture for stream dedup on an infinite id space)."""
    input_dir = str(tmp_path / "in")
    # batch 1: ids 1,2,3 — batch 2 (separate file): dup ids 2,3 + new 4,
    # all within a 10-minute watermark of each other
    _write_events(
        spark,
        [(i, f"2024-01-01 00:00:{i:02d}", i, "purchase", 1.0, "{}") for i in (1, 2, 3)],
        input_dir,
    )
    _write_events(
        spark,
        [(i, f"2024-01-01 00:01:{i:02d}", i, "purchase", 1.0, "{}") for i in (2, 3, 4)],
        input_dir,
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(input_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = _run_available(
        stream.writeStream.format("memory").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk")),
        "dedup_wm_t",
    )
    ids = sorted(r.event_id for r in spark.table("dedup_wm_t").collect())
    assert ids == [1, 2, 3, 4], ids
    q.stop()


def test_verdict_epoch_replay_idempotent(spark, tmp_path):
    """E10 for the foreachBatch leg: replaying a micro-batch (same epoch_id
    after a crash-before-checkpoint-commit) must not duplicate rows — the
    per-epoch dynamic partition overwrite makes the commit idempotent."""
    from pulsar_message_filter_spark.streaming.pipeline import write_verdict_epoch

    out_dir = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(1, 1, "purchase", 10.0, '{"k": 90}'),
         (2, 1, "view", 10.0, '{"k": 90}'),
         (3, 1, "view", 500.0, '{"k": 1}')],
        "event_id bigint, user_id bigint, event_type string, value double, props string",
    )
    accept = "props.k > 50 AND event_type = 'purchase'"
    write_verdict_epoch(batch, 0, out_dir, accept, reschedule="value >= 150")
    first = spark.read.parquet(out_dir)
    assert first.count() == 3
    # replay the SAME epoch: counts unchanged, ids unchanged
    write_verdict_epoch(batch, 0, out_dir, accept, reschedule="value >= 150")
    replay = spark.read.parquet(out_dir)
    assert replay.count() == 3
    assert sorted(r.event_id for r in replay.collect()) == [1, 2, 3]
    # a NEW epoch appends without touching epoch 0
    batch2 = spark.createDataFrame(
        [(4, 2, "purchase", 99.0, '{"k": 80}')],
        "event_id bigint, user_id bigint, event_type string, value double, props string",
    )
    write_verdict_epoch(batch2, 1, out_dir, accept, reschedule="value >= 150")
    both = spark.read.parquet(out_dir)
    assert both.count() == 4
    assert sorted(r.event_id for r in both.collect()) == [1, 2, 3, 4]


def test_compact_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the data parked in
    __compact_old with the target path missing; the next compact_parquet run
    must restore the original directory before proceeding (self-healing)."""
    import os

    from pulsar_message_filter_spark.streaming import compact_parquet

    out_dir = str(tmp_path / "out")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.repartition(10).write.parquet(out_dir)
    n_before = spark.read.parquet(out_dir).count()

    # simulate the crash window: first rename done, second never happened
    os.rename(out_dir, out_dir + "__compact_old")
    # (a half-written tmp dir may or may not exist; leave one behind)
    df.limit(1).write.parquet(out_dir + "__compact_tmp")
    assert not Path(out_dir).exists()

    stats = compact_parquet(spark, out_dir, target_file_bytes=1 << 30)
    # recovery restored the original 100 rows, then compaction proceeded
    assert stats["compacted"] is True
    out = spark.read.parquet(out_dir)
    assert out.count() == n_before == 100
    assert not Path(out_dir + "__compact_old").exists()
    assert not Path(out_dir + "__compact_tmp").exists()


def test_normalize_pulsar_frame_deterministic_event_id(spark):
    """A3/E4: event_id must be stable across two materializations of the
    same frame (replay safety for downstream dedup) — a metadata hash, not
    monotonically_increasing_id."""
    from pulsar_message_filter_spark.sources.pulsar import normalize_pulsar_frame

    rows = [
        (bytearray(b"k1"), bytearray(b"payload-a"), "events", {"p": "1"},
         "2024-01-01 10:00:00", "2024-01-01 10:00:01"),
        (bytearray(b"k2"), bytearray(b"payload-bb"), "events", {"p": "2"},
         "2024-01-01 10:00:02", "2024-01-01 10:00:03"),
        (bytearray(b"k3"), bytearray(b"payload-ccc"), "orders", {}, 
         "2024-01-01 10:00:04", "2024-01-01 10:00:05"),
    ]
    frame = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, properties map<string,string>, "
        "eventTime_s string, publishTime_s string",
    ).select(
        "key", "value", "topic", "properties",
        F.to_timestamp("eventTime_s").alias("eventTime"),
        F.to_timestamp("publishTime_s").alias("publishTime"),
    )
    # two materializations under different partition layouts
    ids_a = sorted(r.event_id for r in normalize_pulsar_frame(frame.repartition(4)).collect())
    ids_b = sorted(r.event_id for r in normalize_pulsar_frame(frame.repartition(2)).collect())
    assert ids_a == ids_b
    assert len(set(ids_a)) == 3  # distinct per message
    # connector frames carrying messageId use the broker identity instead
    with_mid = frame.withColumn("messageId", F.col("key"))
    ids_m1 = sorted(r.event_id for r in normalize_pulsar_frame(with_mid).collect())
    ids_m2 = sorted(r.event_id for r in normalize_pulsar_frame(with_mid.repartition(3)).collect())
    assert ids_m1 == ids_m2


def test_compact_if_needed_policy(spark, tmp_path):
    """The scheduler wrapper triggers only on many-AND-small directories."""
    from pulsar_message_filter_spark.streaming import compact_if_needed

    out_dir = str(tmp_path / "out")
    spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(20).write.parquet(out_dir)

    # 20 small files but under the file-count bar -> untouched
    r = compact_if_needed(spark, out_dir, max_files=64)
    assert r["triggered"] is False and r["compacted"] is False
    # over the bar and tiny files -> compacts to 1 target file
    r = compact_if_needed(spark, out_dir, max_files=10, target_file_bytes=1 << 30)
    assert r["triggered"] is True and r["compacted"] is True
    assert r["files_after"] == 1
    assert spark.read.parquet(out_dir).count() == 1000
    # healthy afterwards -> no retrigger
    r = compact_if_needed(spark, out_dir, max_files=10)
    assert r["triggered"] is False


def test_streaming_dedup_pipeline_cross_batch_and_replay(spark, tmp_path):
    """E×F1/F2: micro-batches dedup against the signature store built by
    earlier batches; a replayed epoch reproduces its output instead of
    dropping its own rows as self-duplicates."""
    from pulsar_message_filter_spark.operators.dedup import (
        minhash_dedup_incremental,
    )
    from pulsar_message_filter_spark.streaming.pipeline import (
        streaming_dedup_pipeline,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    sig_dir = str(tmp_path / "sigs")
    chk = str(tmp_path / "chk")
    Path(input_dir).mkdir()

    docs = load(spark, "documents", SF_SMOKE)
    base = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 220))
    # file 1: 20 fresh docs; file 2: 5 exact copies (new ids) + 5 fresh
    base.coalesce(1).write.mode("append").parquet(input_dir)
    copies = base.filter(F.col("doc_id") < 205).select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    fresh2 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 305))
    copies.unionByName(fresh2).coalesce(1).write.mode("append").parquet(input_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        streaming_dedup_pipeline(stream, sig_dir, out_dir, chk)
        .queryName("sdedup_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    out = spark.read.parquet(out_dir)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    # batch-1 docs survive; batch-2 copies dropped vs history, fresh kept.
    # NB micro-batch file order is not guaranteed: whichever side of a
    # cross-batch dup pair arrives first wins, so assert the invariants
    # rather than one fixed order (here copies have disjoint id ranges).
    n_out = len(ids)
    assert n_out == 25, ids  # 20 + 5 fresh; the 5 copies collapsed
    assert set(range(300, 305)) <= set(ids)
    assert len({i for i in ids if i >= 50_000} | {i for i in ids if 200 <= i < 205}) == 5

    # simulate a crash-replay of the LAST epoch: same rows, same epoch id
    last_epoch = max(
        r.epoch_id for r in out.select("epoch_id").distinct().collect()
    )
    replay_rows = out.filter(F.col("epoch_id") == last_epoch).drop("epoch_id")
    n_before = out.count()
    kept_again = minhash_dedup_incremental(
        spark.createDataFrame(replay_rows.collect(), replay_rows.schema),
        sig_dir,
        epoch_id=int(last_epoch),
    )
    # the replay keeps the same rows it kept the first time (not zero)
    assert kept_again.count() == replay_rows.count()
    # and the store did not grow (epoch partition was overwritten, not appended)
    sig_docs = spark.read.parquet(sig_dir).select("doc").count()
    assert sig_docs == n_before


def test_throttle_stateful_token_bucket_across_batches(spark, tmp_path):
    """E8/B13: event-time token bucket carries tokens across micro-batches.

    rate=1/s, burst=2.  Batch 1: three events in the same second -> the
    first two consume the burst, the third throttles.  Batch 2 (10 s
    later): bucket refilled to burst, both events pass."""
    from pulsar_message_filter_spark.streaming import throttle_stateful

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    stream = file_message_stream(spark, input_dir).withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    q = (
        throttle_stateful(stream, rate_per_s=1.0, burst=2.0)
        .writeStream.format("memory")
        .outputMode("update")
        .queryName("throttle_t")
        .start()
    )
    try:
        _write_events(
            spark,
            [
                (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
                (2, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
                (3, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
            ],
            input_dir,
        )
        q.processAllAvailable()
        first = {
            (r.user_id): (r.n_passed, r.n_throttled)
            for r in spark.table("throttle_t").collect()
        }
        _write_events(
            spark,
            [
                (4, "2024-01-01 10:00:10", 7, "click", 1.0, "{}"),
                (5, "2024-01-01 10:00:10", 7, "click", 1.0, "{}"),
            ],
            input_dir,
        )
        q.processAllAvailable()
        rows = spark.table("throttle_t").collect()
    finally:
        q.stop()
    assert first[7] == (2, 1)  # burst=2 consumed, third throttled
    # second batch: 10 s * 1/s refill capped at burst=2 -> both pass
    last = rows[-1]
    assert (last.n_passed, last.n_throttled) == (2, 0)


def test_bloom_dedup_pipeline_first_occurrence_wins(spark, tmp_path):
    """E-series × F1/F14: the persisted-Bloom streaming dedup drops exact
    duplicates across micro-batches without ever rescanning historical
    documents (filter = OR-reduced stored word tables)."""
    import time as _time

    from pulsar_message_filter_spark.streaming.pipeline import bloom_dedup_pipeline

    input_dir = str(tmp_path / "in")
    schema = "doc_id bigint, text string"

    def write_docs(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    write_docs([(i, f"doc number {i}") for i in range(1, 11)])
    write_docs(
        [(i, f"doc number {i}") for i in range(11, 16)]
        + [(100 + i, f"doc number {i}") for i in range(1, 6)]  # dups of b1
    )
    write_docs(
        [(200 + i, f"doc number {i}") for i in (11, 12)]  # dups of b2
        + [(16, "doc number 16")]
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = bloom_dedup_pipeline(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == list(range(1, 17)), ids
    # the key store holds exactly one entry per distinct text
    keys = spark.read.parquet(str(tmp_path / "store/keys"))
    assert keys.select("__canon").distinct().count() == 16


def test_survivor_pick_pipeline_cross_batch_neardup(spark, tmp_path):
    """E-series × F33: streaming near-dup removal — history wins across
    micro-batches (span overlap with a kept doc drops the newcomer), and
    within a batch the quality-domination pick keeps the longer doc."""
    import time as _time

    from pulsar_message_filter_spark.streaming.pipeline import survivor_pick_pipeline

    input_dir = str(tmp_path / "in")
    schema = "doc_id bigint, text string, n_chars bigint"

    def doc(i, text):
        return (i, text, len(text))

    def write_docs(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)

    # SPAN_WIDTH=15 tokens: `base` is a 15-token span shared by near-dups
    base = " ".join(f"w{i}" for i in range(15))
    other = " ".join(f"x{i}" for i in range(16))
    fresh2 = " ".join(f"y{i}" for i in range(16))
    # batch 1: doc 1 and its shorter near-dup doc 2 (share the `base`
    # span); doc 3 unrelated
    write_docs(
        [
            doc(1, base + " extra tail words here"),
            doc(2, base),
            doc(3, other),
        ]
    )
    # batch 2: doc 4 shares the `base` span with kept doc 1 → dropped by
    # history; doc 5 is fresh
    write_docs(
        [
            doc(4, base + " totally different continuation"),
            doc(5, fresh2),
        ]
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = survivor_pick_pipeline(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    # doc 2 dominated in-batch by doc 1; doc 4 span-matches kept history
    assert ids == [1, 3, 5], ids


def test_ivm_view_pipeline_maintains_agg_across_batches(spark, tmp_path):
    """E-series × C11/F14: the materialized COUNT/SUM view is maintained
    by per-batch delta application — inserts, updates, and deletes across
    micro-batches converge to the same state a full recompute would give."""
    import time as _time

    from pulsar_message_filter_spark.streaming.pipeline import ivm_view_pipeline

    input_dir = str(tmp_path / "in")
    schema = "o_custkey bigint, dn bigint, dcents bigint"

    def write_changes(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)

    # batch 1: inserts for groups 1 and 2
    write_changes([(1, 1, 100), (1, 1, 200), (2, 1, 50)])
    # batch 2: update group 1 (+25), delete group 2's only order, new group 3
    write_changes([(1, 0, 25), (2, -1, -50), (3, 1, 999)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = ivm_view_pipeline(
        stream, str(tmp_path / "view"), str(tmp_path / "chk")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    state = spark.read.parquet(str(tmp_path / "view/state"))
    last = state.agg(F.max("epoch_id")).collect()[0][0]
    view = {
        r.o_custkey: (r.n_orders, r.total_cents)
        for r in state.filter(F.col("epoch_id") == last).collect()
    }
    assert view == {1: (2, 325), 3: (1, 999)}  # group 2 emptied out


def test_ivm_view_pipeline_survives_emptied_view(spark, tmp_path):
    """Regression: an epoch that empties the ENTIRE view writes no state
    partition (dynamic overwrite of zero rows) — the manifest must still
    record it, so deleted groups stay deleted instead of resurrecting
    from the stale previous epoch."""
    import time as _time

    from pulsar_message_filter_spark.streaming.pipeline import ivm_view_pipeline

    input_dir = str(tmp_path / "in")
    schema = "o_custkey bigint, dn bigint, dcents bigint"

    def write_changes(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)

    write_changes([(1, 1, 100)])          # batch 1: insert g1
    write_changes([(1, -1, -100)])        # batch 2: delete g1 → view EMPTY
    write_changes([(2, 1, 77)])           # batch 3: insert g2

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = ivm_view_pipeline(
        stream, str(tmp_path / "view"), str(tmp_path / "chk")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    manifest = spark.read.parquet(str(tmp_path / "view/manifest"))
    last = manifest.agg(F.max("epoch_id")).collect()[0][0]
    state = spark.read.parquet(str(tmp_path / "view/state"))
    view = {
        r.o_custkey: (r.n_orders, r.total_cents)
        for r in state.filter(F.col("epoch_id") == last).collect()
    }
    assert view == {2: (1, 77)}, view  # g1 must NOT resurrect


def test_sketch_rollup_pipeline_merges_to_batch_truth(spark, tmp_path):
    """E-series × C12: per-epoch CMS/HLL partials merged on read equal the
    sketches built over ALL events in one batch pass — the mergeability
    contract, end-to-end through the streaming store."""
    import time as _time

    from pulsar_message_filter_spark.operators.sketch import cms_build, hll_registers
    from pulsar_message_filter_spark.streaming.pipeline import (
        read_sketch_rollup,
        sketch_rollup_pipeline,
    )

    input_dir = str(tmp_path / "in")
    schema = "event_id bigint, user_id bigint"

    def write_events(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)

    b1 = [(i, i % 7) for i in range(50)]
    b2 = [(100 + i, i % 13) for i in range(50)]
    write_events(b1)
    write_events(b2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = sketch_rollup_pipeline(
        stream, str(tmp_path / "store"), str(tmp_path / "chk")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    merged_cms, merged_hll = read_sketch_rollup(spark, str(tmp_path / "store"))
    whole = spark.createDataFrame(b1 + b2, schema)
    truth_cms = {(r.row, r.cell): r.cnt for r in cms_build(whole, "user_id").collect()}
    truth_hll = {
        (r.register): r.max_rho for r in hll_registers(whole, "user_id").collect()
    }
    assert {(r.row, r.cell): r.cnt for r in merged_cms.collect()} == truth_cms
    assert {r.register: r.max_rho for r in merged_hll.collect()} == truth_hll


def test_psi_monitor_flags_drifted_window_only(spark, tmp_path):
    """Streaming drift monitor: windowed histogram + per-epoch PSI vs a
    frozen reference.  Window 1 replays the reference distribution (PSI ≈ 0);
    window 2 is shifted far out of the reference support (PSI large); a
    sentinel event advances the watermark so both windows close."""
    from pulsar_message_filter_spark.streaming.pipeline import (
        psi_monitor_pipeline,
        reference_histogram,
    )

    input_dir = str(tmp_path / "in")
    Path(input_dir).mkdir()
    out_dir = str(tmp_path / "psi")

    # frozen reference: values 0..199 uniform → bins 0..7 (width 25)
    ref_rows = [(float(v % 200),) for v in range(400)]
    reference = reference_histogram(
        spark.createDataFrame(ref_rows, "value double"), "value"
    )

    # window 10:00 matches the reference; window 11:00 sits in bins 16+
    w1 = [
        (i, f"2024-01-01 10:{i % 60:02d}:00", i, "t", float((i * 7) % 200), "{}")
        for i in range(120)
    ]
    w2 = [
        (1000 + i, f"2024-01-01 11:{i % 60:02d}:00", i, "t", 420.0 + (i % 60), "{}")
        for i in range(120)
    ]
    sentinel = [(9999, "2024-01-01 13:00:00", 1, "t", 1.0, "{}")]
    _write_events(spark, w1 + w2 + sentinel, input_dir)

    stream = file_message_stream(spark, input_dir)
    q = psi_monitor_pipeline(
        stream,
        reference,
        out_dir,
        checkpoint=str(tmp_path / "ck"),
        window="1 hour",
        watermark="30 minutes",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r.window_start.strftime("%H:%M"): r for r in spark.read.parquet(out_dir).collect()
    }
    assert "10:00" in rows and "11:00" in rows, sorted(rows)
    assert rows["10:00"].cur_total == 120 and rows["11:00"].cur_total == 120
    assert rows["10:00"].psi < 0.1, rows["10:00"].psi
    assert rows["11:00"].psi > 1.0, rows["11:00"].psi
    # streaming monitor agrees with the batch PSI operator on the same data
    from pulsar_message_filter_spark.operators.drift import psi_profile

    batch = spark.createDataFrame(
        [(float((i * 7) % 200), 1) for i in range(120)]
        + [(float(v % 200), 0) for v in range(400)],
        "value double, cur int",
    )
    batch_psi = round(
        sum(
            r.psi_term
            for r in psi_profile(batch, "value", F.col("cur") == 0).collect()
        ),
        4,
    )
    assert abs(rows["10:00"].psi - batch_psi) < 5e-4


def test_winnowing_dedup_pipeline_cross_batch_partial_overlap(spark, tmp_path):
    """E-series × F57: streaming partial-overlap dedup — a doc sharing a
    long run with a KEPT historical doc is dropped (history wins), a doc
    sharing the run with a lower-id doc in its own batch is dropped, and
    disjoint docs pass.  Checks the winnowing store detects overlap that
    whole-doc hashing would miss (no doc is an exact copy of another)."""
    import time as _time

    from pulsar_message_filter_spark.streaming.pipeline import (
        winnowing_dedup_pipeline,
    )

    input_dir = str(tmp_path / "in")
    schema = "doc_id bigint, text string"

    def write_docs(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)
        _time.sleep(1.1)

    # a 12-token run shared by the near-dups (>= w+k-1 = 7 guarantees >=1
    # shared fingerprint; 12 tokens -> 9 shared grams, comfortably >= 3)
    run = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"x{i}" for i in range(14))
    fresh = " ".join(f"y{i}" for i in range(14))
    # batch 1: doc 1 keeps (first), doc 2 shares the run -> in-batch drop,
    # doc 3 disjoint -> keeps
    write_docs(
        [
            (1, run + " unique continuation alpha beta"),
            (2, "different prefix here " + run),
            (3, other),
        ]
    )
    # batch 2: doc 4 shares the run with kept doc 1 -> history drop;
    # doc 5 disjoint -> keeps
    write_docs(
        [
            (4, run + " yet another different tail"),
            (5, fresh),
        ]
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = winnowing_dedup_pipeline(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "chk"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == [1, 3, 5], ids


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """E7's hard half: LEFT OUTER stream-stream join.  Matched impressions
    join immediately; an UNMATCHED impression may only emit (with null
    click columns) once the watermark on both sides has passed its join
    window — Spark holds it in state until then.  Both behaviors are
    asserted, plus the no-lost-rows invariant: every impression appears
    exactly once."""
    import time as _time

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    schema = "id string, user_id bigint, ts timestamp"

    def write(path, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        _time.sleep(0.3)

    from datetime import datetime

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    # impression A has a click 2 min later; impression B has none.
    write(imp_dir, [("A", 1, t("10:00:00")), ("B", 2, t("10:00:05"))])
    write(
        clk_dir,
        [
            ("cA", 1, t("10:02:00")),
            # watermark driver: far-future click advances both watermarks
            # past B's 10-minute join window so B's null row can emit
            ("late", 99, t("11:00:00")),
        ],
    )
    # also advance the impression-side watermark (the join watermark is
    # the min over both sides)
    write(imp_dir, [("wm", 98, t("11:00:00"))])

    imps = (
        spark.readStream.schema(schema).parquet(imp_dir)
        .withWatermark("ts", "1 minute")
        .select(F.col("id").alias("imp_id"), F.col("user_id").alias("i_user"),
                F.col("ts").alias("i_ts"))
    )
    clks = (
        spark.readStream.schema(schema).parquet(clk_dir)
        .withWatermark("ts", "1 minute")
        .select(F.col("id").alias("click_id"), F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
    )
    joined = imps.join(
        clks,
        (F.col("i_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("i_ts"))
        & (F.col("c_ts") <= F.col("i_ts") + F.expr("interval 10 minutes")),
        "leftOuter",
    )
    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def run_once():
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    # outer-null results flush in a batch AFTER the watermark passes the
    # join window; a second checkpoint-resumed run (new watermark-driver
    # rows on both sides) forces that batch — the operational pattern for
    # availableNow jobs that need outer-join completeness
    write(imp_dir, [("wm2", 97, t("12:00:00"))])
    write(clk_dir, [("late2", 96, t("12:00:00"))])
    run_once()

    rows = {r.imp_id: r for r in spark.read.parquet(out_dir).collect()
            if not r.imp_id.startswith("wm")}
    assert set(rows) == {"A", "B"}  # every impression exactly once
    assert rows["A"].click_id == "cA"  # matched within the window
    assert rows["B"].click_id is None  # unmatched -> null AFTER watermark
