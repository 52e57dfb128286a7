"""Streaming soak: sustained-rate throughput of the filtering pipeline.

Drives the full verdict pipeline (selector → ACCEPT/REJECT/RESCHEDULE →
partitioned parquet sink, exactly-once checkpointing) and a stateful
windowed aggregation (RocksDB state store) from the rate source at a
target rows/s for a fixed duration, then reports what Structured
Streaming actually sustained (``processedRowsPerSecond`` over the
completed micro-batches, warm-up excluded).

This is the TODO.md "streaming soak" in CI-sized form — minutes, not
hours — and the per-rate JSON line makes regressions diffable::

    python tools/stream_soak.py                    # 20k rows/s, 60 s
    python tools/stream_soak.py 50000 120          # 50k rows/s, 120 s
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    """Recursive on-disk size of a directory (checkpoint/backlog meter)."""
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def publish_atomic(df, tag: str, stage_root: str, topic_dir: str) -> None:
    """Write-then-atomic-rename publish into a file-queue topic dir.

    Two jobs appending to ONE directory share the FileOutputCommitter's
    ``_temporary/0`` staging dir — the retry-topic ingest and consumer
    raced there and one deleted it mid-commit of the other (observed:
    FileNotFoundException .../_temporary/0 at 20k rows/s).  The file-queue
    answer is a private staging dir per publish + an atomic rename of the
    finished part file into the topic — exactly how file-based queues
    hand off complete files.  One small file per publish: the retry topic
    is low-volume by construction (the resched fraction of the inflow).

    ``tag`` must be (stream, epoch_id)-derived, NOT random: a
    checkpoint-recovered micro-batch REPLAYS with the same epoch_id, and
    ``os.replace`` then overwrites the earlier publish instead of
    duplicating messages — the idempotent-sink half of the exactly-once
    contract (E10), same discipline as the engine's epoch-keyed
    dynamic-overwrite parquet sinks (pinned in
    tests/test_round12_ops.py::test_publish_atomic_is_replay_idempotent).
    """
    tmp = os.path.join(stage_root, tag)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for fname in sorted(os.listdir(tmp)):
        if fname.startswith("part-") and not fname.endswith(".crc"):
            os.replace(
                os.path.join(tmp, fname),
                os.path.join(topic_dir, f"{tag}.parquet"),
            )
            break  # coalesce(1): exactly one data file
    shutil.rmtree(tmp, ignore_errors=True)


def run_retry_phase(spark, rate: int, duration_s: int) -> dict:
    """Soak phase B: the RESCHEDULE retry-topic loop LIVE (VERDICT r08 #4)
    — the streaming twin of ``operators/widen.retry_topic_loop``.

    An ingest stream writes rescheduled rows to a retry-topic dir with
    ``attempt+1`` and a ``not_before`` visibility stamp; a file-source
    stream consumes that dir, re-evaluates rows past their visibility,
    re-enqueues survivors, and terminalizes accept/DLQ.
    ``cleanSource=delete`` removes consumed files, so the retry dir holds
    ONLY the pending population — its byte size is the state-growth
    meter: bounded because every message exhausts in ≤ ``_MAX_ATTEMPTS``
    deliveries regardless of input volume.

    Reported "sustains rate": terminal throughput in the post-warm-up
    window vs the expected resched inflow (every rescheduled message
    terminalizes exactly once, so at steady state the two rates match).
    """
    import statistics as _st

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from pulsar_message_filter_spark.filtering import RESCHEDULE, with_verdict
    from pulsar_message_filter_spark.operators.widen import (
        _MAX_ATTEMPTS,
        _RETRY_ACCEPT,
        _RETRY_RESCHED,
        _RETRY_SCHEMA,
    )
    from pulsar_message_filter_spark.sources import rate_message_stream

    root = tempfile.mkdtemp(prefix="pmf_soak_retry_")
    retry_dir = f"{root}/retry_topic"
    os.makedirs(retry_dir, exist_ok=True)
    retry_delay_ms = 5_000
    retry_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
            StructField("attempt", LongType()),
            StructField("visible_ms", LongType()),
        ]
    )
    retry_stats: list[dict] = []

    stage_root = f"{root}/stage"
    os.makedirs(stage_root, exist_ok=True)

    def publish(df, tag: str) -> None:
        publish_atomic(df, tag, stage_root, retry_dir)

    def ingest_batch(df, epoch_id: int) -> None:
        tagged = with_verdict(
            df.withColumn("attempt", F.lit(1).cast("long")),
            _RETRY_ACCEPT,
            _RETRY_RESCHED,
            schema=_RETRY_SCHEMA,
        )
        now_ms = int(time.time() * 1000)
        resched = (
            tagged.filter(F.col("verdict") == RESCHEDULE)
            .drop("verdict")
            .withColumns(
                {
                    "attempt": F.lit(2).cast("long"),
                    "visible_ms": F.lit(now_ms + retry_delay_ms),
                }
            )
        )
        publish(resched, f"ingest-{epoch_id}")

    def retry_batch(df, epoch_id: int) -> None:
        t_batch = time.time()
        now_ms = int(time.time() * 1000)
        tagged = with_verdict(
            df, _RETRY_ACCEPT, _RETRY_RESCHED, schema=_RETRY_SCHEMA
        ).withColumn(
            "disposition",
            F.when(F.col("visible_ms") > now_ms, F.lit("CARRY"))
            .when(
                (F.col("verdict") == RESCHEDULE)
                & (F.col("attempt") < _MAX_ATTEMPTS),
                F.lit("RE_ENQUEUE"),
            )
            .otherwise(F.lit("TERMINAL")),
        )
        tagged.persist()
        try:
            back = tagged.filter(F.col("disposition") != "TERMINAL").select(
                "event_id",
                "ts",
                "user_id",
                "event_type",
                "value",
                "props",
                F.when(F.col("disposition") == "RE_ENQUEUE", F.col("attempt") + 1)
                .otherwise(F.col("attempt"))
                .alias("attempt"),
                F.when(
                    F.col("disposition") == "RE_ENQUEUE",
                    F.col("visible_ms") + retry_delay_ms,
                )
                .otherwise(F.col("visible_ms"))
                .alias("visible_ms"),
            )
            publish(back, f"retry-{epoch_id}")
            counts = {
                r.disposition: r.n
                for r in tagged.groupBy("disposition")
                .agg(F.count("*").alias("n"))
                .collect()
            }
        finally:
            tagged.unpersist()
        retry_stats.append(
            {
                "epoch": epoch_id,
                "n_reenqueued": counts.get("RE_ENQUEUE", 0),
                "n_carried": counts.get("CARRY", 0),
                "n_terminal": counts.get("TERMINAL", 0),
                "batch_wall_s": round(time.time() - t_batch, 2),
            }
        )

    qa = (
        rate_message_stream(spark, rows_per_second=rate)
        .writeStream.foreachBatch(ingest_batch)
        .trigger(processingTime="5 seconds")
        .option("checkpointLocation", f"{root}/cka")
        .start()
    )
    qb = (
        spark.readStream.schema(retry_schema)
        .option("cleanSource", "delete")
        .option("maxFilesPerTrigger", 256)
        .parquet(retry_dir)
        .writeStream.foreachBatch(retry_batch)
        .trigger(processingTime="5 seconds")
        .option("checkpointLocation", f"{root}/ckb")
        .start()
    )
    pending_timeline: list[dict] = []
    try:
        t0 = time.time()
        while time.time() - t0 < duration_s:
            time.sleep(10)
            pending_timeline.append(
                {
                    "elapsed_s": round(time.time() - t0),
                    "pending_bytes": _dir_bytes(retry_dir),
                }
            )
    finally:
        qa.stop()
        qb.stop()
        shutil.rmtree(root, ignore_errors=True)

    # warm-up = the first visibility delay + one cycle; steady-state window
    # is the second half of the phase
    tail = retry_stats[len(retry_stats) // 2 :]
    terminal_tail = sum(s["n_terminal"] for s in tail)
    tail_s = max(1.0, duration_s / 2)
    # expected terminal rate at steady state == resched inflow: event_type
    # in {view, click} (2/5 of rows) with value <= 120 (~60% of the rate
    # source's 0.5..199.5 value ramp)
    expected_terminal_per_s = rate * (2 / 5) * 0.6
    # Adjudication of the r09 2.5% shortfall (4,680 vs 4,800 expected):
    # batches fire once per visibility cycle (~5 s apart — 39 batches in
    # 200 s), so the tail window truncates at a CYCLE boundary.  Inflow
    # that arrives inside the tail but terminalizes after the phase stops
    # is never counted — up to one full cycle's worth of rows, i.e. a
    # (delay + median batch wall) / tail_s fraction of the window (~5.6%
    # at r09 settings).  The measured 2.5% gap sits inside that bound, so
    # keeps_up is now judged against an EXPLICIT budget — quantization
    # plus a 5% local-mode scheduling margin — instead of the old bare
    # 0.8 factor (VERDICT r09 item #5).
    # median over TAIL batches only (warm-up walls are the longest and
    # would inflate the budget used to judge the tail-only rate), and the
    # budget is clamped so a degenerate short run can't make the check
    # vacuous (budget >= 1 would pass at zero throughput).
    median_wall = (
        _st.median([s["batch_wall_s"] for s in tail]) if tail else 0.0
    )
    quantization_budget = min(
        0.5, (retry_delay_ms / 1000.0 + median_wall) / tail_s
    )
    tail_ratio = (terminal_tail / tail_s) / expected_terminal_per_s
    pend = [p["pending_bytes"] for p in pending_timeline]
    pend_bounded = True
    if len(pend) >= 6:
        third = len(pend) // 3
        pend_bounded = max(pend[2 * third :]) <= max(
            max(pend[third : 2 * third]) * 1.3, 4 << 20
        )
    return {
        "batches": len(retry_stats),
        "phase_duration_s": duration_s,
        "n_terminal_total": sum(s["n_terminal"] for s in retry_stats),
        "n_reenqueued_total": sum(s["n_reenqueued"] for s in retry_stats),
        "terminal_rows_per_sec_tail": round(terminal_tail / tail_s, 1),
        "expected_terminal_rows_per_sec": round(expected_terminal_per_s, 1),
        "tail_rate_ratio": round(tail_ratio, 4),
        "quantization_error_budget": round(quantization_budget, 4),
        "keeps_up": tail_ratio >= 1.0 - quantization_budget - 0.05,
        "pending_bytes_timeline": pending_timeline,
        "pending_bounded": pend_bounded,
        "max_attempts": _MAX_ATTEMPTS,
        "visibility_delay_ms": retry_delay_ms,
        "batch_wall_s_median": _st.median(
            [s["batch_wall_s"] for s in retry_stats]
        )
        if retry_stats
        else None,
    }


def main() -> None:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    duration_s = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.parity import cents as _cents
    from pulsar_message_filter_spark.session import get_spark
    from pulsar_message_filter_spark.sources import rate_message_stream
    from pulsar_message_filter_spark.streaming import filtered_sink_pipeline

    spark = get_spark("pmf-stream-soak")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # default minBatchesToRetain=100 keeps EVERY checkpoint version for the
    # first 100 micro-batches — a CI-length soak would time out before any
    # cleanup and read as unbounded growth.  10 retained versions is ample
    # recovery depth and lets the soak demonstrate the actual plateau.
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "10")
    # NAMED memory bound (VERDICT r06 #3): without it, RocksDB's block cache
    # + retained memtables grow until RocksDB's own defaults kick in, which a
    # 5-minute soak reads as monotonic `memoryUsedBytes`.  Bounded mode puts
    # cache+memtables under one LRU budget shared by every store instance on
    # the node, so state MEMORY is capped by configuration (state correctness
    # never depends on it — overflow evicts to SST files, which is the
    # disk-backed point of RocksDB at 100 TB).
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "256")
    root = tempfile.mkdtemp(prefix="pmf_soak_")
    stream = rate_message_stream(spark, rows_per_second=rate)

    # leg 1: full verdict pipeline → partitioned parquet sink
    q1 = filtered_sink_pipeline(
        stream,
        accept="props.k > 50 AND event_type IN ('purchase', 'error')",
        reschedule="value >= 150",
        out_dir=f"{root}/out",
        checkpoint_dir=f"{root}/ck1",
    ).start()

    # leg 2: stateful windowed aggregation on the same shape (own source —
    # rate sources are per-query), RocksDB-backed state
    agg = (
        rate_message_stream(spark, rows_per_second=rate)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds"), "event_type")
        .agg(F.count("*").alias("n"), F.avg("value").alias("avg_value"))
    )
    q2 = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{root}/ck2")
        .start()
    )

    # leg 3: sustained sessionization over a wide key space (100k keys) —
    # the RocksDB state-size profile.  Steady per-key traffic keeps one open
    # session per key, so bounded state == numRowsTotal plateauing at the
    # key-space size instead of growing with input volume.
    sess = (
        rate_message_stream(spark, rows_per_second=rate)
        .select("ts", (F.col("event_id") % 100_000).alias("user_key"), "value")
        .withWatermark("ts", "10 seconds")
        .groupBy(F.session_window("ts", "5 seconds"), "user_key")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    q3 = (
        # session-window aggs only support append mode: rows emit when a
        # session finalizes past the watermark; state carries open sessions
        sess.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{root}/ck3")
        .start()
    )

    # leg 4: per-key token-bucket throttling (applyInPandasWithState) over
    # a 10k-key space — state is two fixed-width fields per key, so the
    # bounded-state claim is "rows plateau at the key count"
    from pulsar_message_filter_spark.streaming import throttle_stateful

    thr = (
        rate_message_stream(spark, rows_per_second=rate)
        .select(
            (F.col("event_id") % 10_000).alias("user_id"),
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
        )
    )
    q4 = (
        throttle_stateful(thr, rate_per_s=5.0, burst=10.0)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{root}/ck4")
        .start()
    )

    # leg 5: SLIDING window aggregate (the e2c_sliding_revenue shape at
    # stream cadence: 15 s window / 5 s hop → every row lands in exactly 3
    # windows via the Expand node).  Bounded state = (live windows within
    # the watermark horizon) × |event_type|, so the plateau claim is
    # "rows stay at a few dozen", independent of input volume — the E2
    # batch twin's 100 TB story exercised LIVE.
    slide = (
        rate_message_stream(spark, rows_per_second=rate)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "15 seconds", "5 seconds"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents("value")).alias("revenue_cents"),
        )
    )
    q5 = (
        slide.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{root}/ck5")
        .start()
    )

    # leg 6: sliding window DISTINCT via the sketch path — the
    # sliding_distinct(method='auto') at-volume guard exercised LIVE:
    # approx_count_distinct keeps ONE constant-size HLL buffer per open
    # (window, type) group, so state stays bounded by live-window count
    # no matter how many distinct users stream through (the exact form's
    # state would be (window x user) rows — the measured 1.23-exponent
    # class this guard replaces at scale).
    slide_sketch = (
        rate_message_stream(spark, rows_per_second=rate)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "15 seconds", "5 seconds"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("n_users_est"),
            F.count("*").alias("n"),
        )
    )
    q6 = (
        slide_sketch.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{root}/ck6")
        .start()
    )

    # leg 7 (VERDICT r13 #5): the e2i COMPOSITION live — sliding_distinct(
    # method='hll', extra_aggs=[...]) is the round-18 two-pass shape (register
    # sketch pass + exact rider-agg pass joined per window).  It is batch code
    # by construction (two scans of one frame + one bounded join), so the
    # streaming read path exercises it the way a production job would:
    # foreachBatch runs the composition over every micro-batch and
    # materializes the joined frame.  No cross-batch state — this leg grades
    # sustained THROUGHPUT of the new join path at the rate target, not state
    # boundedness (the sketch pass's boundedness is leg 6's claim).
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    def _e2i_micro_batch(bdf, _epoch):
        sliding_distinct(
            bdf,
            "ts",
            "user_id",
            "15 seconds",
            "5 seconds",
            extra_aggs=[
                F.count("*").alias("n_events"),
                F.sum(_cents("value")).alias("revenue_cents"),
            ],
            method="hll",
        ).write.format("noop").mode("overwrite").save()

    q7 = (
        rate_message_stream(spark, rows_per_second=rate)
        .writeStream.foreachBatch(_e2i_micro_batch)
        .option("checkpointLocation", f"{root}/ck7")
        .start()
    )

    def state_profile(q) -> dict:
        """RocksDB state growth over the observed progress window: the
        bounded-state claim is 'rows plateau at the live-key count', not
        'rows track input volume'."""
        series = []
        for p in q.recentProgress:
            for op in p.get("stateOperators") or []:
                cm = op.get("customMetrics") or {}
                series.append(
                    {
                        "batch": p["batchId"],
                        "rows": op.get("numRowsTotal"),
                        "mem_bytes": op.get("memoryUsedBytes"),
                        "sst_bytes": cm.get("rocksdbSstFileSize"),
                    }
                )
        if not series:
            return {"batches": 0}
        tail = series[len(series) // 2 :]
        tail_rows = [s["rows"] for s in tail if s["rows"] is not None]
        plateau = statistics.median(tail_rows) if tail_rows else 0
        return {
            "batches": len(series),
            "state_rows_first": series[0]["rows"],
            "state_rows_last": series[-1]["rows"],
            "state_rows_plateau": plateau,
            "state_mem_bytes_last": series[-1]["mem_bytes"],
            "sst_bytes_last": series[-1]["sst_bytes"],
            # growth-based: small absolute slack so a handful of open
            # windows oscillating (e.g. 15→20 rows) doesn't read as growth
            "bounded": bool(tail_rows)
            and series[-1]["rows"] <= plateau * 1.25 + 100,
        }

    def sample_state(q) -> dict | None:
        """One (elapsed, rows, bytes) point from the query's last progress —
        recentProgress only retains ~100 entries, so long soaks need
        periodic sampling to cover the whole run, not just the tail."""
        p = q.lastProgress
        if not p:
            return None
        for op in p.get("stateOperators") or []:
            cm = op.get("customMetrics") or {}
            return {
                "batch": p["batchId"],
                "rows": op.get("numRowsTotal"),
                "mem_bytes": op.get("memoryUsedBytes"),
                "sst_bytes": cm.get("rocksdbSstFileSize"),
            }
        return None

    try:
        # sample the state stores periodically over the whole duration: the
        # bounded-state claim at hour scale is "the series is flat", which
        # the tail-window recentProgress cannot show on its own
        t0 = time.time()
        sample_every = max(10, min(60, duration_s // 20 or 10))
        timeline: dict[str, list] = {
            "stateful_window": [], "sessionization": [], "throttle": [],
            "sliding_window": [], "sliding_distinct_sketch": [],
        }
        ck_timeline: list = []
        while time.time() - t0 < duration_s:
            time.sleep(min(sample_every, max(1, duration_s - (time.time() - t0))))
            for name, q in (
                ("stateful_window", q2),
                ("sessionization", q3),
                ("throttle", q4),
                ("sliding_window", q5),
                ("sliding_distinct_sketch", q6),
            ):
                s = sample_state(q)
                if s is not None:
                    s["elapsed_s"] = round(time.time() - t0)
                    timeline[name].append(s)
            ck_timeline.append(
                {
                    "elapsed_s": round(time.time() - t0),
                    "ck_bytes": {
                        d: _dir_bytes(os.path.join(root, d))
                        for d in sorted(os.listdir(root))
                        if d.startswith("ck")
                    },
                }
            )
        report = {}
        for name, q in (
            ("verdict_pipeline", q1),
            ("stateful_window", q2),
            ("sessionization", q3),
            ("throttle", q4),
            ("sliding_window", q5),
            ("sliding_distinct_sketch", q6),
            ("sliding_hll_extra_aggs", q7),
        ):
            prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
            # drop the warm-up half: first batches pay JIT + state-store init
            tail = prog[len(prog) // 2 :]
            rps = [p["processedRowsPerSecond"] for p in tail]
            report[name] = {
                "batches": len(prog),
                "sustained_rows_per_sec": round(statistics.median(rps)) if rps else 0,
                "input_rows_per_sec_target": rate,
                "backlogged": bool(rps) and statistics.median(rps) < rate * 0.9,
            }
        report["stateful_window"]["state"] = state_profile(q2)
        report["sessionization"]["state"] = state_profile(q3)
        report["throttle"]["state"] = state_profile(q4)
        report["sliding_window"]["state"] = state_profile(q5)
        report["sliding_distinct_sketch"]["state"] = state_profile(q6)
        for name in (
            "stateful_window", "sessionization", "throttle",
            "sliding_window", "sliding_distinct_sketch",
        ):
            tl = timeline[name]
            report[name]["state_timeline"] = tl
            if len(tl) >= 4:
                rows = [s["rows"] for s in tl if s["rows"] is not None]
                # flat = the last quarter's median is within 25% of the
                # plateau established after warm-up (first quarter excluded)
                import statistics as _st

                # flat series = last-quarter median within 30% (+slack) of
                # the mid-run median: linear state growth fails this at any
                # duration, window-expiry oscillation does not
                mid = _st.median(rows[len(rows) // 4 : 3 * len(rows) // 4])
                last_q = _st.median(rows[3 * len(rows) // 4 :])
                report[name]["state"]["bounded_over_duration"] = (
                    last_q <= mid * 1.3 + 100
                )
    finally:
        q1.stop()
        q2.stop()
        q3.stop()
        q4.stop()
        q5.stop()
        q6.stop()
        q7.stop()
        shutil.rmtree(root, ignore_errors=True)

    # checkpoint growth: version cleanup runs on the maintenance interval,
    # so the size series is a SAWTOOTH (build up ~10 retained versions,
    # cleanup drops back).  Point-in-time growth rates are phase-sensitive;
    # the honest bounded test is that the sawtooth's PEAK stops rising:
    # max of the last third within 1.3x (+slack) of the middle third's max.
    if len(ck_timeline) >= 6:
        totals = [sum(p["ck_bytes"].values()) for p in ck_timeline]
        third = len(totals) // 3
        mid_max = max(totals[third : 2 * third])
        last_max = max(totals[2 * third :])
        report["checkpoints"] = {
            "bytes_first": totals[0],
            "bytes_last": totals[-1],
            "peak_mid_third": mid_max,
            "peak_last_third": last_max,
            "bounded": last_max <= mid_max * 1.3 + (8 << 20),
            "timeline": ck_timeline,
        }

    # phase B: the retry-topic loop, run ALONE after the main legs stop.
    # In one local JVM the loop's micro-batches starve behind four
    # full-rate legs (a local-mode scheduling artifact — measured: ~20
    # batches/110 s isolated vs 0-4 batches/150 s shared, FIFO or FAIR);
    # on a real cluster the retry consumer is its own job with its own
    # executors, which sequential phasing models honestly.
    report["retry_topic"] = run_retry_phase(
        spark, rate, max(120, duration_s // 3)
    )

    total_batches = sum(
        report[n]["batches"]
        for n in (
            "verdict_pipeline",
            "stateful_window",
            "sessionization",
            "throttle",
            "sliding_window",
            "retry_topic",
        )
    )
    report["total_batches"] = total_batches
    report["rocksdb"] = {"bounded_memory": True, "max_memory_usage_mb": 256}
    print(
        json.dumps(
            {"metric": "stream_soak", "rate_target": rate, "duration_s": duration_s, **report}
        )
    )


if __name__ == "__main__":
    main()
