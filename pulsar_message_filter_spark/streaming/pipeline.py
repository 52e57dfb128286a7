"""The streaming message-filter pipeline (SURVEY.md §3.3, §2.E/B13).

This is the upstream deployment shape re-expressed on Structured Streaming:
one source stream, N compiled selectors, verdict routing fanned out to
forward / DLQ / retry sinks in a single pass per micro-batch, with
checkpointed exactly-once delivery.

All functions take any message-shaped (streaming) DataFrame — rate source,
file source, or the Pulsar connector — semantics are identical.
"""

from __future__ import annotations

import math as _math
from typing import Iterator

import pandas as pd

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from pulsar_message_filter_spark.filtering import REJECT, RESCHEDULE, with_verdict
from pulsar_message_filter_spark.selector import Selector


def _cents_half_up(v: float) -> int:
    """Integer cents with HALF-UP ties (away from zero) — the rounding of
    Spark's ``F.round`` and DuckDB's ``round()``.  Python's built-in
    ``round`` is banker's (half-to-even) and would diverge from the
    hash-graded batch twin on exact .5 cents (ADVICE r08)."""
    cents = _math.floor(abs(v) * 100 + 0.5)
    return cents if v >= 0 else -cents


def route_batch(
    batch: DataFrame,
    accept: Selector | str,
    reschedule: Selector | str | None,
    retry_delay: str = "5 MINUTES",
    max_redeliveries: int = 3,
) -> DataFrame:
    """One-pass verdict tagging for a (micro-)batch, with redelivery
    bookkeeping: RESCHEDULE rows carry ``not_before`` (visibility time) and
    ``redelivery_count``; a message that has already been redelivered
    ``max_redeliveries`` times diverts to REJECT — the broker's
    maxRedeliverCount → DLQ rule (public Pulsar retry-topic convention).
    """
    if "redelivery_count" not in batch.columns:
        batch = batch.withColumn("redelivery_count", F.lit(0))
    tagged = with_verdict(batch, accept, reschedule)
    tagged = tagged.withColumn(
        "verdict",
        F.when(
            (F.col("verdict") == RESCHEDULE)
            & (F.col("redelivery_count") >= max_redeliveries),
            F.lit(REJECT),
        ).otherwise(F.col("verdict")),
    )
    return tagged.withColumn(
        "not_before",
        F.when(
            F.col("verdict") == RESCHEDULE,
            F.current_timestamp() + F.expr(f"INTERVAL {retry_delay}"),
        ),
    )


def write_verdict_epoch(
    batch: DataFrame,
    epoch_id: int,
    out_dir: str,
    accept: Selector | str,
    reschedule: Selector | str | None = None,
    retry_delay: str = "5 MINUTES",
    max_redeliveries: int = 3,
) -> None:
    """The idempotent per-epoch sink commit behind
    :func:`filtered_sink_pipeline`: dynamic partition overwrite keyed by
    ``epoch_id`` means re-running the same epoch (micro-batch replay after a
    crash) replaces exactly that epoch's output — no duplicates."""
    (
        route_batch(batch, accept, reschedule, retry_delay, max_redeliveries)
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id", "verdict")
        .parquet(out_dir)
    )


def filtered_sink_pipeline(
    stream: DataFrame,
    accept: Selector | str,
    out_dir: str,
    checkpoint_dir: str,
    reschedule: Selector | str | None = None,
    retry_delay: str = "5 MINUTES",
    max_redeliveries: int = 3,
):
    """Verdict routing to sinks (B13 + A5/A6): one ``foreachBatch`` writes
    ACCEPT / REJECT / RESCHEDULE rows to parquet partitioned by verdict —
    a single pass over the micro-batch (no re-read per sink).  With a real
    broker the ACCEPT leg becomes a Pulsar producer and REJECT the DLQ
    topic (``sources.pulsar``); RESCHEDULE rows carry a ``not_before``
    visibility timestamp for the retry-topic pattern (SURVEY §7.4.6).

    Checkpointing gives exactly-once end-to-end: offsets are WAL'd in the
    checkpoint, and the sink commit is idempotent per epoch — each
    micro-batch writes under its own ``epoch_id=N`` partition with dynamic
    partition overwrite, so a replayed epoch (crash after write, before
    checkpoint commit) overwrites exactly its own partitions instead of
    appending duplicates.  Readers treat ``epoch_id`` as an opaque
    bookkeeping partition column (:func:`reingest_due_retries` drops it).
    """

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        write_verdict_epoch(
            batch, epoch_id, out_dir, accept, reschedule, retry_delay, max_redeliveries
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def streaming_dedup_pipeline(
    doc_stream: DataFrame,
    signature_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
):
    """Streaming corpus dedup (E-series × F1/F2): each micro-batch of
    documents is deduped against itself AND every prior batch via the
    persisted signature store, survivors land in an epoch-partitioned
    parquet sink.

    Exactly-once end-to-end despite TWO stateful effects per batch: both
    the survivor write and the signature-store write are epoch-keyed
    dynamic partition overwrites, and the store's history read excludes
    the current epoch (see ``minhash_dedup_incremental(epoch_id=...)``) —
    so a replayed micro-batch reproduces its first attempt bit-for-bit
    instead of deleting its own rows as self-duplicates.
    """
    from pulsar_message_filter_spark.operators.dedup import minhash_dedup_incremental

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        kept = minhash_dedup_incremental(
            batch, signature_dir, text_col, id_col, threshold,
            epoch_id=int(epoch_id),
        )
        (
            kept.withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def reingest_due_retries(spark, out_dir: str, generation: int | None = None) -> DataFrame:
    """The retry-topic consumer leg: RESCHEDULEd rows whose visibility time
    has arrived, redelivery count incremented, ready to union back into
    the source pipeline.

    With a real broker this is a subscription on the retry topic and the
    broker's cursor provides consume-once; in this parquet emulation the
    sink is append-only, so the caller passes the ``generation``
    (redelivery_count value) it is consuming — equivalently, a streaming
    re-ingest would use a file-stream with its own checkpoint as the
    cursor.
    """
    out = spark.read.parquet(out_dir)
    due = out.filter(
        (F.col("verdict") == RESCHEDULE)
        & (F.col("not_before") <= F.current_timestamp())
    )
    if generation is not None:
        due = due.filter(F.col("redelivery_count") == generation)
    return (
        due.drop("verdict", "not_before", "epoch_id")
        .withColumn("redelivery_count", F.col("redelivery_count") + 1)
    )


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """E1+E5: tumbling event-time windows with a watermark bounding state.

    Rows older than ``max(event time seen) - watermark`` are dropped and
    their windows finalized — the late-data rule the tests pin down.
    """
    return (
        stream.withWatermark("ts", watermark)
        # group on the window STRUCT — extracting .start inside groupBy would
        # sever the watermark→aggregate link and break append mode
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# E8 — arbitrary stateful processing (applyInPandasWithState)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = "n long, total double"
_OUT_SCHEMA = "user_id bigint, n_events long, total_value double"


def _update_user_stats(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user counters carried across micro-batches in the state
    store — the RESCHEDULE/rate-limit building block: the same pattern
    tracks per-key redelivery counts or token buckets."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """E8: custom per-key state via ``applyInPandasWithState`` (Arrow-batched).

    State is per-partition in the executor-local state store; only the
    fixed-width output rows cross the wire.  At scale the shuffle is keyed
    by ``user_id`` — the same partitioning every stateful op in the
    pipeline reuses.
    """
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


_THROTTLE_STATE = "tokens double, last_us long"
_THROTTLE_OUT = "user_id bigint, n_passed long, n_throttled long"


def _token_bucket(rate_per_s: float, burst: float):
    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        tokens, last_us = state.get if state.exists else (burst, 0)
        passed = throttled = 0
        for pdf in batches:
            # deterministic arrival order inside the batch
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts_us in pdf["ts_us"]:
                if last_us:
                    tokens = min(burst, tokens + (ts_us - last_us) / 1e6 * rate_per_s)
                last_us = int(ts_us)
                if tokens >= 1.0:
                    tokens -= 1.0
                    passed += 1
                else:
                    throttled += 1
        state.update((float(tokens), int(last_us)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_passed": [passed], "n_throttled": [throttled]}
        )

    return update


def throttle_stateful(
    stream: DataFrame, rate_per_s: float = 1.0, burst: float = 5.0
) -> DataFrame:
    """Per-key token-bucket rate limiter carried across micro-batches (E8).

    Event-time driven: refill is computed from the event timestamps
    themselves (``ts_us``), so replaying the same stream yields the same
    verdict counts — wall-clock-driven buckets would not be replay-safe.
    Expects columns ``user_id``, ``ts_us`` (int64 µs), ``event_id``.
    The batch/exact windowed twin is
    :func:`operators.throttle.throttle_per_key_window`."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _token_bucket(rate_per_s, burst),
        outputStructType=_THROTTLE_OUT,
        stateStructType=_THROTTLE_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def redelivery_counter_tws(stream: DataFrame) -> DataFrame:
    """E8 on the Spark 4 ``transformWithStateInPandas`` API: per-user
    redelivery counter — the state primitive behind RESCHEDULE bookkeeping
    (how many times has this key been re-enqueued?).

    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` Python package (the TWS state-server protocol).  No
    protobuf wheel is installed in this container, but the test suite
    shims the container's own pure-Python copy onto the worker path
    (``tests/_pb_shim/sitecustomize.py``), so this path IS exercised
    end-to-end here; ``applyInPandasWithState``
    (:func:`stateful_user_stats`) remains the protobuf-free twin.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "(Spark's TWS state-server protocol); use stateful_user_stats "
            "(applyInPandasWithState) where protobuf is unavailable"
        ) from e
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RedeliveryCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("n_seen", "n BIGINT")

        def handleInputRows(
            self, key, rows: _Iterator[pd.DataFrame], timer_values
        ) -> _Iterator[pd.DataFrame]:
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_seen": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RedeliveryCounter(),
        outputStructType="user_id bigint, n_seen bigint",
        outputMode="Update",
        timeMode="None",
    )


def session_ttl_tws(
    stream: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """E8 timer surface: event-time TTL session expiry on
    ``transformWithStateInPandas`` registered timers.

    Per user, a session accumulates (n_events, start, last); every arrival
    re-arms ONE event-time timer at ``last + gap_ms`` (the previous timer
    is deleted — ``listTimers``/``deleteTimer``).  Nothing is emitted on
    input; when the watermark passes the armed expiry,
    ``handleExpiredTimer`` fires, emits the closed session, and EVICTS the
    key's state — bounded state by construction, the streaming form of E3's
    ``session_window`` (which is the batch-equivalence twin, pinned in
    ``tests/test_streaming.py``).

    Requires the RocksDB state-store provider and the protobuf package
    (shimmed in tests via ``tests/_pb_shim``); expects columns ``user_id``
    and ``ts`` (timestamp).  Scale shape: state is one fixed-width row +
    one timer per LIVE key, keyed on the same ``user_id`` shuffle as every
    stateful op here; expired keys leave nothing behind.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "(Spark's TWS state-server protocol); use the batch "
            "session_window twin where protobuf is unavailable"
        ) from e
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class SessionTTL(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "n BIGINT, start_ms BIGINT, last_ms BIGINT"
            )

        def handleInputRows(
            self, key, rows: _Iterator[pd.DataFrame], timerValues
        ) -> _Iterator[pd.DataFrame]:
            if self._sess.exists():
                n, start_ms, last_ms = self._sess.get()
            else:
                n, start_ms, last_ms = 0, None, None
            for pdf in rows:
                ms = pdf["ts"].astype("int64") // 1_000_000
                n += len(pdf)
                lo, hi = int(ms.min()), int(ms.max())
                start_ms = lo if start_ms is None else min(start_ms, lo)
                last_ms = hi if last_ms is None else max(last_ms, hi)
            # one live timer per key: re-arm at last event + gap
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + gap_ms)
            self._sess.update((n, start_ms, last_ms))
            return iter(())

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> _Iterator[pd.DataFrame]:
            if self._sess.exists():
                n, start_ms, last_ms = self._sess.get()
                self._sess.clear()  # eviction: closed sessions hold no state
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "session_start_ms": [start_ms],
                        "session_end_ms": [last_ms],
                        "n_events": [n],
                    }
                )

        def close(self) -> None:
            pass

    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTTL(),
            outputStructType="user_id bigint, session_start_ms bigint, "
            "session_end_ms bigint, n_events bigint",
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def session_ttl_batch(df: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Batch-equivalence twin of :func:`session_ttl_tws` — SAME gap default,
    SAME emit schema ``(user_id, session_start_ms, session_end_ms,
    n_events)`` where end is the LAST EVENT time (not last + gap).

    One definition serves three consumers so the semantics can't drift:
    the streaming op's batch-equivalence pytest, the graded driver query
    ``session_ttl_batch_twin`` (hash-checked against a gaps-and-islands
    oracle), and any batch backfill of the streaming job.  Scale shape:
    ``session_window`` is one shuffle on ``user_id`` + an in-partition
    merge — identical keying to the TWS state op it mirrors.
    """
    return (
        df.groupBy(F.session_window("ts", f"{gap_ms // 1000} seconds"), "user_id")
        .agg(
            F.min(F.unix_millis("ts")).alias("session_start_ms"),
            F.max(F.unix_millis("ts")).alias("session_end_ms"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
    )


def idle_key_eviction_tws(stream: DataFrame, idle_ms: int = 0) -> DataFrame:
    """E8 timer surface, PROCESSING-time mode: per-key running count with
    idle-key eviction by wall clock — the cache-expiry twin of
    :func:`session_ttl_tws`'s event-time sessions.

    Every arrival re-arms one timer at ``now + idle_ms``
    (``timerValues.getCurrentProcessingTimeInMs``); when a later
    micro-batch runs past the expiry the key's state is evicted and a
    tombstone row (``evicted=true``, final count) is emitted.  Counts are
    deterministic; eviction TIMING is inherently wall-clock (that is the
    point of processing-time mode) — tests drive it with ``idle_ms=0`` so
    the very next micro-batch fires the timer.  State is one fixed-width
    row + one timer per live key; idle keys leave nothing behind.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "(Spark's TWS state-server protocol)"
        ) from e
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class IdleEvict(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(
            self, key, rows: _Iterator[pd.DataFrame], timerValues
        ) -> _Iterator[pd.DataFrame]:
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + idle_ms
            )
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_seen": [n], "evicted": [False]}
            )

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> _Iterator[pd.DataFrame]:
            if self._n.exists():
                n = self._n.get()[0]
                self._n.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_seen": [n], "evicted": [True]}
                )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=IdleEvict(),
        outputStructType="user_id bigint, n_seen bigint, evicted boolean",
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def user_profile_tws(stream: DataFrame, keep_last: int = 3) -> DataFrame:
    """E8 composite-state surface: MapState + ListState in one processor.

    Per user the processor maintains (a) a MapState ``event_type → count``
    (the per-key sub-keyed aggregate a plain value state can't express
    without serializing the whole map every update — MapState updates are
    per-sub-key in the state store) and (b) a ListState of the last
    ``keep_last`` event values (bounded recent-history buffer: append,
    then rewrite only when trimming).  Emits one profile row per key per
    micro-batch: distinct types seen, modal type (count desc, name asc),
    total events, and the recent values as a CSV string.

    With :func:`redelivery_counter_tws` (value state),
    :func:`session_ttl_tws` (event-time timers) and
    :func:`idle_key_eviction_tws` (processing-time timers) this pins the
    complete Spark-4 TWS state API under the container's protobuf shim.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "(Spark's TWS state-server protocol)"
        ) from e
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("type_counts", "t string", "c BIGINT")
            self._recent = handle.getListState("recent_values", "v double")

        def handleInputRows(
            self, key, rows: _Iterator[pd.DataFrame], timerValues
        ) -> _Iterator[pd.DataFrame]:
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])  # arrival order
            for t, n in batch.groupby("event_type", sort=False).size().items():
                prev = (
                    self._counts.getValue((t,))[0]
                    if self._counts.containsKey((t,))
                    else 0
                )
                self._counts.updateValue((t,), (prev + int(n),))
            self._recent.appendList(
                [(float(v),) for v in batch["value"].tail(keep_last)]
            )
            vals = [v[0] for v in self._recent.get()]
            if len(vals) > keep_last:
                vals = vals[-keep_last:]
                self._recent.clear()
                self._recent.put([(v,) for v in vals])
            counts = {k[0]: self._counts.getValue(k)[0] for k in self._counts.keys()}
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            # recent values as integer CENTS joined by ':'.  The rounding
            # must be HALF-UP to match the batch twin's F.round and the
            # DuckDB oracle's round() — Python's built-in round() is
            # banker's (half-to-even) and diverges on exact .5 cents
            # (e.g. 0.125 -> 12 vs 13; ADVICE r08).
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_types": [len(counts)],
                    "top_type": [top],
                    "n_events": [sum(counts.values())],
                    "recent_csv": [
                        ":".join(str(_cents_half_up(v)) for v in vals)
                    ],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfile(),
        outputStructType="user_id bigint, n_types int, top_type string, "
        "n_events bigint, recent_csv string",
        outputMode="Update",
        timeMode="None",
    )


def user_profile_batch(df: DataFrame, keep_last: int = 3) -> DataFrame:
    """Batch-equivalence twin of :func:`user_profile_tws` — the final
    MapState/ListState contents computed relationally: per user the
    distinct-type count, modal type (count desc, name asc — the exact
    tiebreak the processor applies), total events, and the last
    ``keep_last`` values in arrival order (ts, event_id) as the same
    cents-CSV string the streaming op emits.

    One definition serves the TWS pytest binding AND the graded driver
    query ``user_profile_batch_twin``.  Scale shape: two aggregations on
    the same ``user_id`` key (type counts, recent buffer) — the recent
    buffer is bounded by construction (``slice`` keeps ``keep_last``
    elements per key, the ListState trim made relational).
    """
    from pyspark.sql import Window

    type_counts = df.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    w_modal = Window.partitionBy("user_id").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    counts = (
        type_counts.withColumn("rk", F.row_number().over(w_modal))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("int").alias("n_types"),
            F.sum("c").alias("n_events"),
            # modal type with the processor's exact tiebreak (count desc,
            # name asc): only the rk=1 row is non-null under the max
            F.max(F.when(F.col("rk") == 1, F.col("event_type"))).alias(
                "top_type"
            ),
        )
    )
    # prune to the last keep_last rows per key BEFORE collecting — a bare
    # collect_list-then-slice would buffer a hot key's ENTIRE history in
    # the aggregation state at 100 TB; after the row_number filter the
    # collected array is ≤ keep_last elements per key by construction
    w_recent = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("eid")
    )
    recent = (
        df.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").alias("eid"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w_recent))
        .filter(F.col("rn") <= keep_last)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts_us", "eid", "cents"))
                    ),
                    lambda x: x["cents"].cast("string"),
                ),
                ":",
            ).alias("recent_csv")
        )
    )
    return counts.join(recent, "user_id").select(
        "user_id", "n_types", "top_type", "n_events", "recent_csv"
    )


def redelivery_counter_batch(df: DataFrame, epochs: int = 3) -> DataFrame:
    """Batch-equivalence twin of :func:`redelivery_counter_tws`'s
    update-mode emission: splitting the table into ``epochs`` deterministic
    micro-batches (``event_id % epochs``), the op emits one row per
    (user, epoch-with-arrivals) carrying the RUNNING count — a grouped
    count plus a cumulative window, never a per-event state row."""
    from pyspark.sql import Window

    per_epoch = (
        df.withColumn("epoch_id", F.col("event_id") % epochs)
        .groupBy("user_id", "epoch_id")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_epoch.select(
        "user_id", "epoch_id", F.sum("c").over(w).alias("n_seen")
    )


def ttl_counter_tws(stream: DataFrame, ttl_ms: int) -> DataFrame:
    """E8 state-TTL surface: a per-key counter whose VALUE STATE carries a
    declarative ``ttlDurationMs`` — the store evicts it by wall clock with
    no timer code at all (the third expiry mechanism next to
    :func:`session_ttl_tws`'s event-time timers and
    :func:`idle_key_eviction_tws`'s processing-time timers).

    TTL state requires ``timeMode="ProcessingTime"``.  A key silent past
    its TTL restarts from zero on its next arrival — the standard
    bounded-state discipline for per-key caches (rate-limit counters,
    enrichment caches) where explicit timer bookkeeping isn't worth it.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' python package "
            "(Spark's TWS state-server protocol)"
        ) from e
    from typing import Iterator as _Iterator

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class TTLCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n BIGINT", ttlDurationMs=ttl_ms)

        def handleInputRows(
            self, key, rows: _Iterator[pd.DataFrame], timerValues
        ) -> _Iterator[pd.DataFrame]:
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_seen": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TTLCounter(),
        outputStructType="user_id bigint, n_seen bigint",
        outputMode="Update",
        timeMode="ProcessingTime",
    )


def bloom_dedup_pipeline(
    doc_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int | None = None,
    k: int | None = None,
):
    """Streaming EXACT dedup against all history via a persisted Bloom
    filter (E-series × F1/F14): survivors of each micro-batch land in an
    epoch-partitioned sink, and the filter itself is maintained as stored
    per-epoch word contributions.

    Unlike :func:`streaming_dedup_pipeline` (MinHash store, near-dup),
    history membership here never rescans historical *documents*: each
    batch OR-reduces the stored word tables (≤ epochs × m/64 tiny rows)
    to rebuild the filter, map-side drops definite-new rows, and only
    Bloom-positive candidates touch the key store — read with a broadcast
    semi-join on the candidate hashes (bucket the store by hash on a real
    deployment).  Bloom false positives are resolved by that exact
    confirm, so output semantics are exactly "first occurrence wins".

    Exactly-once: all three writes (survivors, keys, words) are
    epoch-keyed dynamic partition overwrites, and every read excludes the
    current epoch — a replayed micro-batch reproduces its first attempt.
    """
    import os

    from pulsar_message_filter_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_NUM_BITS,
        bloom_maybe_contains,
        bloom_word_contributions,
        canonical_text,
        dedup_exact,
        words_to_filter,
    )

    m = num_bits or BLOOM_NUM_BITS
    kk = k or BLOOM_K

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        e = int(epoch_id)
        canon = canonical_text(F.col(text_col))
        batch_d = dedup_exact(batch, text_col, id_col).withColumn(
            "__h", F.xxhash64(canon)
        )

        words_dir = os.path.join(store_dir, "words")
        keys_dir = os.path.join(store_dir, "keys")
        try:
            hist_words = (
                spark.read.parquet(words_dir)
                .filter(F.col("epoch_id") < e)
                .groupBy("word_idx")
                .agg(F.bit_or("word").alias("word"))
                .collect()
            )
        except AnalysisException:  # path not yet created (first epoch)
            hist_words = []

        if hist_words:
            maybe = bloom_maybe_contains(words_to_filter(hist_words, m), m, kk)
            flagged = batch_d.withColumn("__maybe", maybe(F.col("__h")))
            definite = flagged.filter(~F.col("__maybe"))
            cands = flagged.filter(F.col("__maybe"))
            hist_keys = (
                spark.read.parquet(keys_dir)
                .filter(F.col("epoch_id") < e)
                .join(F.broadcast(cands.select("__h").distinct()), "__h")
                .select("__canon")
                .distinct()
            )
            confirmed = cands.withColumn("__canon", canon).join(
                hist_keys, "__canon", "left_anti"
            )
            kept = definite.drop("__maybe").unionByName(
                confirmed.drop("__maybe", "__canon")
            )
        else:
            kept = batch_d

        def epoch_write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("epoch_id", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(path)
            )

        kept = kept.localCheckpoint(eager=True)  # one compute, three writes
        epoch_write(kept.drop("__h"), out_dir)
        epoch_write(
            kept.select("__h", canon.alias("__canon")).distinct(), keys_dir
        )
        epoch_write(bloom_word_contributions(kept, "__h", m, kk), words_dir)

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def survivor_pick_pipeline(
    doc_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
):
    """Streaming NEAR-dup removal via the f33 survivor pick (E-series ×
    F2/F33): per micro-batch, docs sharing a token span with an already-
    kept document are dropped (history wins — kept docs are immutable),
    and within the batch the quality-domination rule of
    :func:`~pulsar_message_filter_spark.operators.ngrams.survivor_pick`
    keeps only undominated docs.  Survivors and their spans land in
    epoch-keyed dynamic partition overwrites, so a replayed micro-batch
    reproduces its first attempt (exactly-once, same discipline as
    :func:`bloom_dedup_pipeline`).

    The history probe is an equi-join on the span string against the
    stored kept-span table — never a rescan of historical documents.  At
    100 TB the span store is bucketed by span hash so the probe is a
    co-located join; a Bloom prefilter over span hashes (exactly the
    :func:`bloom_dedup_pipeline` word-table trick) can drop
    definitely-new spans map-side before the store is touched.
    """
    import os

    from pulsar_message_filter_spark.operators.ngrams import (
        SPAN_WIDTH,
        survivor_pick,
        token_ngrams,
    )

    spans_dir = os.path.join(store_dir, "spans")

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        e = int(epoch_id)
        batch = batch.localCheckpoint(eager=True)
        spans = batch.select(
            F.col(id_col),
            F.explode(token_ngrams(F.col(text_col), SPAN_WIDTH)).alias("span"),
        )

        try:
            hist_spans = (
                spark.read.parquet(spans_dir)
                .filter(F.col("epoch_id") < e)
                .select("span")
            )
        except AnalysisException:  # path not yet created (first epoch)
            hist_spans = None

        if hist_spans is not None:
            dup_of_hist = (
                spans.join(hist_spans, "span", "left_semi").select(id_col).distinct()
            )
            fresh = batch.join(dup_of_hist, id_col, "left_anti")
            fresh_spans = spans.join(dup_of_hist, id_col, "left_anti")
        else:
            fresh, fresh_spans = batch, spans

        a, b = fresh_spans.alias("a"), fresh_spans.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.span") == F.col("b.span"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .distinct()
        )
        verdicts = survivor_pick(pairs, fresh.select(id_col, quality_col), id_col, quality_col)
        dominated = verdicts.filter(F.col("kept") == 0).select(id_col)
        kept = fresh.join(dominated, id_col, "left_anti").localCheckpoint(eager=True)

        def epoch_write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("epoch_id", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(path)
            )

        epoch_write(kept, out_dir)
        epoch_write(
            kept.select(
                F.col(id_col),
                F.explode(token_ngrams(F.col(text_col), SPAN_WIDTH)).alias("span"),
            ).select("span").distinct(),
            spans_dir,
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def ivm_view_pipeline(
    change_stream: DataFrame,
    view_dir: str,
    checkpoint_dir: str,
    group_col: str = "o_custkey",
):
    """Streaming incremental view maintenance (E-series × C11/F14): a
    materialized per-group COUNT/SUM view kept current by applying each
    micro-batch's aggregate deltas — never recomputing from history.

    The change stream carries ``(group_col, dn, dcents)`` rows (inserts
    ``+1/+cents``, deletes ``−1/−cents``, updates ``0/new−old``; see
    :func:`~pulsar_message_filter_spark.operators.cdc.agg_delta`).  Each
    epoch writes the UPDATED view as an epoch-keyed partition — the read
    side takes the max epoch, so a replayed micro-batch overwrites its
    own partition and converges to the same state (exactly-once by
    idempotent overwrite, same discipline as :func:`bloom_dedup_pipeline`).

    A one-row-per-epoch manifest records every processed epoch, because a
    dynamic partition overwrite of an EMPTY view writes no files: without
    the manifest, an epoch that empties the view would be invisible to
    the next epoch's max-epoch lookup and its deltas silently lost.  Only
    a missing path reads as "no prior state" (``AnalysisException``);
    any other storage failure propagates and fails the micro-batch so
    the checkpoint retries it — never silently resetting the view.

    Scale: per-batch work is (touched groups) — bounded by batch size,
    never view size; the merge is a keyed full-outer join, shuffled on
    the group key.  On a real deployment the view store is a keyed table
    (Delta/Iceberg MERGE or a bucketed parquet) so the join co-locates.
    """
    import os

    from pulsar_message_filter_spark.operators.cdc import agg_delta, apply_agg_delta

    state_dir = os.path.join(view_dir, "state")
    manifest_dir = os.path.join(view_dir, "manifest")
    empty_schema = f"{group_col} long, n_orders long, total_cents long"

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        e = int(epoch_id)
        delta = agg_delta(batch, group_col)
        try:
            max_e = (
                spark.read.parquet(manifest_dir)
                .filter(F.col("epoch_id") < e)
                .agg(F.max("epoch_id"))
                .collect()[0][0]
            )
        except AnalysisException:
            max_e = None
        if max_e is None:
            base = spark.createDataFrame([], empty_schema)
        else:
            try:
                base = (
                    spark.read.parquet(state_dir)
                    .filter(F.col("epoch_id") == max_e)
                    .drop("epoch_id")
                )
            except AnalysisException:
                # every prior epoch's view was empty → no state files exist
                base = spark.createDataFrame([], empty_schema)
        updated = apply_agg_delta(base, delta, group_col).localCheckpoint(eager=True)
        (
            updated.withColumn("epoch_id", F.lit(e))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(state_dir)
        )
        (
            updated.agg(F.count("*").alias("n_groups"))
            .withColumn("epoch_id", F.lit(e))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(manifest_dir)
        )

    return (
        change_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def sketch_rollup_pipeline(
    event_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
):
    """Streaming sketch rollups (E-series × C12/F14): each micro-batch
    appends its own tiny CMS cell table and HLL register table as
    epoch-keyed partitions; readers merge on read — SUM over CMS cells,
    MAX over HLL registers — to answer "events per key" and "distinct
    keys" over ANY epoch range without touching raw events again.

    This is the monitoring-rollup shape at 100 TB: per-epoch state is
    bounded (≤ depth×width + m rows) no matter the batch size, the store
    grows linearly in EPOCHS not events, and merge-on-read is a grouped
    aggregation over a few thousand tiny rows.  Exactly-once by the same
    epoch-keyed dynamic overwrite discipline as every sink in this
    module: a replayed micro-batch rewrites its own partitions
    bit-for-bit (the sketch builds are deterministic — literal hash
    families, no RNG).
    """
    import os

    from pulsar_message_filter_spark.operators.sketch import cms_build, hll_registers

    cms_dir = os.path.join(store_dir, "cms")
    hll_dir = os.path.join(store_dir, "hll")

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)

        def epoch_write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("epoch_id", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(path)
            )

        batch = batch.localCheckpoint(eager=True)  # one compute, two sketches
        epoch_write(cms_build(batch, key_col), cms_dir)
        epoch_write(hll_registers(batch, key_col), hll_dir)

    return (
        event_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def read_sketch_rollup(spark, store_dir: str, epochs=None):
    """Merge-on-read over the sketch store: returns ``(cms_cells,
    hll_registers)`` DataFrames merged across the selected epochs (all
    epochs when ``epochs`` is None) — pass the results to
    ``operators.sketch.cms_estimate`` / the HLL estimate formula.

    Consistency: only epochs present in BOTH stores are read, so a crash
    between the CMS write and the HLL write of the same epoch (the
    replay will redo it) can never make the two sketches answer over
    different data.  Before any epoch has committed, both frames are
    empty with the right schema instead of raising PATH_NOT_FOUND.

    Store age: at thousands of epochs the read cost is FILE-COUNT-bound,
    not merge-bound (tools/rollup_epoch_probe.py: 7.6 s at 1,000
    one-file epoch partitions vs 1.2 s for the same rows compacted —
    SCALING.md round-19).  ``streaming.compaction.compact_parquet`` on
    each half restores the floor: ``epoch_id`` demotes from a partition
    directory to a data column, which this reader (incl. the
    consistency semi-join and the ``epochs=`` filter) handles
    identically.  Compact only CLOSED stores — a later epoch-partitioned
    write into a compacted (flat-file) directory would mix layouts and
    make ``epoch_id`` ambiguous to partition discovery."""
    import os

    try:
        cms = spark.read.parquet(os.path.join(store_dir, "cms"))
        hll = spark.read.parquet(os.path.join(store_dir, "hll"))
    except AnalysisException:
        return (
            spark.createDataFrame([], "row int, cell bigint, cnt bigint"),
            spark.createDataFrame([], "register bigint, max_rho bigint"),
        )
    committed = (
        cms.select("epoch_id")
        .distinct()
        .join(hll.select("epoch_id").distinct(), "epoch_id", "left_semi")
    )
    cms = cms.join(committed, "epoch_id", "left_semi")
    hll = hll.join(committed, "epoch_id", "left_semi")
    if epochs is not None:
        cms = cms.filter(F.col("epoch_id").isin(list(epochs)))
        hll = hll.filter(F.col("epoch_id").isin(list(epochs)))
    merged_cms = cms.groupBy("row", "cell").agg(F.sum("cnt").alias("cnt"))
    merged_hll = hll.groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    return merged_cms, merged_hll


# ---------------------------------------------------------------------------
# Streaming drift monitor — windowed PSI against a static reference
# ---------------------------------------------------------------------------


def _psi_bin(value_col: str, width: float, n_bins: int):
    """Fixed-width bin id with tail clamp — the SAME binning as the batch
    ``operators.drift.psi_profile`` so streaming and batch monitors agree."""
    return F.least(
        F.floor(F.col(value_col) / F.lit(width)), F.lit(n_bins - 1)
    ).cast("int")


def reference_histogram(
    df: DataFrame, value_col: str = "value", width: float = 25.0, n_bins: int = 20
) -> DataFrame:
    """(bin, n_ref) over ALL bins (zero-filled spine) from a batch frame —
    the frozen training-time distribution a streaming monitor compares
    against.  Tiny by construction (n_bins rows): broadcast-joined into
    every finalization epoch."""
    counts = (
        df.select(_psi_bin(value_col, width, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_ref"))
    )
    spine = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return spine.join(counts, "bin", "left").select(
        "bin", F.coalesce("n_ref", F.lit(0)).alias("n_ref")
    )


def windowed_bin_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    width: float = 25.0,
    n_bins: int = 20,
) -> DataFrame:
    """Stateful windowed histogram: (window, bin) counts, append-mode
    finalized once the watermark closes each window.  State per key is one
    int64 — bounded by windows-in-flight × n_bins regardless of row rate."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), _psi_bin("value", width, n_bins).alias("bin"))
        .agg(F.count("*").alias("n_cur"))
    )


def psi_finalize(
    closed: DataFrame, reference: DataFrame, n_bins: int = 20
) -> DataFrame:
    """Batch finalization of closed windows: Laplace-smoothed proportions
    against the (broadcast) reference histogram, one PSI row per window.
    Runs inside ``foreachBatch`` — each appended window arrives exactly
    once, so the output table is append-only and idempotent per epoch."""
    windows = closed.select(
        F.col("window.start").alias("window_start")
    ).distinct()
    spine = windows.crossJoin(F.broadcast(reference))
    counts = closed.select(
        F.col("window.start").alias("window_start"), "bin", "n_cur"
    )
    totals_ref = reference.agg(F.sum("n_ref").alias("ref_total"))
    filled = (
        spine.join(counts, ["window_start", "bin"], "left")
        .select(
            "window_start",
            "bin",
            "n_ref",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    cur_totals = filled.groupBy("window_start").agg(F.sum("n_cur").alias("cur_total"))
    joined = filled.join(F.broadcast(cur_totals), "window_start").crossJoin(
        F.broadcast(totals_ref)
    )
    p_ref = (F.col("n_ref") + 1.0) / (F.col("ref_total") + F.lit(float(n_bins)))
    p_cur = (F.col("n_cur") + 1.0) / (F.col("cur_total") + F.lit(float(n_bins)))
    return (
        joined.select(
            "window_start",
            "cur_total",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("term"),
        )
        .groupBy("window_start", "cur_total")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


def psi_monitor_pipeline(
    stream: DataFrame,
    reference: DataFrame,
    out_dir: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    width: float = 25.0,
    n_bins: int = 20,
):
    """End-to-end streaming drift monitor: watermark → stateful windowed
    histogram (append mode) → per-epoch PSI finalization vs the frozen
    reference → parquet alarm log.  The stateful stage keeps only
    (window × bin) int64 counts; the finalization epoch is a few dozen
    rows joined to a broadcast 20-row reference — drift monitoring at
    100 TB stream rates costs the histogram, not the data."""
    ref = reference.coalesce(1).cache()
    ref.count()

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        out = psi_finalize(batch, ref, n_bins=n_bins)
        out.write.mode("append").parquet(out_dir)

    counts = windowed_bin_counts(
        stream, window=window, watermark=watermark, width=width, n_bins=n_bins
    )
    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .start()
    )


def winnowing_dedup_pipeline(
    doc_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 3,
):
    """Streaming PARTIAL-overlap dedup via winnowing fingerprints (E-series
    × F57): a document is dropped when it shares ≥ ``min_shared``
    fingerprints with any already-kept document (history wins) or with a
    lower-id document in its own micro-batch.  The complement of
    :func:`survivor_pick_pipeline`'s span equality: winnowing's window-min
    selection detects a shared run of ≥ w+k-1 tokens while storing only
    ~2/(w+1) of positions — the cheaper store for long-document overlap.

    Replay safety mirrors the other store pipelines: survivors and their
    fingerprints land in epoch-keyed dynamic partition overwrites and the
    history read excludes the current epoch, so a replayed micro-batch
    reproduces its first attempt.

    Scale: the history probe is an equi-join on the fingerprint value
    (content-bucketed, same class as the MinHash band join); per-pair
    overlap counts are a (doc, hist_doc)-keyed aggregation of join hits,
    never a document rescan.
    """
    import os

    from pulsar_message_filter_spark.operators.dedup import winnowing_fingerprints

    fp_dir = os.path.join(store_dir, "winnow_fp")

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        e = int(epoch_id)
        batch = batch.localCheckpoint(eager=True)
        # one compute, four consumers (hist join, both self-join sides,
        # store write) — checkpoint like bloom_dedup_pipeline does
        fps = winnowing_fingerprints(batch, text_col, id_col).localCheckpoint(
            eager=True
        )

        try:
            hist = (
                spark.read.parquet(fp_dir)
                .filter(F.col("epoch_id") != e)
                .select(F.col("doc").alias("hist_doc"), "fp")
            )
        except AnalysisException:  # first epoch: no store yet
            hist = None

        if hist is not None:
            # per historical DOCUMENT, matching the in-batch per-pair rule:
            # a newcomer drops only when some single kept doc shares
            # >= min_shared fingerprints with it (pooling fingerprints
            # across different kept docs would over-drop — review r04)
            hist_hits = (
                fps.join(hist, "fp")
                .groupBy("doc", "hist_doc")
                .agg(F.count("*").alias("n_shared"))
                .filter(F.col("n_shared") >= min_shared)
                .select("doc")
                .distinct()
            )
        else:
            hist_hits = None

        a = fps.select(F.col("doc").alias("doc_a"), "fp")
        b = fps.select(F.col("doc").alias("doc_b"), "fp")
        in_batch_dups = (
            a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .select(F.col("doc_b").alias("doc"))
            .distinct()
        )
        drops = (
            in_batch_dups
            if hist_hits is None
            else in_batch_dups.unionByName(hist_hits).distinct()
        )
        kept = (
            batch.join(drops, F.col(id_col) == F.col("doc"), "left_anti")
            .localCheckpoint(eager=True)
        )

        def epoch_write(df: DataFrame, path: str) -> None:
            (
                df.withColumn("epoch_id", F.lit(e))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(path)
            )

        epoch_write(kept, out_dir)
        kept_ids = kept.select(F.col(id_col).alias("doc"))
        epoch_write(fps.join(kept_ids, "doc"), fp_dir)

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def kll_epoch_summary(
    batch: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """One micro-batch's KLL state: one serialized KLL-lite sketch row per
    key (partition-local build, then the tiny per-key rows merge on read).
    Shared by :func:`kll_rollup_pipeline` and the graded read-path query
    ``stream_kll_rollup_readpath`` so both exercise identical build code."""
    from pulsar_message_filter_spark.operators.sketch import KLLLite

    def build(batches):
        acc: dict = {}
        for pdf in batches:
            for g, vals in pdf.groupby(key_col, sort=False)[value_col]:
                acc.setdefault(g, KLLLite()).update_many(vals.to_numpy())
        if acc:
            yield pd.DataFrame(
                {
                    key_col: list(acc),
                    "sketch": [s.dumps() for s in acc.values()],
                }
            )

    # Derive the key type from the input schema (a hardcoded 'string' would
    # silently coerce or fail the Arrow exchange for numeric keys — the same
    # bug class fixed in sketch.kll_group_quantiles).
    gtype = batch.schema[key_col].dataType.simpleString()
    return batch.select(key_col, value_col).mapInPandas(
        build, schema=f"{key_col} {gtype}, sketch string"
    )


def kll_rollup_pipeline(
    event_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Streaming percentiles as mergeable state (E-series × C14/F14): each
    micro-batch appends one serialized KLL-lite sketch row per key as an
    epoch-keyed partition; readers merge ladders across any epoch range
    to answer quantile queries without re-reading raw events — the
    quantile twin of :func:`sketch_rollup_pipeline`'s CMS/HLL rollups.

    Per-epoch state is O(keys × k·log n) floats no matter the batch size;
    the store grows in EPOCHS, not events.  Exactly-once by the same
    epoch-keyed dynamic-overwrite discipline: the sketch build is
    deterministic (alternating-offset compaction, no RNG), so a replayed
    micro-batch rewrites its partition bit-for-bit.
    """
    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        (
            kll_epoch_summary(batch, key_col, value_col)
            .withColumn("epoch_id", F.lit(e))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(store_dir)
        )

    return (
        event_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def read_kll_rollup(spark, store_dir: str, ps=(0.25, 0.5, 0.75, 0.9), epochs=None):
    """Merge-on-read over the KLL store: one merged quantile row set per
    key across the selected epochs (all when ``epochs`` is None).  The
    ladder merge runs per key inside ``applyInPandas`` over a few sketch
    rows — never over raw events."""
    from pulsar_message_filter_spark.operators.sketch import KLLLite

    df = spark.read.parquet(store_dir)
    if epochs is not None:
        df = df.filter(F.col("epoch_id").isin(list(epochs)))
    key_col = [c for c in df.columns if c not in ("sketch", "epoch_id")][0]
    ps = [float(p) for p in ps]

    def merge(pdf):
        sk = KLLLite()
        for s in pdf["sketch"]:
            sk.merge(KLLLite.loads(s))
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "p": ps,
                "est_value": [float(sk.quantile(p)) for p in ps],
                "sketch_n": sk.n,
            }
        )

    gtype = df.schema[key_col].dataType.simpleString()
    return df.groupBy(key_col).applyInPandas(
        merge, schema=f"{key_col} {gtype}, p double, est_value double, sketch_n long"
    )


def mg_epoch_summary(batch: DataFrame, key_col: str, k: int = 16) -> DataFrame:
    """One micro-batch's Misra-Gries summary: ``(key, w)`` with ≤ k rows —
    counts per key, subtract the (k+1)-th largest, keep positives (the
    one-pass rank+threshold window, same shape as
    ``operators.sketch.sketch_misra_gries``).  Shared by
    :func:`mg_rollup_pipeline` and the graded read-path query
    ``stream_mg_rollup_readpath`` so both exercise identical compression."""
    from pyspark.sql import Window

    counts = batch.groupBy(key_col).agg(F.count("*").alias("c"))
    w_rank = Window.orderBy(F.desc("c"), F.asc(key_col))
    w_all = Window.partitionBy()
    return (
        counts.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "t",
            F.coalesce(
                F.max(F.when(F.col("rk") == k + 1, F.col("c"))).over(w_all),
                F.lit(0),
            ),
        )
        .filter((F.col("rk") <= k) & (F.col("c") - F.col("t") > 0))
        .select(key_col, (F.col("c") - F.col("t")).alias("w"))
    )


def mg_rollup_pipeline(
    event_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    k: int = 16,
):
    """Streaming heavy hitters as mergeable state: each micro-batch writes
    its Misra-Gries-compressed counter set (<= k rows) as an epoch-keyed
    partition — the frequent-items member of the rollup family next to
    CMS/HLL (:func:`sketch_rollup_pipeline`) and KLL
    (:func:`kll_rollup_pipeline`).

    Compression is the relational one-pass rank+threshold window (same
    shape as ``operators.sketch.sketch_misra_gries``): counts per key,
    subtract the (k+1)-th largest, keep positives.  Deterministic — a
    replayed micro-batch rewrites its partition bit-for-bit.
    """
    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        e = int(epoch_id)
        summary = mg_epoch_summary(batch, key_col, k).withColumn(
            "epoch_id", F.lit(e)
        )
        (
            summary.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(store_dir)
        )

    return (
        event_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def read_mg_rollup(spark, store_dir: str, k: int = 16):
    """Merge-on-read over the MG store: counter-sum per key across all
    epochs, then one final compress to k — the mergeable-MG theorem keeps
    total undercount <= n/(k+1) regardless of how many epochs merged."""
    from pyspark.sql import Window

    df = spark.read.parquet(store_dir)
    key_col = [c for c in df.columns if c not in ("w", "epoch_id")][0]
    merged = df.groupBy(key_col).agg(F.sum("w").alias("w"))
    w_rank = Window.orderBy(F.desc("w"), F.asc(key_col))
    w_all = Window.partitionBy()
    return (
        merged.withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "t",
            F.coalesce(
                F.max(F.when(F.col("rk") == k + 1, F.col("w"))).over(w_all),
                F.lit(0),
            ),
        )
        .filter((F.col("rk") <= k) & (F.col("w") - F.col("t") > 0))
        .select(key_col, (F.col("w") - F.col("t")).alias("est_count"))
    )
