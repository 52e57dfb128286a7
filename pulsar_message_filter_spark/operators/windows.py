"""E-series graded queries — event-time windowing, batch-graded (SURVEY §2.E).

Spark's unified model means the *same expressions* run under ``readStream``;
the batch oracle check validates the windowing logic, while the
streaming-only machinery (watermarks, state stores, triggers, resume) is
exercised by the tests in ``tests/test_streaming.py`` over deterministic
file-stream input (SURVEY §5.3.3).

Timestamp parity: all comparisons/outputs use epoch-microseconds or
formatted strings; the oracle truncates its native nanosecond timestamps
identically via ``epoch_us`` (FIXTURES.md quirk 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------------
# E1 — tumbling window aggregate
# ---------------------------------------------------------------------------


@graded(
    "window_tumbling",
    oracle=f"""
        SELECT strftime(date_trunc('day', ts), '{_DUCK_FMT}') AS window_start,
               event_type,
               count(*) AS n,
               (sum({cents_sql('value')}) / count(*)) / 100 AS avg_value
        FROM events GROUP BY 1, 2
    """,
    section="E1",
    description="tumbling 1-day event-time windows per event type",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .groupBy(F.window("ts", "1 day").start.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            ((F.sum(cents("value")) / F.count("*")) / 100).alias("avg_value"),
        )
        .select(
            F.date_format("w", _FMT).alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# E2 — sliding window aggregate (2h window, 1h slide → 2 windows per event)
# ---------------------------------------------------------------------------


@graded(
    "window_sliding",
    oracle=f"""
        SELECT strftime(window_start, '{_DUCK_FMT}') AS window_start,
               count(*) AS n
        FROM (
            SELECT date_trunc('hour', ts) AS window_start FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
        ) GROUP BY 1
    """,
    section="E2",
    description="sliding 2h/1h windows: each event lands in exactly two windows",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour").start.alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w", _FMT).alias("window_start"), "n")
    )


# ---------------------------------------------------------------------------
# E3 — session windows (gap-based), oracle via gaps-and-islands
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@graded(
    "window_session",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   -- strictly greater: Spark merges TOUCHING session windows
                   -- (an event at exactly last + gap joins the session;
                   -- probed in tests/test_breadth.py gap-boundary pin)
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
                        OR lag(epoch_us(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), numbered AS (
            SELECT user_id, ts_us,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered
        )
        SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events
        FROM numbered GROUP BY user_id, session_id
    """,
    section="E3",
    description="30-min-gap session windows per user (oracle: gaps-and-islands). "
    "In streaming this is the same session_window expression + watermark",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# E4 — stream-dedup semantics in batch (keep-first, deterministic)
# ---------------------------------------------------------------------------


@graded(
    "stream_dedup_first",
    oracle="""
        SELECT user_id, event_type, event_id AS first_event_id FROM (
            SELECT user_id, event_type, event_id,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    section="E4",
    description="keep-first dedup per key — the deterministic batch form of "
    "dropDuplicates/dropDuplicatesWithinWatermark",
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    return (
        load(spark, "events", sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


# ---------------------------------------------------------------------------
# E7 — stream–stream join, batch-graded time-bounded form
# ---------------------------------------------------------------------------

_JOIN_WINDOW_US = 10 * 60 * 1_000_000  # 10 minutes


@graded(
    "stream_stream_join",
    oracle=f"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                   WHERE event_type = 'click')
        SELECT p.event_id AS purchase_id,
               count(c.ts_us) AS n_prior_clicks
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND c.ts_us >= p.ts_us - {_JOIN_WINDOW_US}
         AND c.ts_us <= p.ts_us
        GROUP BY 1
    """,
    section="E7",
    description="time-bounded stream-stream join (batch form): clicks within "
    "10 min before each purchase, per user.  Under readStream this is the "
    "same equi+range condition with watermarks on both sides bounding state",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts_us").alias("c_ts")
    )
    return (
        purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - _JOIN_WINDOW_US)
            & (F.col("c_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("purchase_id")
        .agg(F.count("c_ts").alias("n_prior_clicks"))
    )


# ---------------------------------------------------------------------------
# E6 — stream–static enrichment join (broadcast the static dim)
# ---------------------------------------------------------------------------


@graded(
    "stream_static_join",
    oracle="""
        SELECT n.n_name, count(*) AS n_events,
               round(sum(e.value), 2) AS total_value
        FROM events e
        JOIN nation n ON e.user_id % 25 = n.n_nationkey
        GROUP BY 1
    """,
    section="E6,C8",
    description="stream-static enrichment: broadcast dim join (identical plan "
    "under readStream; the static side is re-broadcast per micro-batch)",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    nation = load(spark, "nation", sf_dir)
    return (
        events.join(
            F.broadcast(nation),
            (F.col("user_id") % 25) == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# E2/C12 — sliding-window distinct with an auto exact→approx switch.
#
# The round-15 x256 ladder (SCALING.md) proved exact per-window distinct has
# an inherent scale limit: the (window, key) pair space is
# slide_factor × |keys touched|, and once it outgrows the map-side
# partial-agg hash tables the shuffle carries nearly raw rows (measured
# segment exponent 1.23; more shuffle partitions measured WORSE).  The
# measured at-scale fix is the sketch path (approx_count_distinct 4.8×
# cheaper at x256; the register-table HLL family's density segment 0.29).
# ``sliding_distinct`` codifies that diagnosis as code: callers get the
# exact semantics while the key space fits, and the sketch automatically
# above it — mirroring ``similarity.ivf_auto_probe``'s measure-then-pick
# contract.
# ---------------------------------------------------------------------------

#: Per-shuffle-partition distinct-pair allowance for the exact path.  The
#: x256 ladder (SCALING.md round-15/16) located the exact-distinct wall at
#: ~50M total pairs on THIS box's 32-partition shuffle, i.e. ~1.56M pairs
#: of agg-hash state per reduce task (tens of MB) — the point where
#: map-side partial aggregation stops absorbing the key space.  State
#: shards by (window, key) hash, so the budget scales with the number of
#: reduce partitions, not with executor count per se.
SLIDING_DISTINCT_PAIRS_PER_PARTITION = 1_562_500

#: Documented fallback budget (the measured 32-partition wall) used when
#: no session is available to derive partitions from.
SLIDING_DISTINCT_KEY_BUDGET = 50_000_000

#: Clamp on the derived budget, as a multiple of the measured 50M
#: reference (ADVICE r12): the per-partition extrapolation assumes a
#: reduce-task count that actually equals
#: ``spark.sql.shuffle.partitions`` — AQE coalescing can merge reduce
#: tasks (fewer, bigger state shards), so a 2000-partition conf does
#: NOT guarantee 2000-way state sharding.  (Key FREQUENCY skew, by
#: contrast, was measured harmless-to-helpful — tools/skew_wall_probe:
#: at an identical 61.8M pair space and row count, a key owning 50% of
#: rows ran 27% FASTER; the state is the distinct pair space,
#: hash-sharded regardless of row multiplicities.)
#: Until a wall is measured on a genuinely higher-partition session, the
#: derived budget tops out at 16× the reference (800M pairs); callers on
#: measured big iron can pass ``key_budget=`` explicitly.
#:
#: MEASURED (round-18, tools/partition_wall_probe.py): on this box at
#: x256 density, raising the conf 32→128 with AQE coalescing ON (the
#: engine default) changed exact-path runtime not at all — AQE
#: re-coalesces the reduce side, so the conf never became real sharding
#: — and with coalescing OFF, real 4× finer sharding bought only ~8%
#: (single machine: tasks share one memory subsystem).  The per-task
#: extrapolation is honest only when partitions come with machines;
#: the clamp is evidence-backed, not caution-backed (SCALING.md).
SLIDING_DISTINCT_BUDGET_CLAMP_X = 16


def sliding_distinct_budget(spark) -> int:
    """Session-derived exact-path pair budget:
    ``spark.sql.shuffle.partitions × SLIDING_DISTINCT_PAIRS_PER_PARTITION``,
    clamped to ``SLIDING_DISTINCT_BUDGET_CLAMP_X × 50M``.

    A 512-partition cluster gets the full proportional ~800M-pair budget
    (each reduce task holding the same ~1.56M-pair state the wall was
    measured at); beyond 512 partitions the clamp holds the budget flat —
    the even-sharding assumption behind the extrapolation weakens under
    AQE partition coalescing and (window, key) skew, and no wall has been
    measured above the 32-partition reference.  A small local session
    gets proportionally less; an unreadable conf falls back to the
    measured 50M constant.  Pass ``key_budget=`` to ``sliding_distinct``
    to override either direction.
    """
    try:
        derived = (
            int(spark.conf.get("spark.sql.shuffle.partitions"))
            * SLIDING_DISTINCT_PAIRS_PER_PARTITION
        )
        return min(
            derived, SLIDING_DISTINCT_BUDGET_CLAMP_X * SLIDING_DISTINCT_KEY_BUDGET
        )
    except Exception:
        return SLIDING_DISTINCT_KEY_BUDGET


def sliding_key_space(
    df: DataFrame, ts_col: str, key_col: str, window: str, slide: str
) -> int:
    """Estimate the distinct (window, key) pair count for a sliding spec.

    One column-pruned pre-flight scan with CONSTANT aggregation state: the
    window membership is expanded row-side (Expand node — no join, the
    same shape the real aggregate uses) and fed to one
    ``approx_count_distinct`` over the (window_start, key) struct, whose
    HLL++ state is O(1) regardless of input size.  Cost at 100 TB: one
    scan of two columns, no shuffle of data rows (partial sketches merge).
    """
    est = (
        df.select(F.window(ts_col, window, slide).alias("__w"), key_col)
        .agg(
            F.approx_count_distinct(
                F.struct(F.col("__w.start"), F.col(key_col)), 0.05
            ).alias("n")
        )
        .collect()[0]["n"]  # O(1) — one long, the documented pre-flight cost
    )
    return int(est)


def choose_distinct_method(estimated_pairs: int, budget: int) -> str:
    """Pure switch rule: exact while the pair space fits, sketch above."""
    return "exact" if estimated_pairs <= budget else "approx"


_DUR_UNIT_US = {
    "second": 1_000_000,
    "minute": 60 * 1_000_000,
    "hour": 3600 * 1_000_000,
    "day": 86400 * 1_000_000,
}


def _duration_us(spec: str) -> int:
    """'4 hours' → microseconds (the subset of Spark's interval grammar
    the sliding helpers accept)."""
    n, unit = spec.split()
    return int(n) * _DUR_UNIT_US[unit.rstrip("s")]


# Internal column names sliding_expand introduces mid-plan; a key column
# with one of these names would silently alias into the expansion
# arithmetic (ADVICE r13), so the entry point rejects them outright.
_EXPAND_RESERVED = frozenset({"__base", "__t", "__k", "ws_us"})


def sliding_expand(
    df: DataFrame, ts_col: str, key_col: str, window: str, slide: str
) -> DataFrame:
    """(``ws_us``, key) membership expansion for ANY sliding spec — exact
    long arithmetic, floor-aligned via ``pmod`` so pre-1970 timestamps
    bucket identically to ``F.window``.  Each row emits its
    ``ceil(window/slide)`` candidate window starts; for ALIGNED specs
    (window % slide == 0) every candidate is a member and the plan is
    pure Project→Generate, while NON-aligned specs add one scan-side
    membership filter (``ws_us > t − window``, the same general rule
    ``F.window`` applies) that prunes the boundary candidate — still no
    join, no timestamp rendering.  The hll branch of
    :func:`sliding_distinct` builds its register tables on this frame.

    Null semantics (ADVICE r13): rows with a NULL timestamp belong to no
    window, and a NULL key carries no countable identity — both are
    filtered scan-side here, mirroring ``countDistinct``'s treatment, so
    every consumer of the expansion shares one rule.  ``key_col`` must
    not collide with the expansion's internal names (``__base``/``__t``/
    ``__k``/``ws_us``) — rejected with ``ValueError`` rather than
    silently mis-expanding.
    """
    if key_col in _EXPAND_RESERVED:
        raise ValueError(
            f"key_col {key_col!r} collides with sliding_expand's internal "
            f"column names {sorted(_EXPAND_RESERVED)}; alias it first"
        )
    df = df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    win_us, slide_us = _duration_us(window), _duration_us(slide)
    n_candidates = -(-win_us // slide_us)  # ceil(window/slide)
    # pmod, not %: Spark % truncates toward zero, so pre-1970
    # (negative-epoch) events would misalign vs F.window's floor
    # semantics; pmod's non-negative remainder IS floor alignment.
    us = F.unix_micros(ts_col)
    base = (us - F.pmod(us, F.lit(slide_us))).alias("__base")
    expanded = (
        df.select(base, us.alias("__t"), key_col)
        .select(
            F.explode(
                F.array(*[F.lit(k) for k in range(n_candidates)])
            ).alias("__k"),
            "__base",
            "__t",
            key_col,
        )
        .select(
            # cast BEFORE multiplying: F.lit(slide_us) is an int32 literal
            # whenever slide <= ~35 minutes (slide_us < 2^31), so the k ×
            # slide product would multiply in 32-bit and overflow under
            # ANSI mode once k·slide_us >= 2^31 (e.g. an 8h window over a
            # 10-minute slide).  Found by the random-spec third witness —
            # every fixture spec happened to use a >=1h slide (int64
            # literal) or a tiny k range.
            (
                F.col("__base")
                - F.col("__k").cast("long") * F.lit(slide_us).cast("long")
            ).alias("ws_us"),
            "__t",
            key_col,
        )
    )
    if win_us % slide_us:
        # general membership: a window starting at ws covers t iff
        # ws <= t < ws + window; the explode already guarantees the left
        # half, the filter enforces the right (only the last candidate
        # of each row can fail it, and only for non-divisible specs).
        expanded = expanded.filter(F.col("ws_us") > F.col("__t") - F.lit(win_us))
    return expanded.select("ws_us", key_col)


def sliding_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str,
    slide: str,
    extra_aggs: list | None = None,
    method: str = "auto",
    key_budget: int | None = None,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-sliding-window distinct count of ``key_col`` with a scale guard.

    ``method``:

    * ``'exact'`` — ``countDistinct`` keyed on (window, key); correct at
      any size but super-linear once the pair space outgrows map-side
      partial aggregation (measured: segment exponent 1.23 at x256).
    * ``'approx'`` — ``approx_count_distinct(key, rsd)``: constant state
      per window, partial-mergeable, the measured 100 TB path (4.8×
      cheaper at x256 density).
    * ``'hll'`` — the repo's deterministic register-table family
      (``sketch.hll_registers_by`` + small-range-corrected estimate):
      same constant-per-window state as ``'approx'`` but the per-window
      partials are PLAIN ROWS you can persist and merge by per-register
      max (the ``hll_windowed_merge`` rollup read path), and the
      estimates are engine-independent (oracle-checkable).  Any
      window/slide spec (non-aligned specs add one scan-side membership
      filter in the expansion).  ``extra_aggs`` run as a second windowed
      pass joined per window (the sketch pass consumes only (window,
      key)) — two scans, one bounded per-window join.
    * ``'auto'`` — run the O(1)-state :func:`sliding_key_space` pre-flight
      and pick exact/approx per :func:`choose_distinct_method` (native
      approx is the cheaper sketch; pass ``'hll'`` explicitly when you
      need mergeable/engine-independent partials).

    Output columns: ``ws_us`` (window start, epoch µs), ``n_distinct``,
    plus any ``extra_aggs`` (already-aliased Columns).

    Null semantics (ADVICE r13): rows with a NULL timestamp or a NULL key
    are excluded up front, for EVERY method — a row without a timestamp
    belongs to no window, and ``countDistinct``/``approx_count_distinct``
    would ignore a NULL key anyway, so filtering both scan-side makes the
    three methods (and the hll branch's two passes, whose per-window join
    would otherwise silently drop a NULL-window group) agree by
    construction.  Consequence worth knowing: ``extra_aggs`` also see
    only the filtered rows, and a window whose rows ALL have NULL keys is
    absent from the output (rather than present with ``n_distinct = 0``).

    ``key_budget=None`` (default) derives the exact-path budget from the
    SESSION — :func:`sliding_distinct_budget` scales the measured
    per-partition wall by ``spark.sql.shuffle.partitions``, clamped at
    16× the measured reference (AQE coalescing and key skew weaken the
    even-sharding extrapolation; see the clamp note there) — so a bigger
    cluster keeps the exact path proportionally longer; pass an int to
    pin it.
    """
    df = df.filter(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
    if method == "auto":
        if key_budget is None:
            key_budget = sliding_distinct_budget(df.sparkSession)
        method = choose_distinct_method(
            sliding_key_space(df, ts_col, key_col, window, slide), key_budget
        )
    if method == "hll":
        from pulsar_message_filter_spark.operators.sketch import (
            hll_corrected_estimate,
            hll_registers_by,
        )

        expanded = sliding_expand(df, ts_col, key_col, window, slide)
        regs = hll_registers_by(expanded, key_col, [F.col("ws_us")])
        est = hll_corrected_estimate(F.count("*"), F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))))
        est_df = regs.groupBy("ws_us").agg(
            F.round(est, 0).cast("long").alias("n_distinct")
        )
        if not extra_aggs:
            return est_df
        # The register aggregation consumes only (ws_us, key), so other
        # columns the extra_aggs reference are gone by design; run them as
        # the exact path's windowed pass and join per window.  Both sides
        # are per-window frames (rows = #windows, bounded), so the join is
        # trivially broadcastable — the raw data is still scanned twice,
        # which is the honest cost of mixing a two-stage sketch with
        # one-stage aggregates.  The inner join is lossless: both passes
        # read the SAME null-filtered frame and the expansion's window
        # membership ≡ F.window's (random-spec witness), so the two
        # window sets are equal by construction (ADVICE r13 — null-ts
        # rows previously vanished through this join without a signal).
        aggs_df = (
            df.groupBy(F.window(ts_col, window, slide).alias("__w"))
            .agg(*extra_aggs)
            .withColumn("ws_us", F.unix_micros(F.col("__w.start")))
            .drop("__w")
        )
        return est_df.join(aggs_df, "ws_us")
    if method == "exact":
        distinct_agg = F.countDistinct(key_col).alias("n_distinct")
    elif method == "approx":
        distinct_agg = F.approx_count_distinct(key_col, rsd).alias("n_distinct")
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("__w"))
        .agg(distinct_agg, *(extra_aggs or []))
        .withColumn("ws_us", F.unix_micros(F.col("__w.start")))
        .drop("__w")
    )
