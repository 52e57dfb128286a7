"""Round-16 ops: the sliding_distinct auto-switch and the widen4 pins.

Each pin is an INDEPENDENT witness — recomputed invariants, a pure-Python
re-derivation, or a plan assertion — not a rerun of the DuckDB oracle
(check_parity already does that).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _analyzed_plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


# ---------------------------------------------------------------------------
# sliding_distinct: the switch rule and both regimes
# ---------------------------------------------------------------------------


def test_choose_distinct_method_rule():
    from pulsar_message_filter_spark.operators.windows import (
        choose_distinct_method,
    )

    assert choose_distinct_method(0, 100) == "exact"
    assert choose_distinct_method(100, 100) == "exact"  # budget inclusive
    assert choose_distinct_method(101, 100) == "approx"


def test_auto_picks_exact_below_budget(spark):
    """At smoke scale the pair space is tiny → auto must yield the exact
    countDistinct plan (no approx node)."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    out = sliding_distinct(ev, "ts", "user_id", "4 hours", "1 hour", method="auto")
    plan = _analyzed_plan(out).lower()
    assert "approx_count_distinct" not in plan
    assert "distinct" in plan


def test_auto_switches_to_approx_above_budget(spark):
    """A key_budget of 1 forces the sketch path — the switch demonstrably
    fires on the SAME input and spec."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    out = sliding_distinct(
        ev, "ts", "user_id", "4 hours", "1 hour", method="auto", key_budget=1
    )
    assert "approx_count_distinct" in _analyzed_plan(out).lower()


def test_sliding_key_space_estimate_close(spark):
    """The O(1)-state pre-flight estimate tracks the true (window, key)
    pair count within HLL++ tolerance."""
    from pyspark.sql import functions as F
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_key_space

    ev = load(spark, "events", SF_SMOKE)
    est = sliding_key_space(ev, "ts", "user_id", "4 hours", "1 hour")
    true = (
        ev.select(F.window("ts", "4 hours", "1 hour").alias("w"), "user_id")
        .select(F.col("w.start").alias("ws"), "user_id")
        .distinct()
        .count()
    )
    assert true > 0
    assert abs(est - true) / true < 0.15  # rsd 0.05 → generous 3σ bound


def test_approx_mode_tracks_exact(spark):
    """Per-window approx counts stay within sketch tolerance of exact —
    the semantic contract a user relies on when the switch fires."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    kw = dict(ts_col="ts", key_col="user_id", window="4 hours", slide="1 hour")
    exact = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(ev, method="exact", **kw).collect()
    }
    approx = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(ev, method="approx", rsd=0.02, **kw).collect()
    }
    assert set(exact) == set(approx)
    for ws, n in exact.items():
        assert abs(approx[ws] - n) <= max(3, 0.1 * n), (ws, n, approx[ws])


def test_sliding_distinct_rejects_bad_args(spark):
    import pytest
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    with pytest.raises(ValueError):
        sliding_distinct(ev, "ts", "user_id", "4 hours", "1 hour", method="bogus")


def test_sliding_hll_extra_aggs_two_pass_matches_exact_path(spark):
    """Round-18: method='hll' no longer rejects extra_aggs — they run as a
    second windowed pass joined per window.  The agg columns must equal
    the exact path's byte-for-byte (same F.window pass), the window set
    must be identical, and n_distinct must equal the plain hll call's."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    kw = dict(ts_col="ts", key_col="user_id", window="3 hours", slide="2 hours")
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("long")).alias("sum_value"),
    ]
    got = {
        r.ws_us: (r.n_distinct, r.n_events, r.sum_value)
        for r in sliding_distinct(ev, extra_aggs=aggs, method="hll", **kw).collect()
    }
    exact = {
        r.ws_us: (r.n_events, r.sum_value)
        for r in sliding_distinct(ev, extra_aggs=aggs, method="exact", **kw).collect()
    }
    plain_hll = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(ev, method="hll", **kw).collect()
    }
    assert set(got) == set(exact) == set(plain_hll) and got
    for ws, (nd, ne, sv) in got.items():
        assert (ne, sv) == exact[ws], ws
        assert nd == plain_hll[ws], ws


def test_sliding_distinct_hll_matches_register_query(spark):
    """method='hll' must produce exactly the rounded per-window estimates
    of the graded register-table query at the same 6h/2h spec — one code
    path, one answer."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import (
        e2e_sliding_reach_hll,
    )
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    got = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(
            ev, "ts", "user_id", "6 hours", "2 hours", method="hll"
        ).collect()
    }
    import math

    expected = {  # floor(x+0.5): Spark F.round is HALF_UP, not banker's
        r.ws_us: math.floor(r.reach_estimate + 0.5)
        for r in e2e_sliding_reach_hll(spark, SF_SMOKE).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# e2e_sliding_reach_hll: sketch-size bound + estimate quality vs exact
# ---------------------------------------------------------------------------


def test_e2e_hll_register_bound_and_accuracy(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import (
        e2e_sliding_reach_hll,
    )

    rows = e2e_sliding_reach_hll(spark, SF_SMOKE).collect()
    assert rows
    # state-bound witness: a window's sketch never exceeds m rows
    assert all(1 <= r.n_registers <= 64 for r in rows)

    ev = load(spark, "events", SF_SMOKE)
    exact = {
        r.ws_us: r.n
        for r in ev.groupBy(
            F.window("ts", "6 hours", "2 hours").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.unix_micros("w.start").alias("ws_us"), "n")
        .collect()
    }
    assert set(exact) == {r.ws_us for r in rows}
    # m=64 → rse ~1.04/8 = 13%; allow 3x on per-window smalls
    rel_errs = [abs(r.reach_estimate - exact[r.ws_us]) / exact[r.ws_us] for r in rows]
    assert np.mean(rel_errs) < 0.2, np.mean(rel_errs)


# ---------------------------------------------------------------------------
# kmeans_assign_exact: pure-numpy witness of the whole assignment pass
# ---------------------------------------------------------------------------


def test_kmeans_assign_exact_numpy_witness(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import kmeans_assign_exact

    emb = (
        load(spark, "embeddings", SF_SMOKE)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    q = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000
    ).astype(np.int64)
    order = np.argsort(ids)
    cents = q[order[:8]]
    # exact int64 squared distances; argmin ties → lowest cluster id
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # np.argmin takes the first (lowest) index
    expected = {}
    for c in range(8):
        mask = assign == c
        if mask.any():
            expected[c] = (
                int(mask.sum()),
                int(ids[mask].sum()),
                int(d2[mask, c].sum()),
            )

    got = {
        r.cluster: (r.n_members, r.sum_vec_id, r.sum_d2)
        for r in kmeans_assign_exact(spark, SF_SMOKE).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# e2d through the graded surface: window math sanity
# ---------------------------------------------------------------------------


def test_e2d_windows_partition_events(spark):
    """Each event lands in exactly 4 windows → Σ n_events = 4·|events|,
    and every window's distinct ≤ its event count."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import (
        e2d_sliding_reach_auto,
    )

    rows = e2d_sliding_reach_auto(spark, SF_SMOKE).collect()
    n_events_total = load(spark, "events", SF_SMOKE).count()
    assert sum(r.n_events for r in rows) == 4 * n_events_total
    assert all(0 < r.n_distinct <= r.n_events for r in rows)
    assert all(r.ws_us % (3600 * 1_000_000) == 0 for r in rows)


# ---------------------------------------------------------------------------
# f21b_topk_int8_exact: pure-numpy witness of quantize -> dot -> rank
# ---------------------------------------------------------------------------


def test_f21b_int8_exact_numpy_witness(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import (
        f21b_topk_int8_exact,
    )

    emb = (
        load(spark, "embeddings", SF_SMOKE)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    v = np.array([r.embedding for r in emb], dtype=np.float64)
    amax = np.abs(v).max(axis=1, keepdims=True)
    q = np.floor(v / amax * 127).astype(np.int64)

    expected = set()
    by_id = {int(i): q[j] for j, i in enumerate(ids)}
    for qid in [int(i) for i in ids if i < 30]:
        dots = sorted(
            ((int(by_id[qid] @ by_id[nid]), -nid), nid)
            for nid in by_id
            if nid != qid
        )
        # sort ascending by (dot, -nid) then take from the END = dot desc,
        # nid asc on ties
        top = [n for _, n in dots[::-1][:3]]
        for rank, nid in enumerate(top, 1):
            expected.add((qid, nid, int(by_id[qid] @ by_id[nid]), rank))

    got = {
        (r.query_id, r.neighbor_id, r.dot8, r.rank)
        for r in f21b_topk_int8_exact(spark, SF_SMOKE).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# f49b_mmr_exact: numpy-matrix witness of the greedy invariant
# ---------------------------------------------------------------------------


def test_f49b_mmr_exact_numpy_witness(spark):
    """Re-derive the greedy selection with numpy matrix ops (a different
    code path from the operator's dict loops) and check the pick
    sequence AND the per-step argmax invariant."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen4 import f49b_mmr_exact

    emb = (
        load(spark, "embeddings", SF_SMOKE)
        .where(F.col("vec_id") <= 50)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb])
    v = np.array([r.embedding for r in emb], dtype=np.float64)
    q = np.floor(v / np.abs(v).max(axis=1, keepdims=True) * 127).astype(np.int64)
    qmap = {int(i): q[j] for j, i in enumerate(ids)}
    q0 = qmap.pop(0)
    pool = sorted(qmap)
    rel = {i: int(q0 @ qmap[i]) for i in pool}
    sim = {(a, b): int(qmap[a] @ qmap[b]) for a in pool for b in pool if a != b}

    sel: list[int] = []
    expected = []
    for rank in range(1, 11):
        best = None
        for i in pool:
            if i in sel:
                continue
            pen = max(sim[(i, s)] for s in sel) if sel else 0
            sc = 7 * rel[i] - 3 * pen
            if best is None or (sc, -i) > best[:2]:
                best = (sc, -i, i)
        sel.append(best[2])
        expected.append((rank, best[2], rel[best[2]], best[0]))

    got = [
        (r.rank, r.neighbor_id, r.rel8, r.score10)
        for r in f49b_mmr_exact(spark, SF_SMOKE).orderBy("rank").collect()
    ]
    assert got == expected
    # diversity actually engaged: the pick order must differ from pure
    # relevance order once the penalty term is active
    by_rel = [i for i, _ in sorted(rel.items(), key=lambda t: (-t[1], t[0]))][:10]
    assert [p for _, p, _, _ in expected] != by_rel


# ---------------------------------------------------------------------------
# auto-switch property fuzz: for random specs and budgets, the method the
# plan actually took must equal the pure rule applied to the pre-flight
# estimate — no spec/budget combination may silently disagree.
# ---------------------------------------------------------------------------


def test_auto_switch_agrees_with_rule_across_specs(spark):
    import random

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import (
        choose_distinct_method,
        sliding_distinct,
        sliding_key_space,
    )

    ev = load(spark, "events", SF_SMOKE)
    rng = random.Random(16)
    specs = [("2 hours", "1 hour"), ("6 hours", "2 hours"), ("1 day", "6 hours")]
    for _ in range(6):
        window, slide = rng.choice(specs)
        key = rng.choice(["user_id", "event_type"])
        est = sliding_key_space(ev, "ts", key, window, slide)
        # budgets straddling the estimate so BOTH branches occur across
        # the seeds (estimate > 0 always on this fixture)
        budget = rng.choice([max(1, est // 2), est * 2 + 10])
        expected = choose_distinct_method(est, budget)
        df = sliding_distinct(
            ev, "ts", key, window, slide, method="auto", key_budget=budget
        )
        plan = df._jdf.queryExecution().analyzed().toString().lower()
        took = "approx" if "approx_count_distinct" in plan else "exact"
        # the pre-flight re-estimates per call; HLL++ is deterministic for
        # a fixed input/rsd, so the re-estimate equals `est` and the plan
        # must match the rule exactly
        assert took == expected, (window, slide, key, est, budget, took)


def test_sliding_distinct_exact_matches_python_recompute(spark):
    """Independent witness for the exact mode: a pure-Python dict
    recompute of per-window distinct sets over the raw (ts, user) rows —
    no Spark windowing, no DuckDB."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    raw = ev.select(F.unix_micros("ts").alias("us"), "user_id").collect()
    slide, dur = 3600 * 1_000_000, 4  # 1h hop, 4 windows per event
    expected: dict[int, set] = {}
    counts: dict[int, int] = {}
    for r in raw:
        base = r.us - r.us % slide
        for k in range(dur):
            ws = base - k * slide
            expected.setdefault(ws, set()).add(r.user_id)
            counts[ws] = counts.get(ws, 0) + 1
    got = {
        r.ws_us: (r.n_distinct, r.n_events)
        for r in sliding_distinct(
            ev, "ts", "user_id", "4 hours", "1 hour",
            extra_aggs=[F.count("*").alias("n_events")], method="exact",
        ).collect()
    }
    assert got == {ws: (len(s), counts[ws]) for ws, s in expected.items()}


# ---------------------------------------------------------------------------
# WAV external witness (VERDICT r10 "what's missing" #3, audio half):
# Python's stdlib `wave` module is an INDEPENDENT RIFF/WAVE implementation
# — cross-check the repo's from-spec encoder and decoder against it in
# both directions.  (The image half stays blocked: no independent
# JPEG/PNG decoder exists in this container — probed again this round:
# no PIL/cv2/ffmpeg/ImageMagick, tkinter needs a display.)
# ---------------------------------------------------------------------------


def test_wav_encoder_read_by_stdlib_wave():
    """synth_wav output must parse in stdlib `wave` with the exact
    declared geometry and byte-identical PCM payload."""
    import io
    import wave

    from pulsar_message_filter_spark.operators.multimodal import (
        decode_wav_samples,
        synth_wav,
    )

    for bits, n_ch, rate in [(8, 1, 22050), (16, 2, 8000), (32, 2, 44100)]:
        blob = synth_wav(240, n_channels=n_ch, rate=rate, bits=bits, seed=7)
        with wave.open(io.BytesIO(blob)) as w:
            assert w.getnchannels() == n_ch
            assert w.getframerate() == rate
            assert w.getsampwidth() == bits // 8
            assert w.getnframes() == 240
            frames = w.readframes(240)
        own, own_rate = decode_wav_samples(blob)
        assert own_rate == rate
        assert frames == own.astype(own.dtype.newbyteorder("<")).tobytes()


def test_wav_decoder_reads_stdlib_wave_output():
    """A WAV authored entirely by stdlib `wave` (independent writer) must
    decode to the same samples through the repo decoder."""
    import io
    import wave

    import numpy as np

    from pulsar_message_filter_spark.operators.multimodal import (
        decode_wav_samples,
    )

    pcm = ((np.arange(600, dtype=np.int64) * 131) % 4001 - 2000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    samples, rate = decode_wav_samples(buf.getvalue())
    assert rate == 16000
    assert samples.shape == (300, 2)
    assert np.array_equal(samples.reshape(-1), pcm.astype(np.int64))


def test_audio_spectral_against_naive_dft():
    """Algorithm-independent witness for the spectral stage: recompute
    the magnitudes with an explicit O(n^2) DFT matrix (complex
    exponential sum — not numpy's FFT code path) and compare the
    descriptors to the operator's rfft-based output."""
    import pandas as pd

    from pulsar_message_filter_spark.operators.multimodal import (
        audio_spectral_features,
        decode_wav_samples,
        synth_wav,
    )

    frame, hop, rate = 64, 32, 8000
    blob = synth_wav(400, n_channels=1, rate=rate, bits=16, seed=3)
    out = pd.concat(
        audio_spectral_features(
            iter([pd.DataFrame({"path": ["a.wav"], "content": [blob]})]),
            frame=frame,
            hop=hop,
        )
    ).sort_values("frame_idx")

    samples, _ = decode_wav_samples(blob)
    mono = samples.astype(np.float64).mean(axis=1)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    n = np.arange(frame)
    k = np.arange(frame // 2 + 1)
    dft = np.exp(-2j * np.pi * k[:, None] * n[None, :] / frame)  # naive matrix
    freqs = k * rate / frame
    rows = []
    for idx in range(0, len(mono) - frame + 1, hop):
        w = mono[idx : idx + frame] * hann
        mag = np.abs(dft @ w)
        power = mag.sum()
        centroid = (mag * freqs).sum() / power
        spread = np.sqrt((mag * (freqs - centroid) ** 2).sum() / power)
        gmean = np.exp(np.log(mag + 1e-12).mean())
        rows.append((centroid, spread, gmean / (mag.mean() + 1e-12)))

    assert len(rows) == len(out)
    for (c, s, f), r in zip(rows, out.itertuples()):
        assert abs(r.centroid_hz - round(float(c), 4)) < 1e-3
        assert abs(r.bandwidth_hz - round(float(s), 4)) < 1e-3
        assert abs(r.flatness - round(float(f), 6)) < 1e-5


def test_key_budget_derived_from_session(spark):
    """VERDICT r11 #5: the exact-path pair budget scales with the session's
    shuffle-partition count (per-partition state allowance × partitions);
    the 50M constant is exactly the measured 32-partition reference wall
    and the no-session fallback."""
    from pulsar_message_filter_spark.operators.windows import (
        SLIDING_DISTINCT_BUDGET_CLAMP_X,
        SLIDING_DISTINCT_KEY_BUDGET,
        SLIDING_DISTINCT_PAIRS_PER_PARTITION,
        sliding_distinct_budget,
    )

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert sliding_distinct_budget(spark) == min(
        parts * SLIDING_DISTINCT_PAIRS_PER_PARTITION,
        SLIDING_DISTINCT_BUDGET_CLAMP_X * SLIDING_DISTINCT_KEY_BUDGET,
    )
    assert 32 * SLIDING_DISTINCT_PAIRS_PER_PARTITION == SLIDING_DISTINCT_KEY_BUDGET

    class _Conf:
        def __init__(self, parts):
            self._p = parts

        @property
        def conf(self):
            outer = self

            class _C:
                @staticmethod
                def get(key):
                    return str(outer._p)

            return _C()

    # ADVICE r12 clamp: a default-200-partition session extrapolates 6.25×
    # past the measured wall (uncapped 312.5M) — still granted, because the
    # clamp binds at 16×; a 2000-partition conf does NOT get 3.1B pairs
    # (AQE coalescing / key skew break the even-sharding extrapolation)
    # but exactly the 800M ceiling.
    assert (
        sliding_distinct_budget(_Conf(200))
        == 200 * SLIDING_DISTINCT_PAIRS_PER_PARTITION
    )
    assert (
        sliding_distinct_budget(_Conf(2000))
        == SLIDING_DISTINCT_BUDGET_CLAMP_X * SLIDING_DISTINCT_KEY_BUDGET
    )

    class _NoConf:
        class conf:  # conf.get raises → fallback
            @staticmethod
            def get(key):
                raise RuntimeError("no conf")

    assert sliding_distinct_budget(_NoConf()) == SLIDING_DISTINCT_KEY_BUDGET


# ---------------------------------------------------------------------------
# ADVICE r13: null semantics and the reserved-name guard.  Rows with a NULL
# timestamp or a NULL key are excluded up front for EVERY method — so the
# hll branch's register build, its extra_aggs join, and the exact/approx
# F.window paths all agree by construction.  These pins union synthetic
# null rows into the fixture (the parquet itself has none) and assert the
# output is byte-identical to the clean input's, per method and per pass.
# ---------------------------------------------------------------------------


def _union_null_rows(ev):
    """events + three poisoned rows: null ts, null key, null both."""
    ts_t = dict(ev.dtypes)["ts"]
    null_ts = ev.limit(1).withColumn("ts", F.lit(None).cast(ts_t))
    null_key = ev.limit(1).withColumn("user_id", F.lit(None).cast("long"))
    null_both = null_ts.withColumn("user_id", F.lit(None).cast("long"))
    return ev.unionByName(null_ts).unionByName(null_key).unionByName(null_both)


def test_sliding_distinct_null_rows_invisible_to_every_method(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = load(spark, "events", SF_SMOKE)
    poisoned = _union_null_rows(ev)
    # aligned AND non-aligned spec: the non-aligned membership filter and
    # the extra_aggs join are the two places a null row could previously
    # diverge (silent drop vs register-row inflation).
    for window, slide in (("4 hours", "1 hour"), ("5 hours", "2 hours")):
        kw = dict(ts_col="ts", key_col="user_id", window=window, slide=slide)
        aggs = [F.count("*").alias("n_events")]
        for method in ("exact", "approx", "hll"):
            clean = sorted(
                map(tuple, sliding_distinct(ev, method=method, **kw).collect())
            )
            dirty = sorted(
                map(tuple, sliding_distinct(poisoned, method=method, **kw).collect())
            )
            assert clean == dirty and clean, (method, window, slide)
        for method in ("exact", "hll"):  # the two extra_aggs-capable paths
            clean = sorted(map(tuple, sliding_distinct(
                ev, extra_aggs=aggs, method=method, **kw).collect()))
            dirty = sorted(map(tuple, sliding_distinct(
                poisoned, extra_aggs=aggs, method=method, **kw).collect()))
            assert clean == dirty and clean, (method, window, slide, "extra_aggs")


def test_sliding_expand_filters_null_rows_and_matches_fwindow(spark):
    """sliding_expand's documented rule (null ts → no window, null key →
    no identity) must equal F.window membership over the SAME filter —
    the engine-internal witness extended to poisoned input."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_expand

    ev = _union_null_rows(load(spark, "events", SF_SMOKE))
    window, slide = "5 hours", "2 hours"
    got = {
        (r.ws_us, r.k): r.n
        for r in sliding_expand(ev, "ts", "user_id", window, slide)
        .groupBy("ws_us", F.col("user_id").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expected = {
        (r.ws_us, r.k): r.n
        for r in ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy(
            F.window("ts", window, slide).alias("__w"),
            F.col("user_id").alias("k"),
        )
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros("__w.start").alias("ws_us"), "k", "n")
        .collect()
    }
    assert got == expected and got
    assert all(ws is not None and k is not None for ws, k in got)


def test_sliding_expand_rejects_reserved_key_names(spark):
    import pytest
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.windows import sliding_expand

    ev = load(spark, "events", SF_SMOKE)
    for bad in ("ws_us", "__base", "__t", "__k"):
        poisoned = ev.withColumn(bad, F.col("user_id"))
        with pytest.raises(ValueError, match="internal"):
            sliding_expand(poisoned, "ts", bad, "2 hours", "1 hour")
