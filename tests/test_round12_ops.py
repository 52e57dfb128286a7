"""Round-12 widening ops: retry-topic loop, N-way fan-out, E7 variants,
weighted KNN, cosine graph profiles (operators/widen.py)."""

import datetime

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _msgs(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_retry_topic_loop_accounting(spark):
    """Hand-built message set pins every branch of the loop: immediate
    accept, accept-on-backoff at attempt 3, DLQ exhaustion at the cap,
    first-delivery reject — with exact delivery counts and visibility
    stamps (ts + (n_deliveries - 1) * delay)."""
    from pulsar_message_filter_spark.operators.widen import (
        _MAX_ATTEMPTS,
        _RETRY_DELAY_MS,
        retry_topic_loop,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 10, "view", 500.0, "{}"),      # value>120 → ACCEPT @1
        (2, t0, 11, "view", 50.0, "{}"),       # backoff → ACCEPT @3
        (3, t0, 12, "click", 50.0, "{}"),      # never accepts → DLQ @cap
        (4, t0, 13, "signup", 50.0, "{}"),     # → REJECT @1
        (5, t0, 14, "click", 200.0, "{}"),     # value>120 → ACCEPT @1
    ]
    got = {r.event_id: r for r in retry_topic_loop(_msgs(spark, rows)).collect()}
    base_ms = int(t0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)

    assert (got[1].final_verdict, got[1].n_deliveries) == ("ACCEPT", 1)
    assert got[1].final_visible_ms == base_ms
    assert (got[2].final_verdict, got[2].n_deliveries) == ("ACCEPT", 3)
    assert got[2].final_visible_ms == base_ms + 2 * _RETRY_DELAY_MS
    assert (got[3].final_verdict, got[3].n_deliveries) == ("DLQ", _MAX_ATTEMPTS)
    assert got[3].final_visible_ms == base_ms + (_MAX_ATTEMPTS - 1) * _RETRY_DELAY_MS
    assert (got[4].final_verdict, got[4].n_deliveries) == ("REJECT", 1)
    assert (got[5].final_verdict, got[5].n_deliveries) == ("ACCEPT", 1)
    # conservation: every message finishes exactly once
    assert len(got) == len(rows)


def test_retry_topic_loop_empty_input(spark):
    from pulsar_message_filter_spark.operators.widen import retry_topic_loop

    empty = _msgs(spark, [])
    assert retry_topic_loop(empty).count() == 0


def test_fanout_nway_matches_n_separate_passes(spark):
    """Single-pass fan-out ≡ N independent filtered aggregates — the B14
    contract, checked in-engine (the oracle checks it cross-engine)."""
    from pulsar_message_filter_spark.operators.widen import (
        _NWAY_SUBS,
        selector_fanout_nway,
    )

    got = {
        r.subscription: (r.n_matched, r.total_value)
        for r in selector_fanout_nway(spark, SF_SMOKE).collect()
    }
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    for name, sel in _NWAY_SUBS.items():
        one = events.filter(sel.column()).agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv")
        ).first()
        assert got[name] == (one.n, one.tv), name
    assert len(got) == len(_NWAY_SUBS)


def test_outer_first_preserves_unmatched_purchases(spark):
    """Left-outer E7: one row per purchase; unmatched rows carry NULL gap
    and matched=false; matched rows have a positive gap within the bound."""
    from pulsar_message_filter_spark.operators.widen import (
        _OUTER_WINDOW_US,
        stream_stream_join_outer_first,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    out = stream_stream_join_outer_first(spark, SF_SMOKE).collect()
    assert len(out) == n_purchases
    assert any(not r.matched for r in out) and any(r.matched for r in out)
    for r in out:
        if r.matched:
            assert 0 < r.first_view_gap_us <= _OUTER_WINDOW_US
        else:
            assert r.first_view_gap_us is None


def test_followup_join_respects_bound(spark):
    from pulsar_message_filter_spark.operators.widen import (
        _FOLLOW_WINDOW_US,
        stream_stream_join_followup,
    )

    out = stream_stream_join_followup(spark, SF_SMOKE).collect()
    assert out, "expected some purchases with followup clicks"
    for r in out:
        assert r.n_followup_clicks >= 1
        assert 0 < r.first_click_delay_us <= _FOLLOW_WINDOW_US


def test_weighted_vote_differs_from_ballot_vote_shape(spark):
    """Weighted vote: one row per query, weight is the sum of its label's
    top-5 similarities (recomputed via brute_topk for query 0)."""
    from pulsar_message_filter_spark.operators.similarity import brute_topk
    from pulsar_message_filter_spark.operators.widen import f5_knn_weighted_vote

    out = {r.query_id: r for r in f5_knn_weighted_vote(spark, SF_SMOKE).collect()}
    assert set(out) == set(range(10))
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    knn = (
        brute_topk(emb.filter(F.col("vec_id") == 0), emb, k=5)
        .join(labels, "neighbor_id")
        .collect()
    )
    by_label: dict = {}
    for r in knn:
        by_label[r.label] = round(by_label.get(r.label, 0.0) + r.cos_sim, 6)
    best = max(by_label.items(), key=lambda kv: (kv[1], -kv[0]))
    assert out[0].predicted_label == best[0]
    assert abs(out[0].weight - best[1]) < 1e-6


def test_cosine_threshold_graph_degree_symmetry(spark):
    """Sum of degrees = 2 × number of edges; every mean_sim ≥ threshold."""
    from pulsar_message_filter_spark.operators.widen import (
        f3_cosine_threshold_graph,
    )

    out = f3_cosine_threshold_graph(spark, SF_SMOKE).collect()
    assert out, "threshold graph should be non-empty on the smoke corpus"
    assert sum(r.degree for r in out) % 2 == 0
    assert all(r.mean_sim >= 0.1 for r in out)


def test_cosine_label_matrix_covers_all_label_pairs(spark):
    from pulsar_message_filter_spark.operators.widen import f3_cosine_label_matrix

    out = f3_cosine_label_matrix(spark, SF_SMOKE).collect()
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    labels = sorted(
        r.label for r in emb.filter("vec_id < 60").select("label").distinct().collect()
    )
    expected = {(a, b) for a in labels for b in labels if a <= b}
    got = {(r.label_lo, r.label_hi) for r in out}
    # singleton labels can't form an intra pair; everything else must appear
    assert got <= expected
    assert all(-1.0 <= r.mean_sim <= 1.0 and r.n_pairs >= 1 for r in out)


def test_header_probe_matches_full_decode(spark):
    """The header-only probe must agree with the full decoder on every
    decodable file's kind and geometry while reading only O(header)
    bytes, and must quarantine header-level poison as probe_ok=false."""
    from pulsar_message_filter_spark.operators.multimodal import (
        f12c_media_stats,
        f12g_header_probe,
    )

    probe = {r.path: r for r in f12g_header_probe(spark, SF_SMOKE).collect()}
    full = {r.path: r for r in f12c_media_stats(spark, SF_SMOKE).collect()}
    assert set(probe) == set(full)

    for path, fr in full.items():
        pr = probe[path]
        if fr.decodable and fr.media_kind in ("bmp", "png", "gif", "jpeg"):
            assert pr.probe_ok, path
            assert (pr.width, pr.height) == (fr.width, fr.height), path
        if fr.decodable and fr.media_kind == "wav":
            assert pr.probe_ok and pr.sample_rate == fr.sample_rate, path
            assert pr.width == fr.n_channels, path  # ch count rides `width`
    # entropy-coded kinds: the probe must NOT have read the payload body
    for path in ("img_420.jpg", "img_gray.jpg", "img_prog.jpg"):
        pr = probe[path]
        assert 0 < pr.probe_bytes < pr.n_bytes / 2, (path, pr.probe_bytes)
    assert probe["img_prog.jpg"].progressive is True
    assert probe["img_420.jpg"].progressive is False
    # header-level poison: detected kind, probe_ok=false, no dims
    assert probe["poison.jpg"].media_kind == "jpeg"
    assert probe["poison.jpg"].probe_ok is False
    assert probe["opaque.bin"].media_kind == "opaque"


def test_publish_atomic_is_replay_idempotent(spark, tmp_path):
    """E10 pin for the retry-topic soak's file-queue sink: publishing the
    SAME (tag, content) twice — a checkpoint-recovered micro-batch replay
    — leaves exactly one topic file with the batch's rows, never a
    duplicate; a different tag adds a second file."""
    import sys

    sys.path.insert(0, "tools")
    from stream_soak import publish_atomic

    stage = str(tmp_path / "stage")
    topic = str(tmp_path / "topic")
    import os

    os.makedirs(stage), os.makedirs(topic)

    df = spark.range(100).selectExpr("id AS event_id", "id % 7 AS user_id")
    publish_atomic(df, "ingest-42", stage, topic)
    publish_atomic(df, "ingest-42", stage, topic)  # replayed micro-batch
    files = sorted(os.listdir(topic))
    assert files == ["ingest-42.parquet"]
    assert spark.read.parquet(f"{topic}/ingest-42.parquet").count() == 100

    publish_atomic(df.limit(5), "ingest-43", stage, topic)
    assert len(os.listdir(topic)) == 2
    assert os.listdir(stage) == []  # staging fully cleaned


def test_retry_loop_invariants_property(spark):
    """Hypothesis property: for ANY message set, the retry loop conserves
    messages (each finishes exactly once), bounds deliveries by the
    attempt cap, stamps final visibility at exactly
    base + (n_deliveries - 1) * delay, and classes verdicts by the
    closed form of the selector chain."""
    from hypothesis import given, settings, strategies as st

    from pulsar_message_filter_spark.operators.widen import (
        _MAX_ATTEMPTS,
        _RETRY_DELAY_MS,
        retry_topic_loop,
    )

    types = st.sampled_from(["click", "view", "purchase", "signup", "error"])
    msg = st.tuples(
        st.integers(0, 10_000),            # second offset for ts
        st.integers(0, 500),               # user_id
        types,
        st.floats(0.01, 400.0, allow_nan=False),
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(msg, min_size=1, max_size=25))
    def check(msgs):
        rows = [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
             u, t, round(float(v), 2), "{}")
            for i, (s, u, t, v) in enumerate(msgs)
        ]
        out = {r.event_id: r for r in retry_topic_loop(_msgs(spark, rows)).collect()}
        assert len(out) == len(rows)  # conservation
        for i, (_s, _u, t, v) in enumerate(msgs):
            r = out[i]
            v = round(float(v), 2)
            base_ms = int(
                rows[i][1].replace(tzinfo=datetime.timezone.utc).timestamp() * 1000
            )
            assert 1 <= r.n_deliveries <= _MAX_ATTEMPTS
            assert r.final_visible_ms == base_ms + (r.n_deliveries - 1) * _RETRY_DELAY_MS
            if v > 120:
                assert (r.final_verdict, r.n_deliveries) == ("ACCEPT", 1)
            elif t == "view":
                assert (r.final_verdict, r.n_deliveries) == ("ACCEPT", 3)
            elif t == "click":
                assert (r.final_verdict, r.n_deliveries) == ("DLQ", _MAX_ATTEMPTS)
            else:
                assert (r.final_verdict, r.n_deliveries) == ("REJECT", 1)

    check()


def test_real_resize_covers_gif_and_both_jpeg_modes():
    """The resize_stub docstring claims the real path covers every format
    decode_pixels handles — pin GIF and both JPEG modes: the resized
    payload must equal nearest-neighbor sampling of the full decode."""
    import numpy as np
    import pandas as pd

    from pulsar_message_filter_spark.operators.jpeg import decode_jpeg_pixels
    from pulsar_message_filter_spark.operators.multimodal import (
        _synth_jpeg_const,
        decode_pixels,
        resize_stub,
        synth_gif,
    )

    cases = [
        ("a.gif", synth_gif(19, 11, seed=6)),
        ("seq.jpg", _synth_jpeg_const(20, 12, 200)),
        ("prog.jpg", _synth_jpeg_const(20, 12, 200, progressive=True)),
    ]
    for name, src in cases:
        [out] = list(
            resize_stub(
                iter([pd.DataFrame({"path": [name], "content": [src]})]),
                width=5, height=4, real_decode=True,
            )
        )
        img = decode_pixels(src)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        ys = (np.arange(4) * img.shape[0]) // 4
        xs = (np.arange(5) * img.shape[1]) // 5
        assert bytes(out["pixels"][0]) == img[ys][:, xs].tobytes(), name
        assert bool(out["decoded"][0]) is True, name
    # sanity: the two JPEG modes resize to the SAME payload (bit-identical
    # coefficient pipeline)
    _, seq = cases[1]
    _, prog = cases[2]
    assert np.array_equal(decode_jpeg_pixels(seq), decode_jpeg_pixels(prog))
