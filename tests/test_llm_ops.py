"""F-series operator tests: ground-truth properties the oracle can't grade
(MinHash recall vs exact Jaccard, LSH top-k recall vs brute force, stubbed
multimodal decode plumbing) — SURVEY.md §7.4.8/.10.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.dedup import (
    dedup_exact,
    minhash_near_dups,
    simhash64,
)
from pulsar_message_filter_spark.operators.multimodal import binary_features, decode_stub
from pulsar_message_filter_spark.operators.similarity import brute_topk, lsh_topk
from tests.conftest import SF_SMOKE


def test_dedup_exact_removes_synthetic_dups(spark):
    docs = load(spark, "documents", SF_SMOKE).limit(50)
    # duplicate every doc with a shifted id and noisy casing/whitespace
    dups = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit(" ")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    both = docs.unionByName(dups)
    kept = dedup_exact(both, "text", "doc_id")
    assert kept.count() == 50
    # keep-first: all surviving ids are the original (lower) ones
    assert kept.filter(F.col("doc_id") >= 10_000).count() == 0


def test_minhash_recall_vs_exact_jaccard(spark):
    """Every pair with true Jaccard ≥ 0.9 must be found by MinHash-LSH
    (high-similarity recall is the property banding is tuned for)."""
    docs = load(spark, "documents", SF_SMOKE).limit(120)
    dups = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(dups)  # 120 guaranteed jaccard-1.0 pairs
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(corpus, "text", "doc_id", threshold=0.9).collect()
    }
    expected = {(r.doc_id, r.doc_id + 10_000) for r in docs.select("doc_id").collect()}
    recall = len(found & expected) / len(expected)
    assert recall >= 0.95, f"minhash recall too low: {recall}"
    # and the exact re-check keeps precision at 1.0 for the found pairs
    assert all(pair in expected or pair[0] < pair[1] for pair in found)


def test_minhash_estimate_prefilter_matches_exact_recheck(spark):
    """The signature-estimate stage-1 cut must not change the final pair set
    on a near-dup corpus (exact dups have identical signatures → est 1.0)."""
    docs = load(spark, "documents", SF_SMOKE).limit(80)
    dups = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(dups)
    two_stage = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(corpus, "text", "doc_id", threshold=0.8).collect()
    }
    exact_only = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(
            corpus, "text", "doc_id", threshold=0.8, estimate_first=False
        ).collect()
    }
    assert two_stage == exact_only and len(two_stage) >= 80


def test_choose_banding_analytics():
    """The auto-tuner's (n_perm, n_bands) must meet the recall target
    analytically, cost more permutations at lower thresholds, and keep the
    S-curve steep (few false candidates at threshold/2)."""
    from pulsar_message_filter_spark.operators.dedup import (
        candidate_probability,
        choose_banding,
    )

    n8, b8 = choose_banding(0.8, target_recall=0.95)
    assert n8 % b8 == 0
    assert candidate_probability(0.8, n8 // b8, b8) >= 0.95
    n5, b5 = choose_banding(0.5, target_recall=0.95)
    assert candidate_probability(0.5, n5 // b5, b5) >= 0.95
    assert n5 > n8, "lower threshold must cost more permutations"
    # the max_fp bound keeps the S-curve steep at half the threshold
    assert candidate_probability(0.25, n5 // b5, b5) <= 0.2
    assert candidate_probability(0.4, n8 // b8, b8) <= 0.2
    assert n8 // b8 > 1, "fp bound must forbid the degenerate 1-row bands"
    with pytest.raises(ValueError):
        choose_banding(1.5)
    with pytest.raises(ValueError):
        choose_banding(0.8, target_recall=0.0)
    with pytest.raises(ValueError):  # infeasible fp budget within max_perm
        choose_banding(0.5, target_recall=0.95, max_fp=0.01)


def test_minhash_auto_tuned_low_threshold_recall(spark):
    """target_recall auto-banding: at threshold 0.5 (where the (16,4) default
    S-curve only catches ~23% of pairs) the tuned banding must recover ≥90%
    of the synthetic moderate-similarity pairs.  Those are made by keeping a
    60% token *prefix* of each doc — prefix cutting preserves contiguous
    shingles, so both the shingle-space candidate step and the token-space
    exact re-check see ≈0.6 Jaccard (template cross-pairs that share tokens
    in a different order are out of MinHash's similarity space by design)."""
    docs = load(spark, "documents", SF_SMOKE).limit(60)
    partial = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, "
            "greatest(1, cast(size(split(text, ' ')) * 0.6 AS INT))))"
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(partial)
    toks = corpus.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("t")
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    above_threshold = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.5)
        .select("id_a", "id_b")
        .collect()
    }
    # ground truth = the synthetic prefix pairs that really land ≥ 0.5
    expected = {p for p in above_threshold if p[1] == p[0] + 10_000}
    assert len(expected) >= 30
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(
            corpus, "text", "doc_id", threshold=0.5, target_recall=0.95
        ).collect()
    }
    assert found <= above_threshold, "exact re-check must keep precision at 1.0"
    recall = len(found & expected) / len(expected)
    assert recall >= 0.9, f"auto-tuned minhash recall too low: {recall}"


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = load(spark, "embeddings", SF_SMOKE).filter(F.col("vec_id") < 200)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(emb, emb, k=1).filter(F.col("rank") == 1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, k=1, n_tables=8, planes_per_table=4)
        .filter(F.col("rank") == 1)
        .collect()
    }
    # nearest-neighbor recall of the OR-amplified bucketed path; random
    # gaussian corpora are the hard case (neighbors are weakly similar)
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.5, f"lsh nn recall too low: {recall}"


def test_ivf_topk_recall_vs_brute_force(spark):
    from pulsar_message_filter_spark.operators.similarity import ivf_topk

    emb = load(spark, "embeddings", SF_SMOKE).filter(F.col("vec_id") < 200)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(emb, emb, k=1).filter(F.col("rank") == 1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, k=1, n_cells=8, n_probe=4)
        .filter(F.col("rank") == 1)
        .collect()
    }
    # random gaussian corpora are the hard case for cell agreement; 8 cells /
    # 4 probes measured 0.69 NN-recall here (16/4 → 0.48: the IVF knob)
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.55, f"ivf nn recall too low: {recall}"


def test_ivf_recall_curve_and_auto_probe(spark):
    """The one-pass recall curve must be monotone, end at exactly 1.0
    (probing all cells reaches the whole corpus), agree with a directly
    measured ivf_topk recall at the chosen depth, and auto_probe must
    return the smallest depth meeting the target."""
    from pulsar_message_filter_spark.operators.similarity import (
        ivf_auto_probe,
        ivf_recall_curve,
        ivf_topk,
    )

    emb = load(spark, "embeddings", SF_SMOKE).filter(F.col("vec_id") < 200)
    sample = emb.filter(F.col("vec_id") < 40)
    k, n_cells = 5, 8
    curve = ivf_recall_curve(spark, emb, sample, k=k, n_cells=n_cells)
    recalls = [r for _, r in curve]
    assert len(curve) == n_cells
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0
    p, measured = ivf_auto_probe(
        spark, emb, sample, k=k, target_recall=0.8, n_cells=n_cells
    )
    assert measured >= 0.8
    assert all(r < 0.8 for _, r in curve[: p - 1]), "must be the smallest depth"
    # the curve's prediction matches a direct measurement at depth p
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(sample, emb, k=k).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, k=k, n_cells=n_cells, n_probe=p)
        .filter(F.col("query_id") < 40)
        .collect()
    }
    direct = len(truth & got) / len(truth)
    assert abs(direct - measured) < 0.02, (direct, measured)


def test_simhash_near_dup_small_hamming(spark):
    docs = load(spark, "documents", SF_SMOKE).limit(30)
    base = docs.select("doc_id", "text")
    # a near-dup: append one token — hamming distance should be small
    noisy = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    fp = {
        r.doc_id: r.sh
        for r in base.unionByName(noisy)
        .select("doc_id", simhash64(F.col("text")).alias("sh"))
        .collect()
    }
    hams = []
    for doc_id in list(fp):
        if doc_id < 10_000:
            hams.append(bin((fp[doc_id] ^ fp[doc_id + 10_000]) & (2**64 - 1)).count("1"))
    assert sum(hams) / len(hams) < 8, hams
    # unrelated docs should be far apart on average
    ids = sorted(k for k in fp if k < 10_000)
    far = [
        bin((fp[a] ^ fp[b]) & (2**64 - 1)).count("1")
        for a, b in zip(ids, ids[1:])
    ]
    assert sum(far) / len(far) > 16, far


def test_kmeans_lite_deterministic_and_nondegenerate(spark):
    from pulsar_message_filter_spark.operators.features import kmeans_lite

    emb = load(spark, "embeddings", SF_SMOKE)
    a = sorted(map(tuple, kmeans_lite(emb, k=8, iters=2).collect()))
    b = sorted(map(tuple, kmeans_lite(emb, k=8, iters=2).collect()))
    assert a == b  # seeded → same assignment every run
    clusters = {row[1] for row in a}
    assert len(clusters) >= 4  # not collapsed into a couple of cells
    assert all(row[2] >= 0 for row in a)  # dist² non-negative


def test_multimodal_stub_plumbing(spark):
    feats = binary_features(spark, f"{SF_SMOKE}/*.parquet").collect()
    assert len(feats) == 10
    assert all(r.magic == "PAR1" for r in feats)
    assert all(len(r.sha1) == 40 and r.byte_len > 0 for r in feats)
    # deterministic fake dimensions derive from content bytes
    assert all(r.fake_width == 1 + ord("P") for r in feats)
    assert all(r.media_kind == "opaque" for r in feats)  # PAR1 stays stubbed


def test_bmp_wav_header_decode_is_real(spark, tmp_path):
    """VERDICT r03 next round #6: BMP width/height and WAV sample-rate/
    channels must be REAL header parses (pure struct), asserted against
    hand-built fixtures with known values; other magics stay stubbed."""
    import struct

    # 7x3 24-bit BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    w, h = 7, 3
    row = (w * 3 + 3) // 4 * 4
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 14 + 40 + row * h, 0, 0, 54) + info
    bmp += b"\x00" * (row * h)
    (tmp_path / "img.bmp").write_bytes(bmp)

    # 16-bit mono 22050 Hz WAV with a LIST chunk BEFORE fmt (chunk walk)
    sr, ch = 22050, 1
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    body = b"WAVE" + list_chunk + b"fmt " + struct.pack("<I", 16) + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    (tmp_path / "clip.wav").write_bytes(wav)

    # PNG: 8-byte signature + IHDR chunk with int32-BE dimensions
    pw, ph = 640, 480
    ihdr = struct.pack(">IIBBBBB", pw, ph, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00" * 4  # crc (unchecked by the header parse)
    )
    (tmp_path / "pic.png").write_bytes(png)

    # GIF89a: 6-byte signature + uint16-LE logical screen dimensions
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    (tmp_path / "anim.gif").write_bytes(gif)

    feats = {r.path: r for r in binary_features(spark, str(tmp_path) + "/*").collect()}
    b = feats["img.bmp"]
    assert (b.media_kind, b.width, b.height) == ("bmp", 7, 3)
    assert b.sample_rate is None and b.n_channels is None
    a = feats["clip.wav"]
    assert (a.media_kind, a.sample_rate, a.n_channels) == ("wav", 22050, 1)
    assert a.width is None and a.height is None
    p = feats["pic.png"]
    assert (p.media_kind, p.width, p.height) == ("png", 640, 480)
    g = feats["anim.gif"]
    assert (g.media_kind, g.width, g.height) == ("gif", 320, 200)


def test_frame_sample_fanout_shape(spark):
    """1->N mapInPandas: each binary produces ceil(KiB/every_n) frame rows
    with exact payload slices and advancing timestamps."""
    from pulsar_message_filter_spark.operators.multimodal import (
        FRAME_STRIDE_MS,
        frame_samples,
    )

    src = f"{SF_SMOKE}/region.parquet"
    frames = frame_samples(spark, src, every_n=2).collect()
    n_bytes = len(open(src, "rb").read())
    n_frames_total = max(1, n_bytes // 1024)
    expected_kept = len(range(0, n_frames_total, 2))
    assert len(frames) == expected_kept
    by_idx = {r.frame_idx: r for r in frames}
    assert sorted(by_idx) == list(range(0, n_frames_total, 2))
    # payload = exact byte slice; timestamps advance one stride per frame
    raw = open(src, "rb").read()
    for idx, r in by_idx.items():
        assert bytes(r.frame_bytes) == raw[idx * 1024 : (idx + 1) * 1024]
        assert r.ts_ms == idx * FRAME_STRIDE_MS and r.frame_len == len(r.frame_bytes)


def test_resize_stub_rewrites_payload(spark):
    from pulsar_message_filter_spark.operators.multimodal import resize_stub

    raw = spark.read.format("binaryFile").load(f"{SF_SMOKE}/region.parquet").select(
        "path", "content"
    )
    out = raw.mapInPandas(
        lambda it: resize_stub(it, width=4, height=4),
        schema="path string, width int, height int, decoded boolean, pixels binary",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (4, 4) and len(r.pixels) == 16
    assert r.decoded is False  # stub payload convention, not RGB triplets
    assert bytes(r.pixels) == open(f"{SF_SMOKE}/region.parquet", "rb").read()[:16]


def test_numpy_topk_matches_jvm_brute_force(spark):
    """The Arrow/numpy matmul path must produce IDENTICAL top-k results to
    the pure-Column-algebra brute force (same rounding, same tiebreak)."""
    from pulsar_message_filter_spark.operators.similarity import numpy_topk

    emb = load(spark, "embeddings", SF_SMOKE)
    queries = emb.filter(F.col("vec_id") < 10)
    jvm = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_topk(queries, emb, k=5).collect()
    }
    np_path = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in numpy_topk(spark, queries, emb, k=5).collect()
    }
    assert jvm == np_path and len(jvm) == 50


def test_hash_sample_is_engine_portable_and_stable(spark):
    """Content-hash sampling: same rows every run, fraction ≈ threshold/256,
    and DuckDB selects the exact same ids (the portability claim)."""
    import duckdb

    from pulsar_message_filter_spark.operators.sampling import hash_sample

    orders = load(spark, "orders", SF_SMOKE)
    ids1 = {r.o_orderkey for r in hash_sample(orders, "o_orderkey", "0d").collect()}
    ids2 = {r.o_orderkey for r in hash_sample(orders, "o_orderkey", "0d").collect()}
    assert ids1 == ids2 and 0.02 < len(ids1) / orders.count() < 0.09
    duck = {
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT o_orderkey FROM read_parquet('{SF_SMOKE}/orders.parquet') "
            "WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'"
        )
        .fetchall()
    }
    assert ids1 == duck


def test_stratified_sample_proportions(spark):
    from pulsar_message_filter_spark.operators.sampling import sample_stratified

    orders = load(spark, "orders", SF_SMOKE)
    totals = {r.o_orderstatus: r["count"] for r in orders.groupBy("o_orderstatus").count().collect()}
    got = {
        r.o_orderstatus: r["count"]
        for r in sample_stratified(spark, SF_SMOKE).groupBy("o_orderstatus").count().collect()
    }
    for status, frac in (("F", 0.10), ("O", 0.05), ("P", 0.50)):
        observed = got.get(status, 0) / totals[status]
        assert abs(observed - frac) < 0.6 * frac + 0.02, (status, observed, frac)
    # determinism: the hash selection is identical across materializations
    ids_a = sorted(r.o_orderkey for r in sample_stratified(spark, SF_SMOKE).collect())
    ids_b = sorted(r.o_orderkey for r in sample_stratified(spark, SF_SMOKE).collect())
    assert ids_a == ids_b
    # the RNG sampleBy API (engine-specific selection, hence not the graded
    # query) hits the same per-stratum fractions
    rng = {
        r.o_orderstatus: r["count"]
        for r in orders.sampleBy(
            "o_orderstatus", fractions={"F": 0.10, "O": 0.05, "P": 0.50}, seed=42
        ).groupBy("o_orderstatus").count().collect()
    }
    for status, frac in (("F", 0.10), ("O", 0.05), ("P", 0.50)):
        observed = rng.get(status, 0) / totals[status]
        assert abs(observed - frac) < 0.6 * frac + 0.02, (status, observed, frac)


def test_real_decode_paths_are_gated(spark):
    """The codec-requiring extension points must raise, not silently fake,
    when real decoding is requested.  (BMP/WAV full decode is REAL as of
    round 10, PNG and GIF as of round 11, baseline JPEG as of round 12 —
    see test_round10/11_ops.py and test_jpeg.py — so only video frames
    and the non-baseline JPEG modes remain codec-gated.)"""
    from pulsar_message_filter_spark.operators.multimodal import (
        decode_pixels,
        frame_sample_stub,
    )

    import pandas as pd

    batch = iter([pd.DataFrame({"path": ["x"], "content": [b"abc"]})])
    with pytest.raises(NotImplementedError):
        list(frame_sample_stub(batch, real_decode=True))
    with pytest.raises(NotImplementedError):
        list(decode_stub(batch, real_decode=True))
    # JPEG/PNG/GIF are no longer gated: garbage after a valid signature is
    # a malformed file (ValueError), not a missing codec
    for sig in (b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a"):
        with pytest.raises(ValueError):
            decode_pixels(sig + b"\x00" * 32)


def test_multimodal_real_decode_is_marked_todo():
    with pytest.raises(NotImplementedError):
        next(decode_stub(iter([]), real_decode=True))


def test_training_mixture_proportions(spark):
    """f16: achieved mixture tracks the target weights; the binding stratum
    (zh at these fixtures) is kept whole; selection is deterministic."""
    from pulsar_message_filter_spark.operators.mixture import (
        DEFAULT_TARGETS,
        build_training_mixture,
        mixture_rates,
    )

    docs = load(spark, "documents", SF_SMOKE)
    rates = {r.lang: r.rate for r in mixture_rates(docs, "lang", DEFAULT_TARGETS).collect()}
    assert rates["zh"] >= 0.999  # binding stratum
    assert all(0.0 < v <= 1.0 for v in rates.values())

    picked = build_training_mixture(docs, "lang", DEFAULT_TARGETS)
    got = {r.lang: r["count"] for r in picked.groupBy("lang").count().collect()}
    total = sum(got.values())
    n_zh = docs.filter("lang = 'zh'").count()
    assert got["zh"] == n_zh  # kept whole, not shaved by the hex threshold
    for lang, t in DEFAULT_TARGETS.items():
        achieved = got.get(lang, 0) / total
        # hash granularity + small strata: generous but shape-preserving tol
        assert abs(achieved - t) < 0.5 * t + 0.03, (lang, achieved, t)
    ids_a = sorted(r.doc_id for r in picked.select("doc_id").collect())
    ids_b = sorted(
        r.doc_id
        for r in build_training_mixture(docs, "lang", DEFAULT_TARGETS)
        .select("doc_id")
        .collect()
    )
    assert ids_a == ids_b


def test_minhash_dedup_incremental(spark, tmp_path):
    """Incremental dedup: batch 2's near-copies of batch-1 docs are dropped
    against the persisted signature store; fresh docs survive and extend it."""
    from pulsar_message_filter_spark.operators.dedup import (
        minhash_dedup_incremental,
    )

    store = str(tmp_path / "sigs")
    docs = load(spark, "documents", SF_SMOKE)
    batch1 = docs.filter(F.col("doc_id") < 40)
    # batch 1 contains one internal exact dup (id 10_001 copies id 1)
    dup_in_b1 = batch1.filter(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    kept1 = minhash_dedup_incremental(batch1.unionByName(dup_in_b1), store)
    # 41 in, minus the synthetic dup AND the fixture's own 8≡12 pair
    assert kept1.count() == 39
    assert kept1.filter(F.col("doc_id").isin(10_001, 12)).count() == 0

    # batch 2: 10 exact copies of batch-1 docs (shifted ids) + 10 fresh docs
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    fresh = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 70))
    kept2 = minhash_dedup_incremental(copies.unionByName(fresh), store)
    ids2 = sorted(r.doc_id for r in kept2.select("doc_id").collect())
    assert ids2 == list(range(60, 70)), ids2  # all copies dropped vs history

    # the store accumulated signatures for every survivor
    n_store = spark.read.parquet(store).select("doc").distinct().count()
    assert n_store == 49


def test_pack_sequences_budget_property(spark):
    """f17: within every pack, the tokens *before* the last doc fit the
    budget (greedy fill overflows by at most the straddling doc), packs are
    contiguous in id order per bucket, and the assignment is deterministic."""
    from pulsar_message_filter_spark.operators.mixture import pack_sequences

    docs = load(spark, "documents", SF_SMOKE)
    packed = pack_sequences(docs, budget=1024, n_buckets=32)
    rows = packed.collect()
    by_pack: dict[tuple, list] = {}
    for r in rows:
        by_pack.setdefault((r.bucket, r.pack_id), []).append(r)
    assert len(by_pack) > 10
    for (_, _), members in by_pack.items():
        members.sort(key=lambda r: r.doc_id)
        # exclusive prefix within the pack stays under budget
        run = 0
        for m in members[:-1]:
            run += m.n_tokens
        assert run < 1024 + members[-1].n_tokens
        # all but the straddler fit: total minus last < budget
        assert sum(m.n_tokens for m in members[:-1]) < 1024
    again = pack_sequences(docs, budget=1024, n_buckets=32).collect()
    assert sorted((r.doc_id, r.pack_id) for r in again) == sorted(
        (r.doc_id, r.pack_id) for r in rows
    )


def test_connected_components_transitivity(spark):
    """A≈B and B≈C collapse into one cluster even with no A≈C edge;
    disjoint components keep distinct labels; chain depth converges."""
    from pulsar_message_filter_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # component 1: chain 1-2-3-4 (no shortcut edges)
        [(1, 2), (2, 3), (3, 4),
         # component 2: clique-ish 10-11, 10-12
         (10, 11), (10, 12),
         # component 3: single edge
         (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # a long chain still converges (min label walks one hop per round, the
    # iteration bound must cover the diameter)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 115)], "id_a bigint, id_b bigint"
    )
    labels = {r.node: r.cluster_id for r in connected_components(chain).collect()}
    assert set(labels.values()) == {100}


def test_connected_components_shortcut_equivalence(spark):
    """Pointer-jump shortcutting changes ROUNDS, never labels: identical
    output to plain propagation on a mixed graph, and O(log diameter)
    iterations on a long chain (a 60-chain converges in <=10 rounds where
    plain needs ~60 — and would silently mislabel under the default
    20-round rail)."""
    import random

    from pulsar_message_filter_spark.operators.dedup import connected_components

    rng = random.Random(7)
    # random graph: 120 nodes, 90 edges → many components of varied shape
    edges = {(a, b) for a, b in (
        sorted(rng.sample(range(120), 2)) for _ in range(90)
    )}
    pairs = spark.createDataFrame(
        sorted(edges), "id_a bigint, id_b bigint"
    )
    fast = {r.node: r.cluster_id
            for r in connected_components(pairs, shortcut=True).collect()}
    slow = {r.node: r.cluster_id
            for r in connected_components(pairs, max_iterations=200,
                                          shortcut=False).collect()}
    assert fast == slow

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(500, 560)], "id_a bigint, id_b bigint"
    )
    stats: dict = {}
    labels = connected_components(chain, stats=stats).collect()
    assert {r.cluster_id for r in labels} == {500}
    assert stats["iterations"] <= 10, stats


def test_dedup_near_collapses_transitive_chains(spark):
    """dedup_near keeps exactly one survivor per near-dup component, even
    when the duplicate relation is only transitively connected."""
    from pulsar_message_filter_spark.operators.dedup import dedup_near

    docs = load(spark, "documents", SF_SMOKE).filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 90)
    )
    # two extra exact copies of doc 60 under new ids: component {60, a, b}
    extra = docs.filter(F.col("doc_id") == 60)
    chain = extra.select((F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang", "source", "n_chars").unionByName(
        extra.select((F.col("doc_id") + 20_000).alias("doc_id"), "text", "lang", "source", "n_chars")
    )
    kept = dedup_near(docs.unionByName(chain), threshold=0.8)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert 60 in ids and 10_060 not in ids and 20_060 not in ids
    assert len(ids) == 30  # fresh range 60..89 has no internal near-dups


def test_int8_topk_recall_vs_brute_force(spark):
    """f21: int8-quantized scoring with exact rerank must recover the true
    nearest neighbor for ≥90% of queries, and the approximate cosine must
    sit within quantization error of the exact one."""
    from pulsar_message_filter_spark.operators.similarity import (
        brute_topk,
        int8_cosine,
        int8_topk,
        quantize_int8,
    )

    emb = load(spark, "embeddings", SF_SMOKE).filter(F.col("vec_id") < 200)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(emb, emb, k=1).filter(F.col("rank") == 1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in int8_topk(emb, emb, k=1).filter(F.col("rank") == 1).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.9, f"int8+rerank nn recall too low: {recall}"

    # quantization error bound: |approx - exact| small on random pairs
    a = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"),
        quantize_int8(F.col("embedding")).alias("qa"),
    )
    b = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20)).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"),
        quantize_int8(F.col("embedding")).alias("qb"),
    )
    from pulsar_message_filter_spark.operators.similarity import cosine

    errs = (
        a.crossJoin(b)
        .select(
            (F.abs(int8_cosine(F.col("qa"), F.col("qb"))
                   - cosine(F.col("ea"), F.col("eb")))).alias("err")
        )
        .agg(F.max("err").alias("m"))
        .collect()[0]["m"]
    )
    assert errs < 0.02, f"int8 cosine error too large: {errs}"


def test_quality_weighted_keep_rates_track_quality(spark):
    """Sources with higher quality-pass rates must keep proportionally more."""
    from pulsar_message_filter_spark.operators.mixture import (
        f32_quality_weighted_keep,
        md5_byte,
    )
    from tests.conftest import SF_SMOKE

    kept = {r.source: r.n_kept for r in f32_quality_weighted_keep(spark, SF_SMOKE).collect()}
    docs = load(spark, "documents", SF_SMOKE)
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # keep fraction can never exceed the quality-pass rate ceiling (thr/256)
    for src, n in kept.items():
        assert 0 < n <= totals[src]
    # determinism: md5_byte is stable and in range
    vals = [r.b for r in docs.select(md5_byte("doc_id").alias("b")).collect()]
    assert all(0 <= v <= 255 for v in vals)


def test_bloom_filter_no_false_negatives_and_low_fp(spark):
    import numpy as np

    from pulsar_message_filter_spark.operators.dedup import (
        bloom_build,
        bloom_maybe_contains,
    )

    members = spark.range(0, 2000).select(F.xxhash64("id").alias("h"))
    filt = bloom_build(members, "h")
    maybe = bloom_maybe_contains(filt)
    # every inserted key tests positive
    hits = members.withColumn("m", maybe(F.col("h"))).filter(~F.col("m")).count()
    assert hits == 0
    # non-members: fp rate well under 1% at 2^20 bits / 2000 keys
    others = spark.range(1_000_000, 1_010_000).select(F.xxhash64("id").alias("h"))
    fps = others.withColumn("m", maybe(F.col("h"))).filter(F.col("m")).count()
    assert fps < 100


def test_bloom_dedup_matches_exact_anti_join(spark):
    from pulsar_message_filter_spark.operators.dedup import (
        bloom_dedup_incremental,
        canonical_text,
    )

    docs = load(spark, "documents", SF_SMOKE)
    history = docs.filter(F.col("doc_id") % 2 == 0)
    # odd-id batch plus exact copies of two history docs under fresh ids —
    # guarantees the dup path fires regardless of fixture content
    copies = history.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 90_001).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(copies)
    got = {r.doc_id for r in bloom_dedup_incremental(batch, history).collect()}
    hist_keys = history.select(
        canonical_text(F.col("text")).alias("__canon")
    ).distinct()
    want = {
        r.doc_id
        for r in batch.withColumn("__canon", canonical_text(F.col("text")))
        .join(hist_keys, "__canon", "left_anti")
        .collect()
    }
    assert got == want
    assert len(want) < batch.count()  # the planted copies were removed
    assert not any(d > 90_000 for d in got)


def test_token_entropy_known_values(spark):
    from pulsar_message_filter_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in token_entropy(df).collect()}
    assert rows[1].entropy_nats == 0.0  # single repeated token
    import math

    assert abs(rows[2].entropy_nats - round(math.log(4), 6)) < 1e-9  # uniform
    assert abs(rows[3].entropy_nats - round(math.log(2), 6)) < 1e-9
    assert rows[2].n_distinct_tokens == 4 and rows[1].n_tokens == 4


def test_winsorize_clips_to_group_percentiles(spark):
    from pulsar_message_filter_spark.operators.features import winsorize

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 101)] + [("a", 100000)],
        ["g", "v"],
    )
    out = winsorize(df, F.col("v"), "g")
    top = out.agg(F.max("_clipped"), F.min("_clipped")).collect()[0]
    # the 100000 outlier is pulled down to p95; minimum clipped up to p05
    assert top[0] <= 96 and top[1] >= 5
    # clip bounds are integers => sums stay exact int64
    assert dict(out.dtypes)["_clipped"] == "bigint"


def test_quantile_bins_equal_frequency(spark):
    from pulsar_message_filter_spark.operators.features import (
        feature_quantile_bins,
    )

    rows = feature_quantile_bins(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, bins in by_type.items():
        assert {b.quartile for b in bins} == {1, 2, 3, 4}
        sizes = [b.n for b in bins]
        assert max(sizes) - min(sizes) <= 1, f"{t}: ntile must balance bins"
        ordered = sorted(bins, key=lambda b: b.quartile)
        for lo, hi in zip(ordered, ordered[1:]):
            assert lo.max_cents <= hi.min_cents  # bins tile the value range


def test_map_in_arrow_matches_map_in_pandas(spark):
    from pulsar_message_filter_spark.operators.udf_surface import (
        g5_map_in_pandas,
        g5b_map_in_arrow,
    )

    arrow = {r.doc_id: r.n_tokens for r in g5b_map_in_arrow(spark, SF_SMOKE).collect()}
    pandas_ = {r.doc_id: r.n_tokens for r in g5_map_in_pandas(spark, SF_SMOKE).collect()}
    assert arrow == pandas_


def test_pagerank_lite_mass_and_hub_ordering(spark):
    from pulsar_message_filter_spark.operators.dedup import pagerank_lite

    # star graph: hub 0 connected to 1..6, plus an isolated pair 10-11
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(10, 11)], ["id_a", "id_b"]
    )
    rows = pagerank_lite(pairs, iters=10).collect()
    ranks = {r.node: r.rank for r in rows}
    assert abs(sum(ranks.values()) - len(ranks)) < 1e-6  # mass conserved
    assert ranks[0] > max(ranks[i] for i in range(1, 7))  # hub dominates
    assert abs(ranks[10] - ranks[11]) < 1e-9  # symmetric pair ties


def test_pagerank_lite_int_tracks_float_twin(spark):
    """The integer-scaled PageRank (the oracle-checkable graded form) must
    agree with the float fixpoint to the 1e-9 quantization on a known
    graph, preserve hub ordering, and conserve (scaled) rank mass."""
    from pulsar_message_filter_spark.operators.dedup import (
        pagerank_lite,
        pagerank_lite_int,
    )

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(10, 11)], ["id_a", "id_b"]
    )
    f = {r.node: r.rank for r in pagerank_lite(pairs, iters=5).collect()}
    i = {r.node: r.rank_scaled for r in pagerank_lite_int(pairs, iters=5).collect()}
    assert set(f) == set(i)
    for n in f:
        # floor-division quantization: <= iters*(deg+1) ulps of 1e-9
        assert abs(i[n] / 1e9 - f[n]) < 1e-6, (n, i[n], f[n])
    assert i[0] > max(i[k] for k in range(1, 7))  # hub dominates, exactly
    assert i[10] == i[11]  # symmetric pair ties EXACTLY in integer math


def test_containment_lsh_path_finds_planted_prefix_pairs(spark):
    """The candidate-bounded containment path must recover >=90% of planted
    prefix-inside-document pairs (containment 1.0, Jaccard ~0.6) and keep
    precision 1.0 vs the exact recheck threshold."""
    from pulsar_message_filter_spark.operators.dedup import containment_pairs

    docs = load(spark, "documents", SF_SMOKE).limit(50)
    prefixes = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, "
            "greatest(3, cast(size(split(text, ' ')) * 0.6 AS INT))))"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(prefixes)
    found = {
        (r.id_small, r.id_big)
        for r in containment_pairs(corpus, threshold=0.95).collect()
    }
    expected = {
        (r.doc_id + 10_000, r.doc_id) for r in docs.select("doc_id").collect()
    }
    recall = len(found & expected) / len(expected)
    assert recall >= 0.9, f"containment recall too low: {recall}"
    # every emitted pair really meets the exact threshold (re-derived)
    for r in containment_pairs(corpus, threshold=0.95).collect():
        assert r.containment >= 0.95
        assert r.n_small >= 3
