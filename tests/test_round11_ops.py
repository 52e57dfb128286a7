"""Round-11 breadth ops: privacy audit, deterministic epoch shuffle."""

from conftest import SF_SMOKE


def test_k_anonymity_audit_semantics(spark):
    """Hand-built groups: sizes, l-diversity, and the k flag are exact."""
    from pulsar_message_filter_spark.operators.scrub import k_anonymity_audit

    rows = [
        # QI group (1, 'a'): 3 records, 2 distinct sensitive values
        (1, "a", 100.0), (1, "a", 100.0), (1, "a", 200.0),
        # QI group (2, 'b'): 1 record → not k-anonymous at k=2
        (2, "b", 300.0),
    ]
    df = spark.createDataFrame(rows, "qi1 int, qi2 string, sens double")
    got = {
        (r.qi1, r.qi2): r
        for r in k_anonymity_audit(df, ["qi1", "qi2"], "sens", k=2).collect()
    }
    assert got[(1, "a")].group_n == 3
    assert got[(1, "a")].l_diversity == 2
    assert got[(1, "a")].k_anonymous == 1
    assert got[(2, "b")].group_n == 1
    assert got[(2, "b")].k_anonymous == 0


def test_epoch_shuffle_is_reproducible_permutation(spark):
    """Same epoch → identical order; different epoch → different order;
    positions are a contiguous 1..n_shard permutation within every shard."""
    from pulsar_message_filter_spark.operators.mixture import epoch_shuffle

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    n = docs.count()

    a1 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 7).collect()}
    a2 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 7).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 8).collect()}
    assert a1 == a2  # replay-deterministic
    assert a1 != b  # a new epoch is a new permutation
    assert len(a1) == n

    by_shard: dict = {}
    for shard, pos in a1.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # shards are reasonably balanced (hash-uniform): no shard > 2x mean
    mean = n / len(by_shard)
    assert all(len(ps) <= 2 * mean for ps in by_shard.values())


def test_epoch_shuffle_matches_writer_path(spark):
    """The graded window form and the scale writer path
    (repartition(shard) + sortWithinPartitions) produce the same in-shard
    order — the claim in the docstring is executable."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.mixture import epoch_shuffle

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    ranked = epoch_shuffle(docs, "doc_id", epoch=3)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("e3:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    writer = (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", F.col("h") % 8)
        .repartition("shard")
        .sortWithinPartitions("h", "doc_id")
    )
    # within each partition the writer order must equal the pos order
    per_shard_writer = {}
    for row in writer.collect():  # sf0.001: tiny
        per_shard_writer.setdefault(row.shard, []).append(row.doc_id)
    per_shard_ranked = {}
    for row in ranked.orderBy("shard", "pos").collect():
        per_shard_ranked.setdefault(row.shard, []).append(row.doc_id)
    # writer.collect() preserves within-partition order per shard because
    # each shard is one partition after repartition("shard")... but two
    # shards may share a partition; group by shard instead of partition
    assert per_shard_writer.keys() == per_shard_ranked.keys()
    for s in per_shard_ranked:
        assert per_shard_writer[s] == per_shard_ranked[s], s


def test_audio_frame_features_closed_form(spark):
    """The windowed DSP features match an independent numpy recomputation
    from the synth_wav closed form, the poison row vanishes, and frame
    counts follow the full-frames-only rule."""
    import numpy as np

    from pulsar_message_filter_spark.registry import all_graded

    rows = [
        r.asDict()
        for r in all_graded()["f12d_audio_frames"].fn(spark, SF_SMOKE).collect()
    ]
    assert not any(r["path"] == "poison.wav" for r in rows)

    def expected(n, n_ch, frame=256, hop=128):
        i, ch = np.mgrid[0:n, 0:n_ch]
        vals = ((0 + i * 31 + ch * 17) % 200 - 100).astype(np.float64)
        mono = vals.mean(axis=1)
        wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
        return wins

    for name, n, n_ch in (
        ("tone_16bit.wav", 4000, 2),
        ("tone_8bit.wav", 1500, 1),
        ("tone_32bit.wav", 900, 3),
    ):
        wins = expected(n, n_ch)
        got = sorted(
            (r for r in rows if r["path"] == name), key=lambda r: r["frame_idx"]
        )
        assert len(got) == wins.shape[0], name
        for i in (0, len(got) - 1):  # first and last frame, exact
            w = wins[i]
            assert abs(got[i]["rms"] - round(float(np.sqrt((w**2).mean())), 6)) < 1e-9
            zcr = float(
                (np.signbit(w[1:]) != np.signbit(w[:-1])).mean()
            )
            assert abs(got[i]["zcr"] - round(zcr, 6)) < 1e-9
            assert got[i]["peak"] == float(np.abs(w).max())


def test_cluster_survivors_semantics(spark):
    """Component survivor is the quality max (id tiebreak); every doc in
    the universe lands in exactly one cluster (members sum to universe)."""
    from pulsar_message_filter_spark.operators.dedup import cluster_survivors

    pairs = spark.createDataFrame(
        # chain 1-2-3 (transitive only), pair 10-11, singleton 20 (no edge)
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    quality = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 2.0), (20, 7.0)],
        "doc_id bigint, q double",
    )
    got = {r.cluster_id: r for r in cluster_survivors(pairs, quality, "doc_id", "q").collect()}
    assert got[1].survivor_id == 2  # q=9.0 tie between 2 and 3 → lower id
    assert got[1].survivor_q == 9.0 and got[1].n_members == 3
    assert got[10].survivor_id == 11 and got[10].n_members == 2
    assert 20 not in got  # singletons are the caller's concern (f73 unions them)

    from pulsar_message_filter_spark.registry import all_graded

    rows = all_graded()["f73_cluster_survivors"].fn(spark, SF_SMOKE).collect()
    n_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter("doc_id < 120")
        .count()
    )
    assert sum(r.n_members for r in rows) == n_docs
    assert len({r.cluster_id for r in rows}) == len(rows)


def test_audio_spectral_closed_form(spark):
    """Spectral descriptors match an independent numpy recomputation from
    the synth_wav closed form; poison emits nothing; centroid/rolloff stay
    inside the Nyquist band."""
    import numpy as np

    from pulsar_message_filter_spark.registry import all_graded

    rows = [
        r.asDict()
        for r in all_graded()["f12e_audio_spectral"].fn(spark, SF_SMOKE).collect()
    ]
    assert rows and not any(r["path"] == "poison.wav" for r in rows)

    frame, hop = 256, 128
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)

    def expected(n, n_ch, rate):
        i, ch = np.mgrid[0:n, 0:n_ch]
        mono = (((0 + i * 31 + ch * 17) % 200 - 100).astype(np.float64)).mean(axis=1)
        wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
        mag = np.abs(np.fft.rfft(wins * hann, axis=1))
        freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
        power = mag.sum(axis=1)
        centroid = (mag * freqs).sum(axis=1) / power
        return centroid, freqs

    for name, n, n_ch, rate in (
        ("tone_16bit.wav", 4000, 2, 8000),
        ("tone_8bit.wav", 1500, 1, 4000),
    ):
        centroid, freqs = expected(n, n_ch, rate)
        got = sorted(
            (r for r in rows if r["path"] == name), key=lambda r: r["frame_idx"]
        )
        assert len(got) == len(centroid), name
        nyquist = rate / 2
        for i in (0, len(got) - 1):
            assert abs(got[i]["centroid_hz"] - round(float(centroid[i]), 4)) < 1e-6
            assert 0 <= got[i]["rolloff_hz"] <= nyquist
            assert 0 <= got[i]["flatness"] <= 1.0
            assert got[i]["bandwidth_hz"] >= 0


def test_schema_evolution_read_nulls(spark):
    """mergeSchema materializes the union schema: pre-evolution rows carry
    NULL for columns the old writer never had, and no row is lost."""
    from pulsar_message_filter_spark.registry import all_graded

    rows = {r.lang: r for r in all_graded()["a_schema_evolution_read"].fn(spark, SF_SMOKE).collect()}
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_rows for r in rows.values()) == docs.count()
    for r in rows.values():
        # only gen-2 (doc_id % 3 == 0) rows carry the evolved columns
        assert r.n_with_source == r.n_scored <= r.n_rows
        if r.n_scored:
            assert r.min_quality is not None and r.max_quality >= r.min_quality
    assert any(r.n_scored < r.n_rows for r in rows.values())  # both gens present


def test_gif_decode_closed_form(spark):
    """GIF LZW decode is exact against the fixture's closed-form pixels —
    including repeated CLEAR codes and (separately probed) table growth —
    and the f12c graded corpus now carries a decodable GIF row."""
    import numpy as np

    from pulsar_message_filter_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_pixels,
        synth_gif,
    )
    from pulsar_message_filter_spark.registry import all_graded

    w, h, seed = 19, 11, 6
    img = decode_pixels(synth_gif(w, h, seed))
    y, x = np.mgrid[0:h, 0:w]
    want = ((seed + x * 7 + y * 13) % 256).astype(np.uint8)
    assert img.shape == (h, w, 3)
    for c in range(3):  # grayscale palette: all channels equal the index
        assert (img[:, :, c] == want).all()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_gif_pixels(b"GIF89a" + b"\x00" * 8)  # truncated poison

    rows = {
        r.path: r
        for r in all_graded()["f12c_media_stats"].fn(spark, SF_SMOKE).collect()
    }
    gif = rows["img_anim.gif"]
    assert gif.media_kind == "gif" and gif.decodable
    assert (gif.width, gif.height) == (w, h)
    mean = float(want.mean())
    assert gif.ch_means == ":".join(f"{mean:.4f}" for _ in range(3))


def test_gif_interlaced_decode():
    """The 4-pass interlace row reorder reconstructs the same image as the
    sequential encoding of the same pixels."""
    import numpy as np

    from pulsar_message_filter_spark.operators.multimodal import (
        decode_gif_pixels,
        synth_gif,
    )

    for (w, h, seed) in ((19, 11, 6), (8, 9, 2), (5, 1, 0)):
        inter = decode_gif_pixels(synth_gif(w, h, seed, interlaced=True))
        plain = decode_gif_pixels(synth_gif(w, h, seed))
        np.testing.assert_array_equal(inter, plain, err_msg=f"{w}x{h}")
        y, x = np.mgrid[0:h, 0:w]
        want = ((seed + x * 7 + y * 13) % 256).astype(np.uint8)
        np.testing.assert_array_equal(inter[:, :, 0], want)


def test_png_adam7_interlaced_decode():
    """Adam7: seven independently-filtered passes scatter back to the same
    image the sequential encoding produces — across color types, partial
    passes (odd sizes) and empty passes (tiny images)."""
    import numpy as np

    from pulsar_message_filter_spark.operators.multimodal import (
        decode_png_pixels,
        synth_png,
    )

    for (w, h, ct, seed) in (
        (21, 13, 2, 7), (9, 7, 6, 4), (15, 6, 3, 2), (16, 8, 0, 3),
        (1, 1, 2, 0), (2, 3, 2, 1), (7, 1, 2, 5), (1, 9, 2, 9),
    ):
        inter = decode_png_pixels(synth_png(w, h, color_type=ct, seed=seed, interlace=True))
        plain = decode_png_pixels(synth_png(w, h, color_type=ct, seed=seed))
        np.testing.assert_array_equal(inter, plain, err_msg=f"{w}x{h} ct{ct}")


def test_mel_filterbank_closed_form(spark):
    """Log-mel energies match an independent recomputation from the
    synth_wav closed form; filter triangles partition the mel axis (every
    interior rfft bin gets nonzero total weight); poison emits nothing."""
    import numpy as np

    from pulsar_message_filter_spark.operators.multimodal import mel_filterbank
    from pulsar_message_filter_spark.registry import all_graded

    fb = mel_filterbank(8, 256, 8000)
    assert fb.shape == (8, 129)
    assert (fb.sum(axis=0)[1:-1] > 0).all()  # interior bins covered

    rows = [
        r.asDict()
        for r in all_graded()["f12f_mel_filterbank"].fn(spark, SF_SMOKE).collect()
    ]
    assert rows and not any(r["path"] == "poison.wav" for r in rows)

    frame, hop = 256, 128
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    i, ch = np.mgrid[0:4000, 0:2]
    mono = (((0 + i * 31 + ch * 17) % 200 - 100).astype(np.float64)).mean(axis=1)
    wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
    mag = np.abs(np.fft.rfft(wins * hann, axis=1))
    want = np.log10(mag @ mel_filterbank(8, frame, 8000).T + 1e-10)
    got = sorted(
        (r for r in rows if r["path"] == "tone_16bit.wav"),
        key=lambda r: r["frame_idx"],
    )
    assert len(got) == wins.shape[0]
    for idx in (0, len(got) - 1):
        vals = [float(v) for v in got[idx]["logmel_csv"].split(",")]
        assert len(vals) == 8
        np.testing.assert_allclose(vals, np.round(want[idx], 4), atol=1e-9)


def test_poison_contract_covers_non_valueerror_failures(spark):
    """Malformed payloads whose failures are NOT ValueError — a WAV with a
    truncated fmt chunk (struct.error) and a GIF whose first post-clear
    code is out of table — must not kill any poison-tolerant stage."""
    import struct

    from pulsar_message_filter_spark.operators.multimodal import (
        AUDIO_FRAME_SCHEMA,
        MEDIA_STATS_SCHEMA,
        MEL_SCHEMA,
        audio_frame_features,
        media_stats,
        mel_frame_features,
        resize_stub,
        synth_wav,
    )

    # struct.error class: fmt chunk declared 16 bytes but file ends after 6
    bad_wav = (
        b"RIFF" + struct.pack("<I", 30) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00\x40\x1f"
    )
    # KeyError class: CLEAR then a code beyond the literal table
    bad_gif = bytearray(b"GIF89a") + struct.pack("<HH", 2, 2) + bytes([0x87, 0, 0])
    for i in range(256):
        bad_gif += bytes((i, i, i))
    bad_gif += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00" + bytes([8])
    word = (256) | (300 << 9)  # clear, then an out-of-table code
    payload = word.to_bytes(3, "little")
    bad_gif += bytes([len(payload)]) + payload + b"\x00\x3b"

    corpus = [
        ("bad.wav", bad_wav),
        ("bad.gif", bytes(bad_gif)),
        ("good.wav", synth_wav(600, n_channels=1, rate=4000, bits=16)),
    ]
    raw = spark.createDataFrame(corpus, "path string, content binary")

    stats = {r.path: r for r in raw.mapInPandas(media_stats, MEDIA_STATS_SCHEMA).collect()}
    assert not stats["bad.wav"].decodable and not stats["bad.gif"].decodable
    assert stats["good.wav"].decodable

    frames = raw.mapInPandas(audio_frame_features, AUDIO_FRAME_SCHEMA).collect()
    assert frames and all(r.path == "good.wav" for r in frames)
    mels = raw.mapInPandas(mel_frame_features, MEL_SCHEMA).collect()
    assert mels and all(r.path == "good.wav" for r in mels)
    resized = {
        r.path: r
        for r in raw.mapInPandas(
            lambda it: resize_stub(it, 2, 2, real_decode=True), 
            "path string, width int, height int, decoded boolean, pixels binary",
        ).collect()
    }
    assert not resized["bad.gif"].decoded  # fell back to the stub payload
