"""Round-10 additions: REAL BMP pixel / WAV PCM sample decode (F12 stub
retirement — VERDICT r05 next-round item 3).

Every pin recomputes the expected values from the fixture generators'
closed forms (pixel(x,y,c) = (seed+7x+13y+29c)%256; sample(i,ch) =
(seed+31i+17ch)%200-100) independently of the decoder under test.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pulsar_message_filter_spark.operators.multimodal import (
    decode_bmp_pixels,
    decode_pixels,
    decode_wav_samples,
    media_stats,
    resize_stub,
    synth_bmp,
    synth_wav,
)


def _expected_bmp(width: int, height: int, seed: int) -> np.ndarray:
    y, x = np.mgrid[0:height, 0:width]
    return np.stack(
        [(seed + x * 7 + y * 13 + c * 29) % 256 for c in range(3)], axis=-1
    ).astype("uint8")


def _expected_wav(n: int, ch: int, seed: int = 0) -> np.ndarray:
    i, c = np.mgrid[0:n, 0:ch]
    return (seed + i * 31 + c * 17) % 200 - 100


def test_bmp_24bpp_roundtrip_exact():
    # width 5 → 15-byte rows padded to 16: exercises the 4-byte stride
    img = decode_bmp_pixels(synth_bmp(5, 4, bpp=24, seed=3))
    assert img.shape == (4, 5, 3)
    np.testing.assert_array_equal(img, _expected_bmp(5, 4, 3))


def test_bmp_8bpp_palette_roundtrip():
    img = decode_bmp_pixels(synth_bmp(17, 9, bpp=8, seed=5))
    assert img.shape == (9, 17, 3)
    y, x = np.mgrid[0:9, 0:17]
    gray = ((5 + x * 7 + y * 13) % 256).astype("uint8")
    for c in range(3):  # grayscale palette: all channels equal the index
        np.testing.assert_array_equal(img[:, :, c], gray)


def test_bmp_top_down_negative_height():
    """A top-down BMP (negative height, rows stored first-row-first) must
    decode to the same image as its bottom-up twin."""
    b = bytearray(synth_bmp(6, 3, bpp=24, seed=1))
    (data_off,) = struct.unpack_from("<I", b, 10)
    height = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -height)
    stride = ((6 * 24 + 31) // 32) * 4
    rows = [bytes(b[data_off + r * stride : data_off + (r + 1) * stride]) for r in range(height)]
    b[data_off:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(
        decode_bmp_pixels(bytes(b)), _expected_bmp(6, 3, 1)
    )


def test_bmp_compressed_raises():
    b = bytearray(synth_bmp(4, 4))
    struct.pack_into("<I", b, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp_pixels(bytes(b))


def test_decode_pixels_dispatch():
    np.testing.assert_array_equal(
        decode_pixels(synth_bmp(4, 2, seed=9)), _expected_bmp(4, 2, 9)
    )
    with pytest.raises(ValueError):
        decode_pixels(b"PAR1not-an-image")


def _png():
    from pulsar_message_filter_spark.operators.multimodal import (
        decode_png_pixels,
        synth_png,
    )

    return decode_png_pixels, synth_png


def test_png_filter0_only_baseline():
    """Filter-0 fixture: pixels pass straight from zlib.decompress with NO
    filter arithmetic on either side — validates chunk walk, DEFLATE, and
    channel assembly independently of the filter implementations (so a
    canceling encoder/decoder filter bug cannot hide here)."""
    decode, synth = _png()
    img = decode(synth(7, 5, color_type=2, seed=11, filters=[0]))
    np.testing.assert_array_equal(img, _expected_bmp(7, 5, 11))


def test_png_each_filter_type_roundtrip():
    """Each scanline filter (Sub/Up/Average/Paeth) applied alone must
    reconstruct the same closed-form pixels as the filter-0 baseline."""
    decode, synth = _png()
    want = _expected_bmp(16, 8, 3)
    for ftype in (1, 2, 3, 4):
        np.testing.assert_array_equal(
            decode(synth(16, 8, color_type=2, seed=3, filters=[ftype])),
            want,
            err_msg=f"filter {ftype}",
        )
    # default fixture cycles all five filters across scanlines
    np.testing.assert_array_equal(
        decode(synth(16, 8, color_type=2, seed=3)), want
    )


def test_png_color_types_assemble_to_rgb():
    decode, synth = _png()
    # RGBA: alpha dropped
    np.testing.assert_array_equal(
        decode(synth(9, 7, color_type=6, seed=4)), _expected_bmp(9, 7, 4)
    )
    # gray + palette (grayscale table): all three channels equal the value
    y, x = np.mgrid[0:6, 0:15]
    gray = ((2 + x * 7 + y * 13) % 256).astype("uint8")
    for ct in (0, 3):
        img = decode(synth(15, 6, color_type=ct, seed=2))
        for c in range(3):
            np.testing.assert_array_equal(img[:, :, c], gray, err_msg=f"ct {ct}")


def test_png_gates_and_poison():
    decode, synth = _png()
    # invalid interlace method byte → malformed, not silently accepted
    b = bytearray(synth(4, 4))
    ihdr_off = bytes(b).index(b"IHDR")
    b[ihdr_off + 4 + 12] = 7  # interlace byte is last of the 13 IHDR fields
    with pytest.raises(ValueError):
        decode(bytes(b))
    # 16-bit depth → gated
    b2 = bytearray(synth(4, 4))
    off = bytes(b2).index(b"IHDR")
    b2[off + 4 + 8] = 16  # bit-depth byte
    with pytest.raises(NotImplementedError):
        decode(bytes(b2))
    # truncated IDAT → ValueError, never a crash elsewhere
    whole = synth(8, 8, seed=1)
    with pytest.raises(ValueError):
        decode(whole[: len(whole) // 2])


def test_wav_16bit_stereo_roundtrip_exact():
    samples, rate = decode_wav_samples(synth_wav(50, n_channels=2, rate=8000, bits=16))
    assert rate == 8000 and samples.shape == (50, 2)
    np.testing.assert_array_equal(samples, _expected_wav(50, 2))


def test_wav_8bit_unsigned_and_32bit():
    s8, _ = decode_wav_samples(synth_wav(20, n_channels=1, rate=4000, bits=8))
    np.testing.assert_array_equal(s8.astype("int32") - 128, _expected_wav(20, 1))
    s32, _ = decode_wav_samples(synth_wav(20, n_channels=3, rate=16000, bits=32))
    np.testing.assert_array_equal(s32, _expected_wav(20, 3))


def test_wav_float32_pcm():
    vals = np.array([0.5, -0.25, 1.0, 0.0], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", vals.nbytes) + vals.tobytes()
    b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = decode_wav_samples(b)
    np.testing.assert_array_equal(samples[:, 0], vals)


def test_wav_compressed_format_raises():
    b = bytearray(synth_wav(10, bits=16))
    struct.pack_into("<H", b, 20, 7)  # µ-law format code
    with pytest.raises(NotImplementedError):
        decode_wav_samples(bytes(b))


def test_real_bmp_resize_nearest_neighbor():
    import pandas as pd

    src = synth_bmp(8, 8, seed=2)
    [out] = list(
        resize_stub(
            iter([pd.DataFrame({"path": ["a.bmp"], "content": [src]})]),
            width=4, height=4, real_decode=True,
        )
    )
    img = _expected_bmp(8, 8, 2)
    idx = (np.arange(4) * 8) // 4
    expected = img[idx][:, idx].tobytes()
    assert bytes(out["pixels"][0]) == expected
    assert bool(out["decoded"][0]) is True  # RGB-triplet payload convention
    # undecodable content falls back to the deterministic stub payload,
    # flagged decoded=false so consumers can tell the conventions apart
    [fb] = list(
        resize_stub(
            iter([pd.DataFrame({"path": ["x.bin"], "content": [b"abc"]})]),
            width=2, height=2, real_decode=True,
        )
    )
    assert bytes(fb["pixels"][0]) == b"abc\x00"
    assert bool(fb["decoded"][0]) is False


def test_real_png_resize_nearest_neighbor():
    import pandas as pd

    from pulsar_message_filter_spark.operators.multimodal import synth_png

    src = synth_png(10, 6, color_type=2, seed=5)
    [out] = list(
        resize_stub(
            iter([pd.DataFrame({"path": ["a.png"], "content": [src]})]),
            width=5, height=3, real_decode=True,
        )
    )
    img = _expected_bmp(10, 6, 5)  # same closed-form pixels as the BMP fixture
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(5) * 10) // 5
    assert bytes(out["pixels"][0]) == img[ys][:, xs].tobytes()
    assert bool(out["decoded"][0]) is True


def test_f12c_media_stats_values(spark):
    """End-to-end graded query: decoded statistics match the closed forms."""
    from pulsar_message_filter_spark.registry import all_graded

    rows = {
        r["path"]: r.asDict()
        for r in all_graded()["f12c_media_stats"].fn(spark, "").collect()
    }
    assert len(rows) == 16  # +GIF/Adam7 (r11); +3 JPEGs + JPEG poison (r12)

    # the progressive JPEG carries the same constant tile: identical stats
    prog = rows["img_prog.jpg"]
    assert prog["decodable"] and prog["media_kind"] == "jpeg"
    assert prog["ch_means"] == "200.0000:200.0000:200.0000"
    assert (prog["width"], prog["height"]) == (20, 12)

    # constant-tile JPEGs decode pixel-exact (all AC = 0, DC divides the
    # Annex-K quant step) → closed-form means despite the lossy codec
    jpg = rows["img_420.jpg"]
    assert jpg["decodable"] and jpg["media_kind"] == "jpeg"
    assert (jpg["width"], jpg["height"], jpg["n_pixels"]) == (20, 12, 240)
    assert jpg["ch_means"] == "200.0000:200.0000:200.0000"
    assert jpg["px_min"] == 200 and jpg["px_max"] == 200
    gray = rows["img_gray.jpg"]
    assert gray["decodable"] and gray["media_kind"] == "jpeg"
    assert (gray["width"], gray["height"]) == (11, 7)
    assert gray["ch_means"] == "98.0000"
    poison_jpg = rows["poison.jpg"]  # flagged, never fatal
    assert poison_jpg["media_kind"] == "jpeg" and not poison_jpg["decodable"]

    png = rows["img_rgb.png"]
    pimg = _expected_bmp(21, 13, 7)  # PNG fixture shares the closed form
    assert png["decodable"] and png["media_kind"] == "png"
    assert (png["width"], png["height"], png["n_pixels"]) == (21, 13, 273)
    assert png["ch_means"] == ":".join(
        f"{m:.4f}" for m in pimg.reshape(-1, 3).mean(axis=0)
    )
    assert png["px_min"] == int(pimg.min()) and png["px_max"] == int(pimg.max())
    assert rows["img_rgba.png"]["decodable"]  # alpha dropped, RGB stats
    assert rows["img_pal.png"]["decodable"]  # PLTE-mapped indices
    # the Adam7 fixture is the same logical image as img_rgb.png: identical stats
    assert rows["img_adam7.png"]["ch_means"] == png["ch_means"]
    assert rows["img_adam7.png"]["decodable"]

    bmp = rows["img_24bpp.bmp"]
    img = _expected_bmp(32, 16, 3)
    assert bmp["decodable"] and bmp["media_kind"] == "bmp"
    assert (bmp["width"], bmp["height"], bmp["n_pixels"]) == (32, 16, 512)
    want_means = ":".join(f"{m:.4f}" for m in img.reshape(-1, 3).mean(axis=0))
    assert bmp["ch_means"] == want_means
    assert bmp["px_min"] == int(img.min()) and bmp["px_max"] == int(img.max())

    wav = rows["tone_16bit.wav"]
    s = _expected_wav(4000, 2).astype("float64")
    assert wav["decodable"] and wav["media_kind"] == "wav"
    assert (wav["sample_rate"], wav["n_channels"], wav["n_samples"]) == (8000, 2, 4000)
    assert wav["duration_ms"] == 500
    assert wav["audio_rms"] == pytest.approx(float(np.sqrt((s**2).mean())))
    assert wav["audio_peak"] == float(np.abs(s).max())

    wav8 = rows["tone_8bit.wav"]  # 8-bit path centers at 128 before RMS
    s8 = _expected_wav(1000, 1).astype("float64")
    assert wav8["audio_rms"] == pytest.approx(float(np.sqrt((s8**2).mean())))

    assert rows["poison.png"]["media_kind"] == "png" and not rows["poison.png"]["decodable"]
    assert rows["opaque.bin"]["media_kind"] == "opaque" and not rows["opaque.bin"]["decodable"]


def test_media_stats_poison_file_does_not_kill_batch():
    """A truncated BMP in the middle of a batch must yield decodable=false
    for that row, not raise — 100 TB corpora contain poison files."""
    import pandas as pd

    poison = synth_bmp(4, 4)[:30]  # valid magic, truncated header
    batch = pd.DataFrame(
        {"path": ["ok.bmp", "bad.bmp"], "content": [synth_bmp(4, 4), poison]}
    )
    [out] = list(media_stats(iter([batch])))
    assert list(out["decodable"]) == [True, False]


# ---------------------------------------------------------------------------
# A3/A5 Pulsar connector contract tests (VERDICT r05 item 4) — no broker:
# the readStream/writeStream option wiring is asserted via monkeypatched
# builders, and the schema mapping runs on a real static DataFrame shaped
# exactly like the public pulsar-spark connector's output frame.
# ---------------------------------------------------------------------------


class _SpyReader:
    """Stands in for DataStreamReader: records format + options, so the
    contract test pins exactly what a real connector would receive."""

    def __init__(self):
        self.fmt = None
        self.options = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self


def test_pulsar_reader_option_contract(monkeypatch):
    from types import SimpleNamespace

    from pulsar_message_filter_spark.sources import pulsar as ps

    spy = _SpyReader()
    spark_stub = SimpleNamespace(readStream=spy)
    out = ps.pulsar_stream_reader(
        spark_stub, "pulsar://broker:6650", "persistent://t/ns/events",
        admin_url="http://broker:8080", start="latest",
    )
    assert out is spy and spy.fmt == "pulsar"
    assert spy.options == {
        "service.url": "pulsar://broker:6650",
        "topics": "persistent://t/ns/events",
        "startingOffsets": "latest",
        "admin.url": "http://broker:8080",
    }
    # admin.url is optional — absent when not supplied
    spy2 = _SpyReader()
    ps.pulsar_stream_reader(SimpleNamespace(readStream=spy2), "pulsar://b:6650", "t")
    assert "admin.url" not in spy2.options
    assert spy2.options["startingOffsets"] == "earliest"


def test_pulsar_sink_option_contract():
    from types import SimpleNamespace

    from pulsar_message_filter_spark.sources import pulsar as ps

    spy = _SpyReader()  # same fluent surface as DataStreamWriter
    df_stub = SimpleNamespace(writeStream=spy)
    ps.pulsar_sink_writer(df_stub, "pulsar://broker:6650", "accepted")
    assert spy.fmt == "pulsar"
    assert spy.options == {"service.url": "pulsar://broker:6650", "topic": "accepted"}


def _connector_frame(spark, with_message_id=True):
    """A static frame with the public pulsar-spark connector's schema
    (key/value binary, topic string, properties map, publishTime/eventTime
    timestamps, messageId binary)."""
    import datetime

    t = datetime.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (b"user-1", b"payload-one", "persistent://t/ns/clicks",
         {"pri": "9", "src": "web"}, t, t, b"\x08\x01\x10\x02"),
        (b"user-2", b"pay2", "persistent://t/ns/views",
         {}, t, t, b"\x08\x01\x10\x03"),
        (None, b"", "persistent://t/ns/errs", None, t, t, b"\x08\x02\x10\x01"),
    ]
    schema = (
        "key binary, value binary, topic string, "
        "properties map<string,string>, publishTime timestamp, "
        "eventTime timestamp, messageId binary"
    )
    df = spark.createDataFrame(rows, schema)
    return df if with_message_id else df.drop("messageId")


def test_pulsar_normalize_maps_to_engine_message_schema(spark):
    """The normalized frame must be column-for-column the engine's message
    model (the events table schema) so every downstream operator —
    selectors, routing, windows — is connector-agnostic."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.sources.pulsar import normalize_pulsar_frame

    got = normalize_pulsar_frame(_connector_frame(spark))
    want = load(spark, "events", "/root/testdata/sf0.001")
    assert got.schema.simpleString() == want.schema.simpleString()

    rows = {r["event_type"]: r for r in got.collect()}
    r = rows["persistent://t/ns/views"]
    assert r["value"] == 4.0  # length of b"pay2"
    import json

    assert json.loads(rows["persistent://t/ns/clicks"]["props"]) == {
        "pri": "9", "src": "web",
    }


def test_pulsar_normalize_event_id_replay_deterministic(spark):
    """E4 stream dedup keys on event_id: a replayed micro-batch must yield
    identical ids, with or without the broker messageId column."""
    for with_mid in (True, False):
        a = normalize_ids = sorted(
            r["event_id"]
            for r in __import__(
                "pulsar_message_filter_spark.sources.pulsar", fromlist=["x"]
            ).normalize_pulsar_frame(_connector_frame(spark, with_mid)).collect()
        )
        b = sorted(
            r["event_id"]
            for r in __import__(
                "pulsar_message_filter_spark.sources.pulsar", fromlist=["x"]
            ).normalize_pulsar_frame(_connector_frame(spark, with_mid)).collect()
        )
        assert a == b and len(set(a)) == 3, (with_mid, a)


# ---------------------------------------------------------------------------
# KLL-lite quantile sketch (VERDICT r05 item 6): merge associativity,
# determinism, and rank-error bound vs exact order statistics.
# ---------------------------------------------------------------------------


def _kll():
    from pulsar_message_filter_spark.operators.sketch import KLLLite

    return KLLLite


def _rank_error(values, est, p) -> float:
    """Distance from p to the est value's rank INTERVAL — with ties, every
    rank inside the tie block belongs to the same value, so any p within
    [bisect_left/n, bisect_right/n] is exactly answered by est."""
    import bisect

    values = sorted(values)
    lo = bisect.bisect_left(values, est) / len(values)
    hi = bisect.bisect_right(values, est) / len(values)
    return max(lo - p, p - hi, 0.0)


def _distributions(n=20000):
    # no RNG: deterministic but unordered streams of distinct shapes
    uniform = [(i * 7919) % n for i in range(n)]
    zipf = [int(n / (1 + (i * 104729) % n) ** 0.7) for i in range(n)]
    sorted_asc = list(range(n))
    constant = [42.0] * n
    return {"uniform": uniform, "zipf": zipf, "sorted": sorted_asc, "constant": constant}


def test_kll_rank_error_bound_across_distributions():
    KLL = _kll()
    for name, vals in _distributions().items():
        sk = KLL(200)
        for i in range(0, len(vals), 1000):  # chunked, like Arrow batches
            sk.update_many(vals[i : i + 1000])
        for p in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
            err = _rank_error(vals, sk.quantile(p), p)
            assert err <= 0.02, (name, p, err)


def test_kll_merge_tree_shapes_agree_within_bound():
    """Left-fold, balanced-tree, and reversed merge orders must all land
    within the error bound — the associative-up-to-error contract."""
    KLL = _kll()
    vals = _distributions()["uniform"]
    parts = [vals[i::16] for i in range(16)]  # 16 'partitions'

    def sketch_of(chunk):
        s = KLL(200)
        s.update_many(chunk)
        return s

    def fold(sketches):
        acc = sketches[0]
        for s in sketches[1:]:
            acc.merge(s)
        return acc

    def tree(sketches):
        while len(sketches) > 1:
            sketches = [
                fold(sketches[i : i + 2]) for i in range(0, len(sketches), 2)
            ]
        return sketches[0]

    left = fold([sketch_of(c) for c in parts])
    bal = tree([sketch_of(c) for c in parts])
    rev = fold([sketch_of(c) for c in reversed(parts)])
    for sk in (left, bal, rev):
        assert sk.n == len(vals)
        for p in (0.25, 0.5, 0.75, 0.9):
            assert _rank_error(vals, sk.quantile(p), p) <= 0.03, p


def test_kll_deterministic_and_serializable():
    """Task-retry safety: identical input → bit-identical sketch; dumps/
    loads round-trips the full ladder state."""
    KLL = _kll()
    vals = _distributions()["zipf"]
    a, b = KLL(100), KLL(100)
    a.update_many(vals)
    b.update_many(vals)
    assert a.levels == b.levels and a.flips == b.flips and a.n == b.n
    c = KLL.loads(a.dumps())
    assert c.levels == a.levels and c.n == a.n and c.flips == a.flips
    assert c.quantile(0.5) == a.quantile(0.5)


def test_kll_weights_conserved():
    """Total represented weight equals the raw count after any compaction
    depth (items are promoted with doubled weight, never dropped net)."""
    KLL = _kll()
    sk = KLL(16)  # tiny k forces many compaction levels
    vals = _distributions()["uniform"][:5000]
    sk.update_many(vals)
    total_weight = sum(len(buf) << lvl for lvl, buf in enumerate(sk.levels))
    # each compaction keeps exactly half the buffer at double weight, so
    # represented weight stays within one buffer of the true count
    assert abs(total_weight - len(vals)) <= 16 * len(sk.levels)
    assert sk.n == len(vals)


def test_kll_nonfinite_inputs_dropped_and_counted():
    """ADVICE r06 (medium): NULL/NaN/inf reaching update_many must not
    poison the ladder — NaN breaks list.sort total ordering and with it
    both the rank bound and deterministic replay.  Non-finite values are
    dropped, counted, and the surviving estimate equals the clean-input
    estimate exactly."""
    KLL = _kll()
    vals = _distributions()["uniform"][:4000]
    dirty = []
    for i, v in enumerate(vals):
        dirty.append(v)
        if i % 7 == 0:
            dirty.append(float("nan"))
        if i % 11 == 0:
            dirty.append(None)  # pandas NULL → NaN through np.asarray
        if i % 13 == 0:
            dirty.append(float("inf"))
    clean, noisy = KLL(100), KLL(100)
    clean.update_many(vals)
    for i in range(0, len(dirty), 500):  # chunked like Arrow batches
        noisy.update_many(dirty[i : i + 500])
    assert noisy.n == len(vals)
    assert noisy.dropped == len(dirty) - len(vals)
    # dumps/loads carries the dropped counter; merge adds it
    rt = KLL.loads(noisy.dumps())
    assert rt.dropped == noisy.dropped
    merged = KLL(100).merge(noisy).merge(rt)
    assert merged.dropped == 2 * noisy.dropped
    for p in (0.25, 0.5, 0.75):
        assert _rank_error(vals, noisy.quantile(p), p) <= 0.04, p


def test_kll_group_quantiles_numeric_group_key(spark):
    """ADVICE r06 (low): the stage schemas must carry the real group-key
    type — a bigint key through a hardcoded ``string`` schema would coerce
    or crash the Arrow exchange."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.parity import cents
    from pulsar_message_filter_spark.operators.sketch import kll_group_quantiles

    li = (
        load(spark, "lineitem", "/root/testdata/sf0.001")
        .select(
            (F.col("l_linenumber").cast("bigint")).alias("grp"),
            cents("l_extendedprice").alias("v"),
        )
    )
    out = kll_group_quantiles(li, "grp", "v", [0.5])
    assert dict(out.dtypes)["grp"] == "bigint"
    rows = out.collect()
    assert rows and all(isinstance(r["grp"], int) for r in rows)


def test_kll_graded_query_error_column(spark):
    """End-to-end: the graded query's self-measured rank_error stays inside
    the k=200 bound at the oracle SF."""
    from pulsar_message_filter_spark.registry import all_graded

    rows = all_graded()["sketch_kll_quantiles"].fn(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 12
    assert all(r["rank_error"] <= 0.02 for r in rows)
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}



# ---------------------------------------------------------------------------
# Streaming soak artifact (VERDICT r05 item 8): the checked-in SOAK_r*.json
# must show sustained rate, bounded state, and bounded checkpoints over
# >=100 micro-batches.  Regenerate with: python tools/stream_soak.py 20000 300
# ---------------------------------------------------------------------------


def test_soak_artifact_bounds():
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, "SOAK_r*.json")))
    assert paths, "no soak artifact checked in"
    d = json.loads(open(paths[-1]).read())
    assert d["total_batches"] >= 100
    for leg in ("verdict_pipeline", "stateful_window", "sessionization", "throttle"):
        r = d[leg]
        assert not r["backlogged"], (leg, r["sustained_rows_per_sec"])
        state = r.get("state") or {}
        if state.get("batches"):  # stateful legs carry the bounded verdicts
            assert state["bounded"], leg
            assert state["bounded_over_duration"], leg
            if d.get("rocksdb"):  # r07+: on-disk axis observed + named mem cap
                assert state["sst_bytes_last"] and state["sst_bytes_last"] > 0, leg
                cap = d["rocksdb"]["max_memory_usage_mb"] << 20
                assert state["state_mem_bytes_last"] <= cap * 1.1, (
                    leg,
                    state["state_mem_bytes_last"],
                    cap,
                )
    assert d["checkpoints"]["bounded"], d["checkpoints"]


# ---------------------------------------------------------------------------
# Round-10 breadth: chunking, Misra-Gries bound, rendezvous elasticity
# ---------------------------------------------------------------------------


def test_misra_gries_undercount_bound(spark):
    """MG guarantee: estimates are one-sided underestimates, each within
    n/(k+1) per compress level (2 levels: per-salt + final merge)."""
    from pulsar_message_filter_spark.operators.sketch import _MG_K
    from pulsar_message_filter_spark.registry import all_graded
    from pulsar_message_filter_spark.io import load

    sf = "/root/testdata/sf0.01"
    rows = all_graded()["sketch_misra_gries"].fn(spark, sf).collect()
    assert rows, "summary must keep at least one counter"
    n = load(spark, "events", sf).count()
    bound = 2 * n / (_MG_K + 1)
    for r in rows:
        assert 0 <= r["undercount"] <= bound, r
        assert r["est_count"] + r["undercount"] == r["true_count"]


def test_rendezvous_moves_only_into_new_shard(spark):
    from pulsar_message_filter_spark.registry import all_graded

    rows = {
        r["shard"]: r
        for r in all_graded()["f70_rendezvous_sharding"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == set(range(9))
    for s in range(8):
        assert rows[s]["n_moved_in"] == 0, s  # old shards only LOSE keys
    total = sum(r["n_base"] for r in rows.values())
    moved = rows[8]["n_moved_in"]
    assert rows[8]["n_base"] == 0 and rows[8]["n_exp"] == moved
    # expected movement ~ 1/9 of keys; allow generous sampling slack
    assert abs(moved / total - 1 / 9) < 0.05, (moved, total)


@pytest.mark.slow  # streaming rollup soak (~40 s)
def test_streaming_kll_rollup_quantiles(spark, tmp_path):
    """Streaming percentiles as mergeable state: three micro-batches fold
    into epoch-keyed KLL rows; merge-on-read quantiles match the exact
    order statistics of ALL streamed rows within the k=200 rank bound."""
    import time as _time

    from pulsar_message_filter_spark.sources.streams import file_message_stream
    from pulsar_message_filter_spark.streaming.pipeline import (
        kll_rollup_pipeline,
        read_kll_rollup,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    def write_events(n0, n):
        rows = [
            (n0 + i, "2024-01-01 10:00:00", i % 7,
             "a" if (n0 + i) % 3 else "b", float((n0 + i) * 37 % 1000), "{}")
            for i in range(n)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
            "value", "props",
        ).write.mode("append").parquet(str(inp))

    write_events(0, 800)
    stream = file_message_stream(spark, str(inp))
    q = kll_rollup_pipeline(stream, store, ck).start()
    try:
        q.processAllAvailable()
        write_events(800, 700)
        q.processAllAvailable()
        write_events(1500, 500)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["event_type"], r["p"]): r
        for r in read_kll_rollup(spark, store).collect()
    }
    all_vals = {"a": [], "b": []}
    for i in range(2000):
        all_vals["a" if i % 3 else "b"].append(float(i * 37 % 1000))
    for et, vals in all_vals.items():
        assert got[(et, 0.5)]["sketch_n"] == len(vals)
        for p in (0.25, 0.5, 0.75, 0.9):
            assert _rank_error(vals, got[(et, p)]["est_value"], p) <= 0.02, (et, p)


def test_compaction_plan_invariants():
    """FFD guarantees: no bin over target unless it holds a single
    oversized file; determinism; every file placed exactly once."""
    from pulsar_message_filter_spark.layout import plan_compaction

    files = [(f"f{i}", (i * 7919) % 900 + 100) for i in range(200)]
    target = 1000
    plan = plan_compaction(files, target)
    assert sorted(p for _, p, _ in plan) == sorted(f for f, _ in files)
    assert plan == plan_compaction(list(reversed(files)), target)  # det.
    from collections import defaultdict

    by_bin = defaultdict(list)
    for b, p, s in plan:
        by_bin[b].append(s)
    for b, sizes in by_bin.items():
        if len(sizes) > 1:
            assert sum(sizes) <= target, (b, sizes)
        else:
            assert sizes[0] <= target or sizes[0] > target  # own bin always ok
    # oversized files sit alone
    for b, sizes in by_bin.items():
        if any(s > target for s in sizes):
            assert len(sizes) == 1
    # packing quality: mean fill of multi-file bins > 50%
    fills = [sum(s) / target for s in by_bin.values() if sum(s) <= target]
    assert sum(fills) / len(fills) > 0.5


def test_compaction_report_shape(spark):
    from pulsar_message_filter_spark.registry import all_graded

    rows = all_graded()["f72_compaction_plan"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r["n_files"] >= 1 for r in rows)
    assert all(r["total_bytes"] > 0 for r in rows)
    for r in rows:
        if r["n_files"] > 1 and not r["oversized"]:
            assert r["fill"] <= 1.0


def test_kmv_set_difference_estimate_quality(spark):
    """Theta-style A-NOT-B: the estimate must track the exact difference
    within the KMV k=32 sampling error (generous 3/sqrt(k) rel bound)."""
    from pulsar_message_filter_spark.registry import all_graded

    rows = all_graded()["kmv_set_difference"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        if r["exact_a_minus_b"] >= 200:  # small diffs drown in sketch noise
            rel = abs(r["est_a_minus_b"] - r["exact_a_minus_b"]) / r["exact_a_minus_b"]
            assert rel < 3 / (32 ** 0.5), (r, rel)


def test_execute_compaction_roundtrip(spark, tmp_path):
    """Compaction must preserve every row and produce one output dir per
    bin with the planned membership."""
    import glob as _glob

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.layout import execute_compaction

    src = str(tmp_path / "src")
    # 12 small part-files of varying size appended into ONE directory —
    # the real small-file-problem shape
    for i in range(12):
        spark.range(i * 1000, i * 1000 + 400 * (1 + i % 3)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "out")
    plan = execute_compaction(spark, f"{src}/*.parquet", out, 64 << 10)
    n_bins = plan.select("bin_id").distinct().count()
    assert n_bins < 12  # actually compacts
    before = spark.read.parquet(src).agg(
        F.count("*"), F.sum("id")
    ).collect()[0]
    after_df = spark.read.parquet(out)
    after = after_df.agg(F.count("*"), F.sum("id")).collect()[0]
    assert tuple(before) == tuple(after)  # bit-for-bit row preservation
    assert after_df.select("bin_id").distinct().count() == n_bins
    assert len(_glob.glob(f"{out}/bin_id=*")) == n_bins


@pytest.mark.slow  # streaming rollup soak (~40 s)
def test_streaming_mg_rollup_heavy_hitters(spark, tmp_path):
    """Streaming heavy hitters: merged MG estimates undercount the true
    counts by at most n/(k+1) (mergeable-MG theorem), and the genuinely
    hot keys all survive the rollup."""
    from pulsar_message_filter_spark.sources.streams import file_message_stream
    from pulsar_message_filter_spark.streaming.pipeline import (
        mg_rollup_pipeline,
        read_mg_rollup,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    true_counts: dict = {}

    def write_events(n0, n):
        rows = []
        for i in range(n):
            gi = n0 + i
            user = gi % 3 if gi % 10 < 9 else 100 + gi % 50  # 3 hot keys ~90%
            true_counts[user] = true_counts.get(user, 0) + 1
            rows.append(
                (gi, "2024-01-01 10:00:00", user, "view", 1.0, "{}")
            )
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
            "value", "props",
        ).write.mode("append").parquet(str(inp))

    write_events(0, 900)
    stream = file_message_stream(spark, str(inp))
    q = mg_rollup_pipeline(stream, store, ck, k=16).start()
    try:
        q.processAllAvailable()
        write_events(900, 800)
        q.processAllAvailable()
        write_events(1700, 700)
        q.processAllAvailable()
    finally:
        q.stop()

    est = {r["user_id"]: r["est_count"] for r in read_mg_rollup(spark, store).collect()}
    n = sum(true_counts.values())
    bound = n / 17
    hot = {u for u, c in true_counts.items() if c > 2 * bound}
    assert hot <= set(est), (hot, set(est))  # every provably-heavy key kept
    for u, e in est.items():
        assert 0 < e <= true_counts[u], u  # one-sided
        assert true_counts[u] - e <= 2 * bound, (u, e, true_counts[u])


def test_kll_hypothesis_rank_bound_and_determinism():
    """Property-based: for ANY value list and any split into two parts,
    (a) building is deterministic, (b) merge(a_part, b_part) answers every
    queried quantile within the k=64 rank bound, (c) n is conserved."""
    from hypothesis import given, settings, strategies as st

    KLL = _kll()

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            min_size=1,
            max_size=2000,
        ),
        st.integers(min_value=0, max_value=2000),
        st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
    )
    def prop(vals, cut, p):
        cut = min(cut, len(vals))
        a, b = KLL(64), KLL(64)
        a.update_many(vals[:cut])
        b.update_many(vals[cut:])
        a.merge(b)
        assert a.n == len(vals)
        assert _rank_error(vals, a.quantile(p), p) <= 4 / 64 + 1e-9
        a2, b2 = KLL(64), KLL(64)
        a2.update_many(vals[:cut])
        b2.update_many(vals[cut:])
        a2.merge(b2)
        assert a2.levels == a.levels and a2.n == a.n

    prop()
