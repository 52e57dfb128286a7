"""Baseline JPEG codec (operators/jpeg.py): exactness pinned where the
math is exact, bounded elsewhere.

JPEG is lossy, so unlike the PNG/GIF/BMP pins these tests split by
error source: (a) a CONSTANT tile has all-zero AC and a DC that
quantizes exactly at Annex-K tables → pixel-exact; (b) with all-ones
quant tables the only loss is coefficient rounding (±0.5/coef), which
the orthonormal IDCT bounds at ≤1 LSB in luma and ≤2 after the chroma
color transform; (c) geometry/subsampling invariants hold on multi-MCU
non-multiple-of-8 shapes.  The decoder is table-driven (reads DHT/DQT
from the stream), so these pins cover any conforming baseline stream,
not just our encoder's table choices.
"""

from __future__ import annotations

import numpy as np
import pytest

from pulsar_message_filter_spark.operators.jpeg import (
    _ZIGZAG,
    _rgb_to_ycbcr,
    decode_jpeg_pixels,
    synth_jpeg,
    synth_jpeg_progressive,
)

_ONES = np.ones((8, 8), dtype=int)


def test_zigzag_is_the_t81_scan():
    # first 16 entries of the published scan order (T.81 figure A.6)
    assert _ZIGZAG[:16] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    ]
    assert sorted(_ZIGZAG) == [(i, j) for i in range(8) for j in range(8)]


def test_constant_tile_is_pixel_exact_even_lossy():
    """All AC = 0; DC survives Annex-K quantization of a flat block up to
    the rounding that cancels on dequant → exact gray everywhere."""
    px = np.full((16, 16, 3), 200, np.uint8)
    img = decode_jpeg_pixels(synth_jpeg(16, 16, pixels=px))
    assert img.shape == (16, 16, 3)
    assert int(np.abs(img.astype(int) - 200).max()) == 0


def test_roundtrip_444_within_rounding():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    out = decode_jpeg_pixels(
        synth_jpeg(
            17, 24, pixels=px, subsampling=(1, 1),
            luma_quant=_ONES, chroma_quant=_ONES,
        )
    )
    assert out.shape == px.shape
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2


def test_grayscale_roundtrip_1lsb():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    g = decode_jpeg_pixels(
        synth_jpeg(17, 24, pixels=px, grayscale=True, luma_quant=_ONES)
    )
    luma = np.round(_rgb_to_ycbcr(px)[..., 0])
    assert g.shape == (24, 17)
    assert int(np.abs(g.astype(float) - luma).max()) <= 1


@pytest.mark.parametrize("subsampling", [(1, 1), (2, 1), (2, 2)])
def test_subsampled_geometry_multi_mcu(subsampling):
    """Non-multiple-of-8 (and of the MCU) dimensions survive pad + crop at
    every subsampling mode; a smooth gradient stays close after 4:2:0."""
    w, h = 37, 21
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256], axis=-1)
    px = px.astype(np.uint8)
    out = decode_jpeg_pixels(
        synth_jpeg(
            w, h, pixels=px, subsampling=subsampling,
            luma_quant=_ONES, chroma_quant=_ONES,
        )
    )
    assert out.shape == (h, w, 3)
    # luma is never subsampled: its reconstruction stays ≤2 regardless
    got_luma = _rgb_to_ycbcr(out)[..., 0]
    want_luma = _rgb_to_ycbcr(px)[..., 0]
    assert float(np.abs(got_luma - want_luma).max()) <= 2.5


def test_decoder_honors_stream_tables_not_ours():
    """Quant values are read from DQT, not assumed: doubling the encoder's
    table changes the reconstruction exactly as the stream says."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    fine = decode_jpeg_pixels(
        synth_jpeg(8, 8, pixels=px, subsampling=(1, 1),
                   luma_quant=_ONES, chroma_quant=_ONES)
    )
    coarse = decode_jpeg_pixels(
        synth_jpeg(8, 8, pixels=px, subsampling=(1, 1),
                   luma_quant=_ONES * 64, chroma_quant=_ONES * 64)
    )
    fine_err = np.abs(fine.astype(int) - px.astype(int)).mean()
    coarse_err = np.abs(coarse.astype(int) - px.astype(int)).mean()
    assert fine_err <= 1.0
    assert coarse_err > fine_err * 2  # visibly lossier, as the DQT dictates


def test_restart_markers_roundtrip():
    """DRI/RSTn: byte-aligned restart spans with DC-predictor resets decode
    identically to the unsegmented stream (and the markers are really
    there — they're what bounds poison blast radius in a real corpus)."""
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (40, 33, 3)).astype(np.uint8)
    b = synth_jpeg(
        33, 40, pixels=px, restart_interval=2, subsampling=(1, 1),
        luma_quant=_ONES, chroma_quant=_ONES,
    )
    n_rst = sum(
        1 for i in range(len(b) - 1) if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7
    )
    assert n_rst == 12  # 25 MCUs, restart every 2
    out = decode_jpeg_pixels(b)
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2
    # missing restart marker where DRI promises one → malformed, ValueError
    first_rst = next(
        i for i in range(len(b) - 1) if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7
    )
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b[:first_rst] + b[first_rst + 2 :])


def test_poison_contract():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"hello world")
    whole = synth_jpeg(16, 16, seed=1)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(whole[:40])  # truncated mid-header
    with pytest.raises(ValueError):
        decode_jpeg_pixels(whole[:-20])  # truncated entropy data


@pytest.mark.parametrize(
    "kw,shape",
    [
        (dict(grayscale=True), (24, 17)),
        (dict(subsampling=(1, 1)), (24, 17)),
        (dict(subsampling=(2, 1)), (21, 33)),
        (dict(subsampling=(2, 2)), (29, 37)),
    ],
)
@pytest.mark.parametrize("spectral_only", [False, True])
def test_progressive_decodes_bit_identical_to_baseline(kw, shape, spectral_only):
    """The strongest claim a lossy format allows: a progressive stream
    carries the SAME quantized coefficients as the baseline stream, so the
    decoded pixels must be IDENTICAL — across grayscale/4:4:4/4:2:2/4:2:0
    and both profiles (DC+AC successive approximation with EOB runs and
    buffered correction bits; spectral-selection-only with a split AC
    band)."""
    h, w = shape
    rng = np.random.RandomState(h * w)
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg_pixels(synth_jpeg(w, h, pixels=px, **kw))
    prog = decode_jpeg_pixels(
        synth_jpeg_progressive(w, h, pixels=px, spectral_only=spectral_only, **kw)
    )
    assert np.array_equal(base, prog)


def test_progressive_poison_and_remaining_gates():
    whole = synth_jpeg_progressive(16, 16, seed=1)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(whole[:-30])  # truncated mid-scan
    # lossless/arithmetic SOFs stay gated, loudly
    b = bytearray(synth_jpeg(16, 16, seed=1))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC3  # lossless sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(b))


def test_dispatch_and_media_stats_cover_jpeg():
    from pulsar_message_filter_spark.operators.multimodal import (
        decode_pixels,
        media_stats,
    )
    import pandas as pd

    b = synth_jpeg(16, 16, pixels=np.full((16, 16, 3), 128, np.uint8))
    img = decode_pixels(b)
    assert img.shape == (16, 16, 3)
    gray = synth_jpeg(16, 16, grayscale=True,
                      pixels=np.full((16, 16, 3), 99, np.uint8))
    assert decode_pixels(gray).shape == (16, 16, 1)  # (h, w, nch) contract

    rows = next(
        media_stats(
            iter([pd.DataFrame({"path": ["a.jpg", "bad.jpg"],
                                "content": [b, b[:30]]})])
        )
    )
    ok = rows[rows["path"] == "a.jpg"].iloc[0]
    assert ok["media_kind"] == "jpeg" and bool(ok["decodable"])
    assert ok["width"] == 16 and ok["n_pixels"] == 256
    assert abs(float(ok["ch_means"].split(":")[0]) - 128.0) < 1.0
    bad = rows[rows["path"] == "bad.jpg"].iloc[0]  # poison: flagged, not fatal
    assert bad["media_kind"] == "jpeg" and not bool(bad["decodable"])
