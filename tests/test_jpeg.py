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


def _synth_jpeg_noninterleaved(width, height, seed=3, subsampling=(2, 2)):
    """Baseline SOF0 fixture with THREE single-component scans (T.81
    allows 1-4 scans in baseline; each single-component scan is
    NON-INTERLEAVED, walking the component's OWN ceil(size/8) block grid,
    not the MCU grid — A.2.2).  Quantized blocks are byte-identical to
    :func:`synth_jpeg`'s, only the scan layout differs, so the decoded
    pixels must match the interleaved encoding exactly."""
    import struct

    from pulsar_message_filter_spark.operators.jpeg import (
        _AC_BITS,
        _AC_HUFFVAL,
        _BitWriter,
        _DC_BITS,
        _DC_HUFFVAL,
        _canonical_codes,
        _category,
        _container_prefix,
        _encode_magnitude,
        _prepare_encode,
    )

    comps, blocks, tables, hmax, vmax, _mx, _my = _prepare_encode(
        width, height, seed, False, subsampling, None, None, None
    )
    dc_codes = _canonical_codes(_DC_BITS, _DC_HUFFVAL)
    ac_codes = _canonical_codes(_AC_BITS, _AC_HUFFVAL)

    out = _container_prefix(tables, comps, width, height, sof_marker=0xC0)
    for cls, bits, huffval in ((0, _DC_BITS, _DC_HUFFVAL), (1, _AC_BITS, _AC_HUFFVAL)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    for ci, (cid, (h, v), _slot) in enumerate(comps):
        blk, bw_, _h, _v = blocks[ci]
        # the component's non-interleaved grid (unpadded-to-MCU)
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        sos = bytes([1, cid, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        w = _BitWriter()
        pred = 0
        for by in range(nby):
            for bx in range(nbx):
                zz = blk[by * bw_ + bx]  # blk rows use the PADDED stride
                dc = int(zz[0])
                diff, pred = dc - pred, dc
                t = _category(diff)
                code, ln = dc_codes[t]
                w.write(code, ln)
                if t:
                    w.write(_encode_magnitude(diff, t), t)
                nz = np.nonzero(zz[1:])[0]
                last = (nz[-1] + 1) if len(nz) else 0
                run = 0
                for k in range(1, last + 1):
                    val = int(zz[k])
                    if val == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        w.write(code, ln)
                        run -= 16
                    t = _category(val)
                    code, ln = ac_codes[(run << 4) | t]
                    w.write(code, ln)
                    w.write(_encode_magnitude(val, t), t)
                    run = 0
                if last < 63:
                    code, ln = ac_codes[0x00]
                    w.write(code, ln)
        w.flush()
        out += w.out
    out += b"\xff\xd9"
    return bytes(out)


def test_noninterleaved_sequential_scans_decode_like_interleaved():
    """ADVICE r08 regression: a conforming baseline stream with three
    SINGLE-COMPONENT scans over a NON-MCU-ALIGNED 4:2:0 frame (24x24:
    luma grid 3x3 blocks vs a 4x4 padded MCU walk) must decode exactly
    like the interleaved encoding of the same quantized blocks.  Before
    the fix the decoder walked such scans on the MCU grid and
    misdecoded them."""
    ni = decode_jpeg_pixels(_synth_jpeg_noninterleaved(24, 24, seed=3))
    il = decode_jpeg_pixels(synth_jpeg(24, 24, seed=3, subsampling=(2, 2)))
    assert ni.shape == il.shape == (24, 24, 3)
    assert np.array_equal(ni, il)


def test_fill_bytes_before_markers_are_skipped():
    """ADVICE r08 regression: 0xFF fill bytes are legal padding before any
    marker (B.1.1.2).  Inject runs of fills before the second SOS and
    before EOI of a multi-scan stream — the post-scan marker search must
    skip them instead of treating a FF FF pair as a marker."""
    b = _synth_jpeg_noninterleaved(24, 24, seed=5)
    sos2 = b.index(b"\xff\xda", b.index(b"\xff\xda") + 2)
    padded = b[:sos2] + b"\xff" * 5 + b[sos2:-2] + b"\xff" * 3 + b[-2:]
    assert np.array_equal(decode_jpeg_pixels(padded), decode_jpeg_pixels(b))
