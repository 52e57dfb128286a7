"""F-series: multimodal binary columns (SURVEY.md §2.F12, A8, G5).

Images/audio/video are opaque ``BinaryType`` columns with typed metadata.
The Spark-side plumbing is real and tested: the ``binaryFile`` source,
content digests, magic-byte sniffing, and an Arrow-batched ``mapInPandas``
feature-extraction stage with a documented batch shape.

BMP/PNG/GIF and WAV *header metadata* extraction is REAL — width/height
and sample-rate/channel-count are pure-struct parses of the public
BMP/PNG/GIF/RIFF layouts, no media library needed.

Full decode is split by whether a codec is mathematically required:

- **REAL, no library needed**: uncompressed BMP pixels
  (``decode_bmp_pixels`` — BI_RGB 8/24/32-bpp, padding + bottom-up
  handled), 8-bit PNG pixels (``decode_png_pixels`` —
  DEFLATE via stdlib ``zlib`` + numpy scanline unfilter, gray/RGB/
  palette/RGBA, sequential AND Adam7-interlaced), GIF pixels incl.
  interlaced (``decode_gif_pixels`` —
  pure-Python LZW, global/local color tables, 4-pass row reorder), and
  WAV PCM samples
  (``decode_wav_samples`` — 8/16/32-bit integer and float32 PCM).
  ``media_stats`` feeds their per-channel statistics through an
  Arrow-batched ``mapInPandas`` stage; ``audio_frame_features`` /
  ``audio_spectral_features`` run windowed DSP on the decoded PCM.
- **REAL as of round 8**: JPEG pixels too — BOTH sequential (SOF0/1)
  and progressive (SOF2 with DC/AC successive approximation, spectral
  selection, EOB runs) in ``operators/jpeg.py`` (marker walk, canonical
  Huffman, dequant, IDCT, chroma upsample, YCbCr→RGB; pinned via
  from-spec forward encoders, with progressive-vs-baseline decode
  proven BIT-IDENTICAL).  All five fixture formats now decode for real.
- **STILL GATED**: lossless/arithmetic/12-bit JPEG and compressed
  audio — documented ``NotImplementedError`` gates; swap in PIL/librosa
  in production; the schema, partitioning, and UDF signature do not
  change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.registry import graded

#: Output schema of the feature-extraction stage — fixed regardless of the
#: decoder implementation.  ``width/height`` (BMP) and
#: ``sample_rate/n_channels`` (WAV) are REAL header-parsed values; they are
#: null for media kinds whose decode is still stubbed.
FEATURE_SCHEMA = (
    "path string, byte_len long, magic string, sha1 string, "
    "media_kind string, width int, height int, "
    "sample_rate int, n_channels int, "
    "fake_width int, fake_height int"
)


def _parse_bmp_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a BITMAPINFOHEADER — pure struct, no image lib.

    Layout (public BMP spec): 14-byte file header (``BM`` magic), then the
    info header with int32-LE width at byte 18 and height at byte 22 (the
    height may be negative for top-down bitmaps; callers get |height|)."""
    import struct

    if len(b) < 26 or b[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", b, 18)
    return width, abs(height)


def _parse_png_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR — pure struct, no image lib.

    Layout (public PNG spec, RFC 2083): 8-byte signature, then the IHDR
    chunk (always first): 4-byte length, 4-byte 'IHDR' type, int32-BE
    width at byte 16 and height at byte 20."""
    import struct

    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    width, height = struct.unpack_from(">II", b, 16)
    return width, height


def _parse_gif_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a GIF logical screen descriptor — pure struct.

    Layout (public GIF87a/89a spec): 6-byte signature, then uint16-LE
    canvas width at byte 6 and height at byte 8."""
    import struct

    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack_from("<HH", b, 6)
    return width, height


def _parse_wav_header(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_channels) from a RIFF/WAVE ``fmt `` chunk.

    Walks the chunk list (public RIFF spec) instead of assuming the fmt
    chunk sits at byte 12 — LIST/INFO chunks before fmt are legal."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    off = 12
    while off + 8 <= len(b):
        chunk_id = b[off : off + 4]
        (chunk_sz,) = struct.unpack_from("<I", b, off + 4)
        if chunk_id == b"fmt " and off + 16 <= len(b):
            n_channels, sample_rate = struct.unpack_from("<HI", b, off + 10)
            return sample_rate, n_channels
        off += 8 + chunk_sz + (chunk_sz & 1)  # chunks are word-aligned
    return None


def decode_bmp_pixels(b: bytes):
    """Uncompressed BMP → ``numpy`` RGB array of shape (height, width, 3).

    Pure struct + numpy — the BI_RGB layout (public BMP spec) needs no
    codec: pixel rows are raw bytes, 4-byte-aligned, stored bottom-up
    unless height is negative.  Supported: 24-bpp BGR, 32-bpp BGRA
    (alpha dropped), and 8-bpp palette (mapped through the BGRA color
    table).  Compressed BMPs (BI_RLE*/BI_BITFIELDS) raise
    ``NotImplementedError`` like the codec formats.
    """
    import struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_sz,) = struct.unpack_from("<I", b, 14)
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} needs a codec; only BI_RGB is "
            "decodable without one"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    stride = ((width * bpp + 31) // 32) * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * height, offset=data_off)
    rows = raw.reshape(height, stride)
    if bpp == 8:
        # palette: BGRA quads between the info header and the pixel data
        pal_off = 14 + hdr_sz
        n_entries = (data_off - pal_off) // 4
        palette = np.frombuffer(
            b, dtype=np.uint8, count=n_entries * 4, offset=pal_off
        ).reshape(n_entries, 4)[:, :3][:, ::-1]  # BGRA → RGB
        img = palette[rows[:, :width]]
    else:
        n_ch = bpp // 8
        px = rows[:, : width * n_ch].reshape(height, width, n_ch)
        img = px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped
    return img if top_down else img[::-1]


def decode_wav_samples(b: bytes):
    """RIFF/WAVE PCM → (samples ``(n, channels)`` numpy array, sample_rate).

    Pure struct + numpy — integer and float PCM are raw interleaved
    samples, no codec involved.  Supported ``fmt`` codes: 1 (integer PCM
    at 8/16/32 bits; 8-bit is unsigned per the spec, wider are signed LE)
    and 3 (float32).  Compressed codes (µ-law, MP3, …) raise
    ``NotImplementedError``.
    """
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    fmt = None
    off = 12
    while off + 8 <= len(b):
        chunk_id = b[off : off + 4]
        (chunk_sz,) = struct.unpack_from("<I", b, off + 4)
        body = off + 8
        if chunk_id == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", b, body)
            (bits,) = struct.unpack_from("<H", b, body + 14)
            fmt = (audio_fmt, n_ch, rate, bits)
        elif chunk_id == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            audio_fmt, n_ch, rate, bits = fmt
            if audio_fmt == 1 and bits in (8, 16, 32):
                dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
            elif audio_fmt == 3 and bits == 32:
                dtype = np.dtype("<f4")
            else:
                raise NotImplementedError(
                    f"WAV format code {audio_fmt} @ {bits} bits needs a codec"
                )
            n = min(chunk_sz, len(b) - body) // (bits // 8)
            n -= n % n_ch
            samples = np.frombuffer(b, dtype=dtype, count=n, offset=body)
            return samples.reshape(-1, n_ch), rate
        off = body + chunk_sz + (chunk_sz & 1)  # chunks are word-aligned
    raise ValueError("WAV has no data chunk")


#: Adam7 pass grid (public PNG spec): (x_start, y_start, x_step, y_step).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, width: int, height: int, nch: int):
    """Reverse PNG scanline filtering over one (sub-)image.

    ``raw`` must start at the first scanline's filter byte and hold at
    least ``height * (width*nch + 1)`` bytes.  Filters Sub and Up
    vectorize (lane-cumsum / row-add mod 256); Average and Paeth are
    sequential per byte by definition (each reconstructed byte feeds its
    right neighbor's predictor) — fine for the Arrow-batch shapes this
    stage sees, and the loop is per-scanline, never per-file.  Returns
    the reconstructed (height, width*nch) array.
    """
    import numpy as np

    stride = width * nch
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data shorter than geometry requires")
    recon = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = row[0]
        f = np.frombuffer(row, np.uint8, count=stride, offset=1)
        if ftype == 0:  # None
            cur = f.copy()
        elif ftype == 1:  # Sub: recon[x] = f[x] + recon[x-nch] → lane cumsum
            lanes = f.reshape(width, nch).astype(np.uint32)
            cur = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up (uint8 addition wraps mod 256)
            cur = f + prev
        elif ftype == 3:  # Average
            cur = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(f[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                up = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (int(f[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        recon[y] = cur
        prev = cur
    return recon


def decode_png_pixels(b: bytes):
    """8-bit PNG (sequential or Adam7-interlaced) → RGB (height, width, 3).

    Pure stdlib + numpy — PNG's only compression is DEFLATE, which ships
    in ``zlib`` (the "needs a codec" claim was only ever true for JPEG's
    DCT).  Pipeline per the public PNG spec (RFC 2083): chunk walk →
    concatenated IDAT ``zlib.decompress`` → per-scanline unfilter
    (None/Sub/Up/Average/Paeth — :func:`_png_unfilter`) → channel
    assembly.  Adam7 images run the unfilter once per pass (each pass is
    an independently-filtered sub-image) and scatter pixels onto the
    pass grid.  Supported: bit depth 8, color types 0 (gray), 2 (RGB),
    3 (palette via PLTE), 4 (gray+alpha), 6 (RGBA) — alpha dropped, gray
    replicated, so the output contract matches ``decode_bmp_pixels``.
    Sub-byte depths raise ``NotImplementedError``; malformed bytes raise
    ``ValueError``.
    """
    import struct
    import zlib

    import numpy as np

    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    width = height = color = None
    plte = None
    idat: list[bytes] = []
    off = 8
    while off + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, off)
        ctype = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(data) < 13:  # declared length < 13 → struct.error otherwise
                raise ValueError("truncated PNG IHDR")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if comp != 0 or filt != 0:
                raise ValueError("non-standard PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} not supported")
            if color not in (0, 2, 3, 4, 6):
                raise ValueError(f"invalid PNG color type {color}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        off += 12 + length  # length + type + data + CRC
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # corrupt DEFLATE stream is malformed input
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    if interlace == 0:
        chan = _png_unfilter(raw, width, height, nch).reshape(height, width, nch)
    else:  # Adam7: each pass is an independently-filtered sub-image
        chan = np.zeros((height, width, nch), dtype=np.uint8)
        off2 = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no bytes
            sub = _png_unfilter(raw[off2:], pw, ph, nch)
            off2 += ph * (pw * nch + 1)
            ys = np.arange(y0, height, dy)
            xs = np.arange(x0, width, dx)
            chan[np.ix_(ys, xs)] = sub.reshape(ph, pw, nch)
    if color == 2:
        return chan
    if color == 6:
        return np.ascontiguousarray(chan[:, :, :3])
    if color == 0:
        return np.repeat(chan, 3, axis=2)
    if color == 4:
        return np.repeat(chan[:, :, :1], 3, axis=2)
    # color == 3: palette
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = chan.reshape(height, width)
    if int(idx.max(initial=0)) >= len(plte):
        raise ValueError("PNG palette index out of range")
    return plte[idx]


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list:
    """GIF-variant LZW → list of palette indices (pure Python).

    Public GIF89a spec, appendix F: codes are packed LSB-first; the table
    starts with 2^mcs literals plus CLEAR (=2^mcs) and END (=CLEAR+1);
    code width starts at mcs+1 and grows when the table fills a width,
    capped at 12 bits; CLEAR resets table and width.
    """
    clear = 1 << min_code_size
    end = clear + 1

    def fresh_table():
        return {i: (i,) for i in range(clear)}

    table = fresh_table()
    width = min_code_size + 1
    next_code = end + 1
    out: list = []
    prev: tuple | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh_table()
                width = min_code_size + 1
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code not in table:  # first code after clear must be literal
                    raise ValueError("corrupt GIF LZW stream")
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the cScSc special case
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def decode_gif_pixels(b: bytes):
    """GIF (incl. interlaced) → ``numpy`` RGB array (height, width, 3).

    Pure Python + numpy — GIF's only compression is LZW, decoded in
    :func:`_gif_lzw_decode`; the container walk (logical screen
    descriptor, global/local color table, extension blocks, image
    descriptor, data sub-blocks) is plain struct offsets per the public
    GIF89a spec, including the 4-pass interlace row reorder.  First image
    frame only.
    """
    import struct

    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = b[10]
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n
    while off < len(b):
        block = b[off]
        if block == 0x21:  # extension: label + sub-blocks
            off += 2
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
        elif block == 0x2C:  # image descriptor
            if off + 10 > len(b):
                raise ValueError("truncated GIF image descriptor")
            w, h = struct.unpack_from("<HH", b, off + 5)
            iflags = b[off + 9]
            off += 10
            interlaced = bool(iflags & 0x40)
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    b, dtype=np.uint8, count=3 * n, offset=off
                ).reshape(n, 3)
                off += 3 * n
            if table is None:
                raise ValueError("GIF image has no color table")
            if off >= len(b):
                raise ValueError("truncated GIF before LZW data")
            mcs = b[off]
            off += 1
            chunks = []
            while off < len(b) and b[off] != 0:
                size = b[off]
                chunks.append(b[off + 1 : off + 1 + size])
                off += 1 + size
            idx = _gif_lzw_decode(b"".join(chunks), mcs)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data underflow")
            arr = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
            if interlaced:
                # 4-pass row interleave (public GIF89a spec): rows appear in
                # pass order; scatter them back to their true positions
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in
                     ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                out = np.empty_like(arr)
                out[order] = arr
                arr = out
            if arr.max(initial=0) >= len(table):
                raise ValueError("GIF index outside color table")
            return table[arr]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF has no image data")


def decode_pixels(b: bytes):
    """Dispatch full pixel decode by magic — REAL for BMP, PNG, GIF and
    JPEG (all five formats, both JPEG modes, as of round 8).

    Sequential (SOF0/SOF1) AND progressive (SOF2, incl. successive
    approximation + EOB runs) JPEG decode for real in
    ``operators/jpeg.py`` — marker walk, canonical-Huffman entropy
    decode, dequant, IDCT, chroma upsample, YCbCr→RGB, all numpy+stdlib.
    Lossless/arithmetic/12-bit JPEG raise ``NotImplementedError``
    (documented gates inside the decoder).
    """
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(b)
    if b[:2] == b"\xff\xd8":
        from pulsar_message_filter_spark.operators.jpeg import decode_jpeg_pixels

        img = decode_jpeg_pixels(b)
        # grayscale JPEG is (h, w); every decode_pixels caller sees the
        # (h, w, nch) contract the other decoders follow
        return img if img.ndim == 3 else img[..., None]
    raise ValueError("unrecognized image magic")


#: Output schema of the REAL decode-stats stage: per-channel pixel means
#: for images, RMS/peak/duration for audio.  Null where the media kind is
#: compressed (codec-gated) or opaque.
MEDIA_STATS_SCHEMA = (
    "path string, media_kind string, decodable boolean, "
    "width int, height int, n_pixels long, ch_means string, "
    "px_min int, px_max int, "
    "sample_rate int, n_channels int, n_samples long, duration_ms long, "
    "audio_rms double, audio_peak double"
)


def media_stats(batches: Iterator[pd.DataFrame]):
    """mapInPandas stage: (path, content) → REAL decoded per-channel stats.

    BMP/PNG/GIF/JPEG (both modes — sequential AND progressive SOF2)
    pixels and WAV PCM samples are fully decoded (pure stdlib+numpy, see
    ``decode_pixels``/``decode_wav_samples``); opaque kinds and the
    remaining gated codecs (lossless/arithmetic/12-bit JPEG, compressed
    audio) yield ``decodable=false`` with null stats instead of failing
    the batch — at 100 TB a poison file must not kill the stage (same
    contract as the corrupt-record routing in the ingest path).
    """
    import numpy as np

    def _row(path: str, b: bytes) -> dict:
        out: dict = {
            "path": path.rsplit("/", 1)[-1],
            "media_kind": "opaque",
            "decodable": False,
            "width": None, "height": None, "n_pixels": None,
            "ch_means": None, "px_min": None, "px_max": None,
            "sample_rate": None, "n_channels": None, "n_samples": None,
            "duration_ms": None, "audio_rms": None, "audio_peak": None,
        }
        if (
            b[:2] == b"BM"
            or b[:8] == b"\x89PNG\r\n\x1a\n"
            or b[:6] in (b"GIF87a", b"GIF89a")
            or b[:2] == b"\xff\xd8"
        ):
            out["media_kind"] = (
                "bmp"
                if b[:2] == b"BM"
                else "gif"
                if b[:3] == b"GIF"
                else "jpeg"
                if b[:2] == b"\xff\xd8"
                else "png"
            )
            try:
                img = decode_pixels(b)
            except Exception:  # compressed OR poison/truncated: never kill the batch
                return out
            out.update(
                decodable=True,
                width=img.shape[1], height=img.shape[0],
                n_pixels=int(img.shape[0] * img.shape[1]),
                ch_means=":".join(
                    f"{m:.4f}" for m in img.reshape(-1, img.shape[2]).mean(axis=0)
                ),
                px_min=int(img.min()), px_max=int(img.max()),
            )
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["media_kind"] = "wav"
            try:
                samples, rate = decode_wav_samples(b)
            except Exception:  # compressed OR poison/truncated: never kill the batch
                return out
            x = samples.astype(np.float64)
            if samples.dtype == np.uint8:
                x -= 128.0  # 8-bit PCM is unsigned; center before RMS
            out.update(
                decodable=True,
                sample_rate=int(rate), n_channels=int(samples.shape[1]),
                n_samples=int(samples.shape[0]),
                duration_ms=int(samples.shape[0] * 1000 // rate) if rate else None,
                audio_rms=float(np.sqrt((x**2).mean())) if x.size else 0.0,
                audio_peak=float(np.abs(x).max()) if x.size else 0.0,
            )
        return out

    for pdf in batches:
        yield pd.DataFrame(
            [_row(p, c) for p, c in zip(pdf["path"], pdf["content"])],
            columns=[
                "path", "media_kind", "decodable", "width", "height",
                "n_pixels", "ch_means", "px_min", "px_max", "sample_rate",
                "n_channels", "n_samples", "duration_ms", "audio_rms",
                "audio_peak",
            ],
        )


def decode_stub(batches: Iterator[pd.DataFrame], real_decode: bool = False):
    """mapInPandas stage: (path, content) batches → feature rows.

    BMP/PNG/GIF and WAV metadata extraction is REAL (pure-struct header
    parses, no media library needed): ``width``/``height`` for the image
    formats, ``sample_rate``/``n_channels`` for WAV, with ``media_kind``
    in ('bmp', 'png', 'gif', 'wav', 'opaque').  For every other magic
    the columns are null and the
    deterministic fake dimensions (derived from the first content bytes,
    so tests can assert exact values) stand in.  ``real_decode=True`` —
    full pixel/sample decoding — remains the marked extension point for an
    actual media library.
    """
    import hashlib

    if real_decode:
        raise NotImplementedError(
            "decode_stub is the header-metadata stage; full decode lives in "
            "media_stats / decode_pixels (REAL for BMP/PNG/GIF/baseline-JPEG "
            "pixels and WAV PCM — pure numpy+stdlib)"
        )

    def _features(b: bytes) -> tuple:
        bmp = _parse_bmp_header(b)
        if bmp is not None:
            return ("bmp", bmp[0], bmp[1], None, None)
        png = _parse_png_header(b)
        if png is not None:
            return ("png", png[0], png[1], None, None)
        gif = _parse_gif_header(b)
        if gif is not None:
            return ("gif", gif[0], gif[1], None, None)
        wav = _parse_wav_header(b)
        if wav is not None:
            return ("wav", None, None, wav[0], wav[1])
        return ("opaque", None, None, None, None)

    for pdf in batches:
        content = pdf["content"]
        parsed = content.map(_features)
        yield pd.DataFrame(
            {
                "path": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                "byte_len": content.map(len),
                "magic": content.map(lambda b: b[:4].decode("latin1")),
                "sha1": content.map(lambda b: hashlib.sha1(b).hexdigest()),
                "media_kind": parsed.map(lambda t: t[0]),
                "width": parsed.map(lambda t: t[1]),
                "height": parsed.map(lambda t: t[2]),
                "sample_rate": parsed.map(lambda t: t[3]),
                "n_channels": parsed.map(lambda t: t[4]),
                "fake_width": content.map(lambda b: 1 + b[0] if len(b) else 0),
                "fake_height": content.map(lambda b: 1 + b[1] if len(b) > 1 else 0),
            }
        )


def binary_features(spark: SparkSession, glob_path: str) -> DataFrame:
    """binaryFile source → mapInPandas feature extraction.

    At 100 TB the source splits on files (``maxPartitionBytes`` governs
    packing); content bytes never leave the executor — only the fixed-width
    feature rows shuffle.
    """
    raw = spark.read.format("binaryFile").load(glob_path).select("path", "content")
    return raw.mapInPandas(decode_stub, schema=FEATURE_SCHEMA)


@graded(
    "f12_multimodal_features",
    oracle=None,  # binaryFile source + python-side sha1: no DuckDB analog
    section="F12,A8,G5",
    description="binary-column plumbing: binaryFile source, magic-byte sniff, "
    "digest + stubbed decode via mapInPandas (rows-only)",
)
def f12_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The fixture parquet files themselves serve as the opaque binary corpus;
    # their magic bytes are 'PAR1'.
    return binary_features(spark, f"{sf_dir}/*.parquet").orderBy("path")


def synth_bmp(width: int, height: int, bpp: int = 24, seed: int = 0) -> bytes:
    """Deterministic in-memory BMP (BI_RGB) — fixture generator.

    Pixel (x, y) channel c = ``(seed + x*7 + y*13 + c*29) % 256`` — a
    closed form tests can recompute independently of the decoder.
    """
    import struct

    import numpy as np

    if bpp not in (8, 24):
        raise ValueError("fixture generator supports 8/24 bpp")
    y, x = np.mgrid[0:height, 0:width]
    if bpp == 24:
        img = np.stack(
            [(seed + x * 7 + y * 13 + c * 29) % 256 for c in range(3)], axis=-1
        ).astype("uint8")
        rows = img[:, :, ::-1].reshape(height, width * 3)  # RGB → BGR
        palette = b""
    else:
        img = ((seed + x * 7 + y * 13) % 256).astype("uint8")
        rows = img.reshape(height, width)
        palette = b"".join(
            bytes((i, i, i, 0)) for i in range(256)
        )  # grayscale BGRA table
    stride = ((width * bpp + 31) // 32) * 4
    padded = np.zeros((height, stride), dtype="uint8")
    padded[:, : rows.shape[1]] = rows
    pixel_data = padded[::-1].tobytes()  # bottom-up storage
    data_off = 14 + 40 + len(palette)
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(pixel_data), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixel_data),
            2835, 2835, 256 if palette else 0, 0,
        )
    )
    return header + palette + pixel_data


def synth_wav(
    n_samples: int, n_channels: int = 2, rate: int = 8000, bits: int = 16,
    seed: int = 0,
) -> bytes:
    """Deterministic in-memory PCM WAV — fixture generator.

    Sample (i, ch) = ``(seed + i*31 + ch*17) % 200 - 100`` (shifted +128
    into unsigned range for 8-bit) — closed form, recomputable in tests.
    """
    import struct

    import numpy as np

    i, ch = np.mgrid[0:n_samples, 0:n_channels]
    vals = (seed + i * 31 + ch * 17) % 200 - 100
    if bits == 8:
        data = (vals + 128).astype("uint8").tobytes()
    elif bits == 16:
        data = vals.astype("<i2").tobytes()
    elif bits == 32:
        data = vals.astype("<i4").tobytes()
    else:
        raise ValueError("fixture generator supports 8/16/32 bits")
    block = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def synth_png(
    width: int, height: int, color_type: int = 2, seed: int = 0,
    filters=None, interlace: bool = False,
) -> bytes:
    """Deterministic in-memory PNG — fixture generator (stdlib zlib only).

    Same closed-form pixels as ``synth_bmp`` — channel c of pixel (x, y)
    is ``(seed + x*7 + y*13 + c*29) % 256`` (alpha channel, where present,
    is ``(seed + x*11 + y*3) % 256``) — so tests recompute expectations
    independently of both the encoder and the decoder.  ``filters`` picks
    the filter byte per scanline (default cycles 0..4 so one fixture
    exercises every unfilter path); the encoder applies the chosen filter
    FORWARD per the spec, which the decoder must invert exactly.
    ``interlace=True`` emits the Adam7 pass layout (each pass filtered
    independently).  Supported color types: 0 (gray), 2 (RGB), 3
    (palette, grayscale table), 6 (RGBA).
    """
    import struct
    import zlib

    import numpy as np

    nch = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    y, x = np.mgrid[0:height, 0:width]
    if color_type in (0, 3):
        img = (((seed + x * 7 + y * 13) % 256).astype("uint8")
               .reshape(height, width, 1))
    else:
        chans = [((seed + x * 7 + y * 13 + c * 29) % 256) for c in range(3)]
        if color_type == 6:
            chans.append((seed + x * 11 + y * 3) % 256)
        img = np.stack(chans, axis=-1).astype("uint8")
    if filters is None:
        filters = [yy % 5 for yy in range(height)]

    def filter_lines(rows, pw):
        """Apply the chosen forward filters over one (sub-)image's rows."""
        lines = []
        prev = np.zeros(pw * nch, dtype=np.uint8)
        for yy in range(rows.shape[0]):
            cur = rows[yy]
            ftype = filters[yy % len(filters)]
            left = (
                np.concatenate([np.zeros(nch, np.uint8), cur[:-nch]])
                if pw > 1 else np.zeros_like(cur)
            )
            ul = (
                np.concatenate([np.zeros(nch, np.uint8), prev[:-nch]])
                if pw > 1 else np.zeros_like(prev)
            )
            if ftype == 0:
                filt = cur.copy()
            elif ftype == 1:
                filt = cur - left
            elif ftype == 2:
                filt = cur - prev
            elif ftype == 3:
                filt = cur - (
                    (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
                ).astype(np.uint8)
            else:  # Paeth
                a = left.astype(np.int32)
                up = prev.astype(np.int32)
                c = ul.astype(np.int32)
                p = a + up - c
                pa, pb, pc = np.abs(p - a), np.abs(p - up), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, up, c)
                ).astype(np.uint8)
                filt = cur - pred
            lines.append(bytes([ftype]) + filt.tobytes())
            prev = cur
        return lines

    if interlace:
        out_lines = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            out_lines += filter_lines(
                sub.reshape(sub.shape[0], sub.shape[1] * nch), sub.shape[1]
            )
    else:
        out_lines = filter_lines(img.reshape(height, width * nch), width)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, color_type, 0, 0, 1 if interlace else 0
    )
    body = chunk(b"IHDR", ihdr)
    if color_type == 3:
        body += chunk(
            b"PLTE", b"".join(bytes((i, i, i)) for i in range(256))
        )
    body += chunk(b"IDAT", zlib.compress(b"".join(out_lines)))
    body += chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


def synth_gif(width: int, height: int, seed: int = 0, interlaced: bool = False) -> bytes:
    """Deterministic in-memory GIF — fixture generator (pure Python).

    Pixels use the same closed form as the grayscale BMP/PNG fixtures:
    index of pixel (x, y) is ``(seed + x*7 + y*13) % 256`` over a 256-gray
    global color table.  The LZW stream is the trivially-valid encoding
    that emits a CLEAR code before every literal (code width stays at 9
    bits; the decoder must handle repeated table resets — deliberately
    exercising that path), LSB-first bit packing per the spec.
    """
    import struct

    clear, end = 256, 257
    if interlaced:  # rows emitted in the spec's 4-pass order
        row_order = [y for s_, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for y in range(s_, height, st)]
    else:
        row_order = list(range(height))
    codes = []
    for y in row_order:
        for x in range(width):
            codes.append(clear)
            codes.append((seed + x * 7 + y * 13) % 256)
    codes.append(end)
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([8])  # LZW min code size
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _synth_jpeg_const(
    width: int, height: int, value: int, grayscale=False, progressive=False
):
    import numpy as np

    from pulsar_message_filter_spark.operators.jpeg import (
        synth_jpeg,
        synth_jpeg_progressive,
    )

    px = np.full((height, width, 3), value, np.uint8)
    enc = synth_jpeg_progressive if progressive else synth_jpeg
    return enc(width, height, pixels=px, grayscale=grayscale)


@graded(
    "f12c_media_stats",
    oracle=None,  # python-side binary decode: no DuckDB analog
    section="F12,G5",
    description="REAL pixel/sample decode: uncompressed BMP + zlib-decoded "
    "PNG + LZW-decoded GIF + Huffman/IDCT-decoded baseline JPEG + PCM WAV "
    "fixture bytes -> per-channel means / RMS / duration via mapInPandas "
    "(rows-only)",
)
def f12c_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decodes a deterministic mixed media corpus — BMPs (24-bpp and
    8-bpp palette), PNGs (RGB with all five scanline filters, RGBA,
    palette — real DEFLATE decode via stdlib zlib), baseline JPEGs
    (4:2:0 color + grayscale — real Huffman + IDCT decode, see
    operators/jpeg.py), WAVs (8/16/32-bit PCM), truncated PNG/JPEG
    poison files, and an opaque blob — and emits the REAL decoded
    statistics.  ``sf_dir`` is unused: the corpus is synthesized (no
    media files ship in the testdata), which is exactly the fixture-byte
    strategy the pytest pins use."""
    corpus = _media_corpus()
    raw = spark.createDataFrame(corpus, "path string, content binary")
    return (
        raw.repartition(4)  # prove the stage is partition-parallel
        .mapInPandas(media_stats, schema=MEDIA_STATS_SCHEMA)
        .orderBy("path")
    )


def _media_corpus() -> list[tuple[str, bytes]]:
    """The deterministic mixed media corpus shared by the f12 graded
    queries (stats decode, header probe): BMPs, PNGs (incl. Adam7), GIF,
    JPEGs (4:2:0, grayscale, progressive), PCM WAVs, poison files, and an
    opaque blob."""
    return [
        ("img_24bpp.bmp", synth_bmp(32, 16, bpp=24, seed=3)),
        ("img_8bpp.bmp", synth_bmp(17, 9, bpp=8, seed=5)),
        ("img_rgb.png", synth_png(21, 13, color_type=2, seed=7)),
        ("img_rgba.png", synth_png(9, 7, color_type=6, seed=4)),
        ("img_pal.png", synth_png(15, 6, color_type=3, seed=2)),
        ("img_anim.gif", synth_gif(19, 11, seed=6)),
        ("img_adam7.png", synth_png(21, 13, color_type=2, seed=7, interlace=True)),
        ("tone_16bit.wav", synth_wav(4000, n_channels=2, rate=8000, bits=16)),
        ("tone_8bit.wav", synth_wav(1000, n_channels=1, rate=4000, bits=8)),
        ("tone_32bit.wav", synth_wav(600, n_channels=3, rate=16000, bits=32)),
        ("poison.png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16),
        ("opaque.bin", b"PAR1" + bytes(range(64))),
        # constant tiles decode pixel-EXACT through the lossy JPEG path
        # (all AC = 0, DC chosen so Annex-K quantization divides evenly:
        # (v-128)*8 % 16 == 0) — the one closed form a lossy codec can pin
        ("img_420.jpg", _synth_jpeg_const(20, 12, 200)),
        ("img_gray.jpg", _synth_jpeg_const(11, 7, 98, grayscale=True)),
        ("img_prog.jpg", _synth_jpeg_const(20, 12, 200, progressive=True)),
        ("poison.jpg", b"\xff\xd8" + b"\x00" * 16),
    ]


# ---------------------------------------------------------------------------
# F12 — audio analysis frames over REAL decoded PCM (windowed DSP features)
# ---------------------------------------------------------------------------

#: One row per analysis frame: energy (RMS), zero-crossing rate, peak.
AUDIO_FRAME_SCHEMA = (
    "path string, frame_idx long, start_ms double, rms double, zcr double, "
    "peak double"
)


def audio_frame_features(
    batches: Iterator[pd.DataFrame], frame: int = 256, hop: int = 128
):
    """mapInPandas stage: (path, content) WAV bytes → windowed DSP features.

    REAL signal processing on really-decoded PCM (``decode_wav_samples``):
    channels are averaged to mono (8-bit unsigned is centered first), then
    each length-``frame`` window at stride ``hop`` emits RMS energy,
    zero-crossing rate, and peak amplitude — the standard front-end for
    audio dedup / silence trimming / VAD-style quality filters.  Windowing
    is a numpy stride view (no per-sample Python), undecodable or
    compressed payloads emit nothing (poison-tolerant, same contract as
    ``media_stats``), and only FULL frames are emitted so every row's
    features are defined on exactly ``frame`` samples.
    """
    import numpy as np

    cols = ["path", "frame_idx", "start_ms", "rms", "zcr", "peak"]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = path.rsplit("/", 1)[-1]
            try:
                samples, rate = decode_wav_samples(bytes(content))
            except Exception:  # poison contract: malformed payloads emit nothing
                continue
            mono = samples.astype(np.float64)
            if samples.dtype == np.uint8:
                mono = mono - 128.0  # 8-bit PCM is unsigned per the spec
            mono = mono.mean(axis=1)
            if len(mono) < frame:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
            rms = np.sqrt((wins**2).mean(axis=1))
            zcr = (np.signbit(wins[:, 1:]) != np.signbit(wins[:, :-1])).mean(axis=1)
            peak = np.abs(wins).max(axis=1)
            for i in range(wins.shape[0]):
                rows.append(
                    (
                        name,
                        i,
                        round(i * hop * 1000.0 / rate, 4),
                        round(float(rms[i]), 6),
                        round(float(zcr[i]), 6),
                        float(peak[i]),
                    )
                )
        yield pd.DataFrame(rows, columns=cols)


@graded(
    "f12d_audio_frames",
    oracle=None,  # python-side PCM decode + windowed DSP: no DuckDB analog;
    # pytest pins the features closed-form against the synth_wav formula.
    section="F12,G5",
    description="audio analysis frames: REAL PCM decode -> mono mixdown -> "
    "strided windows -> RMS / zero-crossing rate / peak per frame "
    "(poison-tolerant mapInPandas, rows-only)",
)
def f12d_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio features over a deterministic PCM corpus (8/16/32-bit,
    1-3 channels, mixed rates) plus a poison row that must vanish.
    ``sf_dir`` unused — no media ships in testdata (fixture-byte strategy,
    same as f12c)."""
    corpus = [
        ("tone_16bit.wav", synth_wav(4000, n_channels=2, rate=8000, bits=16)),
        ("tone_8bit.wav", synth_wav(1500, n_channels=1, rate=4000, bits=8)),
        ("tone_32bit.wav", synth_wav(900, n_channels=3, rate=16000, bits=32)),
        ("poison.wav", b"RIFF\x00\x00\x00\x00WAVEjunk"),
    ]
    raw = spark.createDataFrame(corpus, "path string, content binary")
    return (
        raw.repartition(2)
        .mapInPandas(audio_frame_features, schema=AUDIO_FRAME_SCHEMA)
        .orderBy("path", "frame_idx")
    )


#: One row per analysis frame: magnitude-spectrum shape descriptors.
AUDIO_SPECTRAL_SCHEMA = (
    "path string, frame_idx long, centroid_hz double, bandwidth_hz double, "
    "rolloff_hz double, flatness double"
)


def audio_spectral_features(
    batches: Iterator[pd.DataFrame], frame: int = 256, hop: int = 128
):
    """mapInPandas stage: (path, content) WAV bytes → spectral descriptors.

    Real DSP on really-decoded PCM: per analysis frame (Hann-windowed,
    numpy ``rfft``) it emits the spectral centroid, bandwidth (centroid-
    weighted spread), 85% rolloff frequency, and spectral flatness
    (geometric/arithmetic mean ratio) — the classic features behind audio
    quality filtering, music/speech discrimination, and near-silence
    detection.  All batch-vectorized numpy (the FFT runs on a (n_frames,
    frame) matrix at once); undecodable payloads emit nothing.
    """
    import numpy as np

    cols = ["path", "frame_idx", "centroid_hz", "bandwidth_hz", "rolloff_hz", "flatness"]
    hann = None
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = path.rsplit("/", 1)[-1]
            try:
                samples, rate = decode_wav_samples(bytes(content))
            except Exception:  # poison contract: malformed payloads emit nothing
                continue
            mono = samples.astype(np.float64)
            if samples.dtype == np.uint8:
                mono = mono - 128.0
            mono = mono.mean(axis=1)
            if len(mono) < frame:
                continue
            if hann is None or len(hann) != frame:
                # periodic Hann, closed form — recomputable in tests
                hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
            wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
            mag = np.abs(np.fft.rfft(wins * hann, axis=1))
            freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
            power = mag.sum(axis=1)
            safe = np.where(power > 0, power, 1.0)
            centroid = (mag * freqs).sum(axis=1) / safe
            spread = np.sqrt(
                (mag * (freqs - centroid[:, None]) ** 2).sum(axis=1) / safe
            )
            cum = np.cumsum(mag, axis=1)
            roll_idx = (cum >= 0.85 * power[:, None]).argmax(axis=1)
            rolloff = freqs[roll_idx]
            gmean = np.exp(np.log(mag + 1e-12).mean(axis=1))
            amean = mag.mean(axis=1) + 1e-12
            flat = gmean / amean
            for i in range(wins.shape[0]):
                rows.append(
                    (
                        name,
                        i,
                        round(float(centroid[i]), 4),
                        round(float(spread[i]), 4),
                        round(float(rolloff[i]), 4),
                        round(float(flat[i]), 6),
                    )
                )
        yield pd.DataFrame(rows, columns=cols)


@graded(
    "f12e_audio_spectral",
    oracle=None,  # FFT over python-decoded PCM: no DuckDB analog; pytest
    # recomputes the descriptors independently from the synth_wav formula.
    section="F12,G5",
    description="spectral audio descriptors: REAL PCM decode -> Hann + rfft "
    "per frame -> centroid / bandwidth / 85%-rolloff / flatness "
    "(batch-vectorized numpy, rows-only)",
)
def f12e_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral shape per analysis frame over the deterministic PCM corpus
    (same fixture-byte strategy as f12c/f12d; ``sf_dir`` unused)."""
    corpus = [
        ("tone_16bit.wav", synth_wav(4000, n_channels=2, rate=8000, bits=16)),
        ("tone_8bit.wav", synth_wav(1500, n_channels=1, rate=4000, bits=8)),
        ("poison.wav", b"RIFFxxxxWAVE"),
    ]
    raw = spark.createDataFrame(corpus, "path string, content binary")
    return (
        raw.repartition(2)
        .mapInPandas(audio_spectral_features, schema=AUDIO_SPECTRAL_SCHEMA)
        .orderBy("path", "frame_idx")
    )


#: One row per analysis frame: log-mel energies as a fixed-width CSV (no
#: array output columns — registry rule).
MEL_SCHEMA = "path string, frame_idx long, logmel_csv string"


def mel_filterbank(n_mels: int, frame: int, rate: int):
    """Triangular mel filterbank matrix ``(n_mels, frame//2 + 1)``.

    Standard HTK-style construction (public literature): mel(f) =
    2595·log10(1 + f/700); ``n_mels + 2`` equally-mel-spaced points from
    0 to Nyquist become triangle corners over the rfft bin grid.  Pure
    numpy; deterministic — tests recompute it independently.
    """
    import numpy as np

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = frame // 2 + 1
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    pts = from_mel(np.linspace(0.0, to_mel(rate / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / max(mid - lo, 1e-12)
        down = (hi - freqs) / max(hi - mid, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def mel_frame_features(
    batches: Iterator[pd.DataFrame],
    frame: int = 256,
    hop: int = 128,
    n_mels: int = 8,
):
    """mapInPandas stage: (path, content) WAV bytes → log-mel energies.

    The standard speech/audio front-end one level above
    :func:`audio_spectral_features`: Hann + rfft magnitude, triangular
    mel filterbank, log.  Batch-vectorized numpy (one matmul per file:
    ``(n_frames, n_bins) @ fb.T``); undecodable payloads emit nothing.
    Energies ship as a rounded CSV string (registry rule: no raw arrays).
    """
    import numpy as np

    cols = ["path", "frame_idx", "logmel_csv"]
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    fbs: dict = {}
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = path.rsplit("/", 1)[-1]
            try:
                samples, rate = decode_wav_samples(bytes(content))
            except Exception:  # poison contract: malformed payloads emit nothing
                continue
            mono = samples.astype(np.float64)
            if samples.dtype == np.uint8:
                mono = mono - 128.0
            mono = mono.mean(axis=1)
            if len(mono) < frame:
                continue
            if rate not in fbs:
                fbs[rate] = mel_filterbank(n_mels, frame, rate)
            wins = np.lib.stride_tricks.sliding_window_view(mono, frame)[::hop]
            mag = np.abs(np.fft.rfft(wins * hann, axis=1))
            logmel = np.log10(mag @ fbs[rate].T + 1e-10)
            for i in range(wins.shape[0]):
                rows.append(
                    (name, i, ",".join(f"{v:.4f}" for v in logmel[i]))
                )
        yield pd.DataFrame(rows, columns=cols)


@graded(
    "f12f_mel_filterbank",
    oracle=None,  # FFT + filterbank over python-decoded PCM: no DuckDB
    # analog; pytest recomputes the log-mel matrix independently.
    section="F12,G5",
    description="log-mel filterbank energies per analysis frame: REAL PCM "
    "decode -> Hann + rfft -> triangular mel filters -> log (one matmul "
    "per file, rows-only)",
)
def f12f_mel_filterbank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-ready audio representation over the deterministic PCM
    corpus (fixture-byte strategy; ``sf_dir`` unused)."""
    corpus = [
        ("tone_16bit.wav", synth_wav(4000, n_channels=2, rate=8000, bits=16)),
        ("tone_8bit.wav", synth_wav(1500, n_channels=1, rate=4000, bits=8)),
        ("poison.wav", b"RIFFjunk"),
    ]
    raw = spark.createDataFrame(corpus, "path string, content binary")
    return (
        raw.repartition(2)
        .mapInPandas(mel_frame_features, schema=MEL_SCHEMA)
        .orderBy("path", "frame_idx")
    )


# ---------------------------------------------------------------------------
# F12 — frame sampling (1→N fan-out) and resize (1→1 rewrite) stages
# ---------------------------------------------------------------------------

#: Frame-sampling output: one row PER SAMPLED FRAME (the 1→N batch shape a
#: video decoder produces).  Frame payloads stay binary; only metadata is
#: typed.
FRAME_SCHEMA = (
    "path string, frame_idx int, ts_ms long, frame_bytes binary, frame_len long"
)

FRAME_STRIDE_MS = 1000  # fake decoder: one "frame" per simulated second


def frame_sample_stub(
    batches: Iterator[pd.DataFrame], every_n: int = 2, real_decode: bool = False
):
    """mapInPandas stage: (path, content) → every ``every_n``-th frame.

    The deterministic fake treats each KiB of content as one frame (byte
    slice = frame payload; timestamps advance FRAME_STRIDE_MS per frame) so
    tests can assert exact fan-out counts and payloads.  The Spark-side
    contract this pins down is the part that survives a real decoder:
    input batches arrive per-file-partition, each input row may emit many
    output rows, and emitted frames carry their own binary payload plus
    typed metadata — downstream stages (dedup by frame hash, per-frame
    embedding) operate on this exact schema.
    """
    if real_decode:
        raise NotImplementedError(
            "real frame extraction requires a video library; "
            "this container intentionally ships the stub path only"
        )
    for pdf in batches:
        out: dict[str, list] = {c: [] for c in ("path", "frame_idx", "ts_ms", "frame_bytes", "frame_len")}
        for path, content in zip(pdf["path"], pdf["content"]):
            name = path.rsplit("/", 1)[-1]
            n_frames = max(1, len(content) // 1024)
            for idx in range(0, n_frames, every_n):
                frame = bytes(content[idx * 1024 : (idx + 1) * 1024])
                out["path"].append(name)
                out["frame_idx"].append(idx)
                out["ts_ms"].append(idx * FRAME_STRIDE_MS)
                out["frame_bytes"].append(frame)
                out["frame_len"].append(len(frame))
        yield pd.DataFrame(out)


def frame_samples(
    spark: SparkSession, glob_path: str, every_n: int = 2
) -> DataFrame:
    """binaryFile source → frame-sampling fan-out (one row per kept frame)."""
    raw = spark.read.format("binaryFile").load(glob_path).select("path", "content")
    return raw.mapInPandas(
        lambda it: frame_sample_stub(it, every_n=every_n), schema=FRAME_SCHEMA
    )


#: Resize output: same row count as input, rewritten payload + typed dims.
#: ``decoded`` disambiguates the payload convention (ADVICE r06): true →
#: ``width*height*3`` interleaved RGB bytes from a real decode; false →
#: ``width*height`` truncated/zero-padded raw bytes (the stub fallback).
RESIZE_SCHEMA = "path string, width int, height int, decoded boolean, pixels binary"


def resize_stub(
    batches: Iterator[pd.DataFrame],
    width: int = 8,
    height: int = 8,
    real_decode: bool = False,
):
    """mapInPandas stage: (path, content) → fixed-size "pixel" payloads.

    Deterministic fake resize: truncate/zero-pad content to width*height
    bytes.  Pins the 1→1 rewrite shape (payload replaced, metadata typed),
    which is identical under a real image library.

    ``real_decode=True`` performs a REAL nearest-neighbor resize for
    every format ``decode_pixels`` handles — BMP, PNG (incl. Adam7), GIF,
    and JPEG in both modes (integer index sampling, RGB bytes out) — no
    image library needed; undecodable content falls back to the
    deterministic stub payload so a mixed corpus never kills the stage.  The ``decoded``
    flag tells consumers which of the two payload conventions a row
    carries (RGB triplets vs raw bytes).
    """
    cols = ["path", "width", "height", "decoded", "pixels"]
    if real_decode:
        import numpy as np

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                b = bytes(content)
                try:
                    img = decode_pixels(b)
                    ys = (np.arange(height) * img.shape[0]) // height
                    xs = (np.arange(width) * img.shape[1]) // width
                    px = img[ys][:, xs].tobytes()
                    ok = True
                except Exception:  # poison contract: fall back to the stub payload
                    px = bytes(b[: width * height]).ljust(width * height, b"\x00")
                    ok = False
                rows.append((name, width, height, ok, px))
            yield pd.DataFrame(rows, columns=cols)
        return
    size = width * height
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "path": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                "width": width,
                "height": height,
                "decoded": False,
                "pixels": content.map(
                    lambda b: bytes(b[:size]).ljust(size, b"\x00")
                ),
            }
        )


@graded(
    "f12b_frame_sample",
    oracle=None,  # binaryFile + python-side framing: no DuckDB analog
    section="F12,A8,G5",
    description="frame-sampling fan-out: binary corpus -> one row per kept "
    "frame (1->N mapInPandas batch shape) + per-frame digest dedup (rows-only)",
)
def f12b_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem is the largest fixture binary → hundreds of fake frames
    frames = frame_samples(spark, f"{sf_dir}/lineitem.parquet", every_n=2)
    # downstream consumer shape: exact frame-level dedup by content digest
    return (
        frames.withColumn("frame_sha1", F.sha1("frame_bytes"))
        .groupBy("frame_sha1")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("frame_idx").alias("first_frame_idx"),
        )
        .orderBy("first_frame_idx", "frame_sha1")
    )


# ---------------------------------------------------------------------------
# F12 — header-only media probe: metadata WITHOUT decode
# ---------------------------------------------------------------------------

PROBE_SCHEMA = (
    "path string, media_kind string, probe_ok boolean, width int, "
    "height int, sample_rate int, bits int, progressive boolean, "
    "n_bytes long, probe_bytes long"
)


def _probe_one(b: bytes) -> dict:
    """Parse ONLY the container header: kind, dimensions/rate, and how many
    bytes the parse actually consumed.  Never touches entropy-coded or
    sample data."""
    import struct as _struct

    out = {
        "media_kind": "opaque", "probe_ok": False,
        "width": None, "height": None, "sample_rate": None, "bits": None,
        "progressive": None, "probe_bytes": 0,
    }
    if b[:2] == b"BM" and len(b) >= 30:
        out["media_kind"] = "bmp"
        w, h = _struct.unpack_from("<ii", b, 18)
        (bpp,) = _struct.unpack_from("<H", b, 28)
        out.update(width=w, height=abs(h), bits=bpp, probe_ok=True,
                   probe_bytes=30)
    elif b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 26 and b[12:16] == b"IHDR":
            w, h = _struct.unpack_from(">II", b, 16)
            out.update(media_kind="png", width=w, height=h, bits=b[24],
                       probe_ok=True, probe_bytes=26)
        else:
            out["media_kind"] = "png"
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            w, h = _struct.unpack_from("<HH", b, 6)
            out.update(media_kind="gif", width=w, height=h, probe_ok=True,
                       probe_bytes=10)
        else:
            out["media_kind"] = "gif"
    elif b[:2] == b"\xff\xd8":
        out["media_kind"] = "jpeg"
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                break  # marker desync: header-level poison
            marker = b[pos + 1]
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
                break
            (seg_len,) = _struct.unpack_from(">H", b, pos + 2)
            if marker in (0xC0, 0xC1, 0xC2) and pos + 2 + seg_len <= len(b):
                bits = b[pos + 4]
                h, w = _struct.unpack_from(">HH", b, pos + 5)
                out.update(width=w, height=h, bits=bits,
                           progressive=(marker == 0xC2), probe_ok=True,
                           probe_bytes=pos + 2 + seg_len)
                break
            pos += 2 + seg_len
    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        out["media_kind"] = "wav"
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (clen,) = _struct.unpack_from("<I", b, pos + 4)
            if cid == b"fmt " and pos + 8 + 16 <= len(b):
                ch, rate = _struct.unpack_from("<HI", b, pos + 10)
                (bits,) = _struct.unpack_from("<H", b, pos + 22)
                out.update(sample_rate=rate, bits=bits, width=ch,
                           probe_ok=True, probe_bytes=pos + 8 + clen)
                break
            pos += 8 + clen + (clen & 1)
    return out


def media_header_probe(batches: Iterator[pd.DataFrame]):
    """mapInPandas stage: (path, content) → container metadata ONLY.

    The 100 TB pattern this pins: a metadata pass that reads O(header)
    bytes per object lets the pipeline ROUTE before it DECODES — partition
    by kind, drop out-of-spec dimensions, budget decode work, quarantine
    header-level poison — at a tiny fraction of full-decode cost.
    ``probe_bytes`` records how much of each payload the parse actually
    consumed (pytest pins it ≪ ``n_bytes`` for entropy-coded kinds); with
    a binaryFile-style source the same bound becomes a ranged read.
    Poison contract as everywhere in F12: a malformed payload yields a
    ``probe_ok=false`` row, never a stage failure.
    """
    cols = [
        "path", "media_kind", "probe_ok", "width", "height",
        "sample_rate", "bits", "progressive", "n_bytes", "probe_bytes",
    ]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            b = bytes(content)
            try:
                r = _probe_one(b)
            except Exception:  # header-level poison: quarantine, don't fail
                r = {
                    "media_kind": "opaque", "probe_ok": False, "width": None,
                    "height": None, "sample_rate": None, "bits": None,
                    "progressive": None, "probe_bytes": 0,
                }
            rows.append(
                (
                    path.rsplit("/", 1)[-1], r["media_kind"], r["probe_ok"],
                    r["width"], r["height"], r["sample_rate"], r["bits"],
                    r["progressive"], len(b), r["probe_bytes"],
                )
            )
        yield pd.DataFrame(rows, columns=cols)


@graded(
    "f12g_header_probe",
    oracle=None,  # python-side binary parse: no DuckDB analog
    section="F12,G5,A8",
    description="header-only media probe: container metadata (kind, dims, "
    "rate, bits, progressive flag) from O(header) bytes per object — the "
    "route-before-decode metadata pass; probe_bytes recorded per row "
    "(rows-only; pytest pins probe dims == full-decode dims)",
)
def f12g_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame(_media_corpus(), "path string, content binary")
    return (
        raw.repartition(4)
        .mapInPandas(media_header_probe, schema=PROBE_SCHEMA)
        .orderBy("path")
    )
