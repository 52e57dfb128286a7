"""F-series: multimodal binary columns (SURVEY.md §2.F12, A8, G5).

Images/audio/video are opaque ``BinaryType`` columns with typed metadata.
The Spark-side plumbing is real and tested: the ``binaryFile`` source,
content digests, magic-byte sniffing, and an Arrow-batched ``mapInPandas``
feature-extraction stage with a documented batch shape.

BMP/PNG/GIF and WAV *header metadata* extraction is REAL — width/height
and sample-rate/channel-count are pure-struct parses of the public
BMP/PNG/GIF/RIFF layouts, no media library needed.  Full pixel/sample
decoding is STUBBED (this container ships no image/audio libraries):
``decode_stub`` produces a *deterministic fake* feature row derived from
the raw bytes for unrecognized magics, and raises
``NotImplementedError`` when full decoding is requested — swap the body
for PIL/librosa in production; the schema, partitioning, and UDF
signature do not change.
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
            "full pixel/sample decoding requires an image/audio library; "
            "this container ships header parsing (BMP/WAV) + the stub only"
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
RESIZE_SCHEMA = "path string, width int, height int, pixels binary"


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
    """
    if real_decode:
        raise NotImplementedError(
            "real image resizing requires an image library; "
            "this container intentionally ships the stub path only"
        )
    size = width * height
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "path": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                "width": width,
                "height": height,
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
