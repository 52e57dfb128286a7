"""F-series: multimodal binary columns (SURVEY.md §2.F12, A8, G5).

Images/audio/video are opaque ``BinaryType`` columns with typed metadata.
The Spark-side plumbing is real and tested: the ``binaryFile`` source,
content digests, magic-byte sniffing, and an Arrow-batched ``mapInPandas``
feature-extraction stage with a documented batch shape.

The actual media decode is STUBBED (this container ships no image/audio
libraries): ``decode_stub`` produces a *deterministic fake* feature row
derived from the raw bytes, and raises ``NotImplementedError`` when real
decoding is requested — swap the body for PIL/librosa in production; the
schema, partitioning, and UDF signature do not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.registry import graded

#: Output schema of the feature-extraction stage — fixed regardless of the
#: decoder implementation.
FEATURE_SCHEMA = (
    "path string, byte_len long, magic string, sha1 string, "
    "fake_width int, fake_height int"
)


def decode_stub(batches: Iterator[pd.DataFrame], real_decode: bool = False):
    """mapInPandas stage: (path, content) batches → feature rows.

    Deterministic fake: "dimensions" are derived from the first content
    bytes, so tests can assert exact values.  ``real_decode=True`` is the
    marked extension point for an actual media library.
    """
    import hashlib

    if real_decode:
        raise NotImplementedError(
            "real media decoding requires an image/audio library; "
            "this container intentionally ships the stub path only"
        )
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "path": pdf["path"].map(lambda p: p.rsplit("/", 1)[-1]),
                "byte_len": content.map(len),
                "magic": content.map(lambda b: b[:4].decode("latin1")),
                "sha1": content.map(lambda b: hashlib.sha1(b).hexdigest()),
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
