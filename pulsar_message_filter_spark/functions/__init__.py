"""The engine's public Column-function surface (SURVEY.md §2.D/F helpers).

Everything here is pure Column algebra — usable in batch and streaming,
Catalyst-optimizable, UDF-free (the design rule of SURVEY §2.G).
"""

from pulsar_message_filter_spark.operators.dedup import canonical_text, shingles
from pulsar_message_filter_spark.operators.parity import (
    avg2,
    avg2_final,
    avg2_sql,
    cents,
    cents_sql,
)
from pulsar_message_filter_spark.operators.similarity import (
    cosine,
    dot,
    l2_normalize,
    lsh_bucket,
    norm,
)
from pulsar_message_filter_spark.operators.text import ngrams, quality_flags, tokens

__all__ = [
    "canonical_text",
    "shingles",
    "cents",
    "cents_sql",
    "avg2",
    "avg2_final",
    "avg2_sql",
    "dot",
    "norm",
    "cosine",
    "l2_normalize",
    "lsh_bucket",
    "tokens",
    "ngrams",
    "quality_flags",
]
