"""Sources & sinks (SURVEY.md §2.A).

Batch parquet (A1/A2) lives in :mod:`pulsar_message_filter_spark.io`;
streaming stand-ins (A4) and the gated Pulsar connector wiring (A3/A5)
live here.
"""

from pulsar_message_filter_spark.sources.streams import (
    EVENT_STREAM_SCHEMA,
    file_message_stream,
    rate_message_stream,
)
from pulsar_message_filter_spark.sources.pulsar import (
    pulsar_sink_writer,
    pulsar_stream_reader,
)

__all__ = [
    "EVENT_STREAM_SCHEMA",
    "file_message_stream",
    "rate_message_stream",
    "pulsar_stream_reader",
    "pulsar_sink_writer",
]
