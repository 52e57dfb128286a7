"""Structured-Streaming layer (SURVEY.md §2.E, §3.3)."""

from pulsar_message_filter_spark.streaming.compaction import (
    compact_if_needed,
    compact_parquet,
    sink_file_stats,
)
from pulsar_message_filter_spark.streaming.pipeline import (
    filtered_sink_pipeline,
    streaming_dedup_pipeline,
    stateful_user_stats,
    throttle_stateful,
    windowed_event_counts,
)

__all__ = [
    "filtered_sink_pipeline",
    "streaming_dedup_pipeline",
    "windowed_event_counts",
    "stateful_user_stats",
    "throttle_stateful",
    "compact_if_needed",
    "compact_parquet",
    "sink_file_stats",
]
