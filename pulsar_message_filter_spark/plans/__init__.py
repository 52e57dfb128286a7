"""Physical-plan inspection helpers (SURVEY.md §4)."""

from pulsar_message_filter_spark.plans.inspect import (
    has_broadcast_hash_join,
    plan_fingerprint,
    has_cartesian_product,
    plan_str,
    pushed_filters,
    uses_take_ordered,
    whole_stage_codegen_spans,
)

__all__ = [
    "plan_str",
    "plan_fingerprint",
    "pushed_filters",
    "has_broadcast_hash_join",
    "has_cartesian_product",
    "uses_take_ordered",
    "whole_stage_codegen_spans",
]
