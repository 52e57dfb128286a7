"""Graded-query registry — the bridge to the driver contract.

Every operator from SURVEY.md §2 that is *done* has exactly one entry here:
a named query callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are SQL-expressible, the equivalent DuckDB oracle SQL
(``__spark_entry__.queries()`` / ``oracle_sql()`` read this registry).

Conventions enforced by the decorator contract:

* every computed/aggregate column is aliased identically in the Spark query
  and the oracle SQL (the driver sorts columns by name before hashing);
* float aggregates are rounded (2dp unless noted) on BOTH sides — double
  summation order differs across engines/partitionings (SURVEY §7.4.3);
* timestamp outputs are rendered to strings or epoch integers — never raw
  timestamp objects — to dodge tz/precision representation drift;
* ``oracle=None`` marks a deliberately rows-only operator (approx sketches,
  LSH, sampling) per the driver's weaker check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class GradedQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    section: str  # SURVEY.md §2 row ids, e.g. "B1,B3"
    description: str


_REGISTRY: dict[str, GradedQuery] = {}


def graded(
    name: str,
    oracle: str | None = None,
    section: str = "",
    description: str = "",
) -> Callable:
    """Register a graded query.  Use as a decorator on the query callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate graded query {name!r}")
        _REGISTRY[name] = GradedQuery(name, fn, oracle, section, description)
        return fn

    return deco


def all_graded() -> dict[str, GradedQuery]:
    _load_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: g.fn for n, g in all_graded().items()}


def oracle_sql() -> dict[str, str]:
    return {n: g.oracle for n, g in all_graded().items() if g.oracle is not None}


_LOADED = False


def _load_modules() -> None:
    """Import every operator module so its @graded decorators run."""
    global _LOADED
    if _LOADED:
        return
    import pulsar_message_filter_spark.operators.selector_queries  # noqa: F401
    import pulsar_message_filter_spark.operators.relational  # noqa: F401
    import pulsar_message_filter_spark.operators.workload  # noqa: F401
    import pulsar_message_filter_spark.operators.sql_surface  # noqa: F401
    import pulsar_message_filter_spark.operators.sampling  # noqa: F401
    import pulsar_message_filter_spark.operators.scalar_functions  # noqa: F401
    import pulsar_message_filter_spark.operators.windows  # noqa: F401
    import pulsar_message_filter_spark.operators.dedup  # noqa: F401
    import pulsar_message_filter_spark.operators.similarity  # noqa: F401
    import pulsar_message_filter_spark.operators.text  # noqa: F401
    import pulsar_message_filter_spark.operators.multimodal  # noqa: F401
    import pulsar_message_filter_spark.operators.udf_surface  # noqa: F401
    import pulsar_message_filter_spark.operators.features  # noqa: F401
    import pulsar_message_filter_spark.operators.mixture  # noqa: F401

    _LOADED = True
