"""Shared-dialect SQL surface: the defining property is that the Spark SQL
text IS the oracle SQL text — assert it stays that way, and that the
queries run through ``spark.sql`` over the registered views."""

from __future__ import annotations

from pulsar_message_filter_spark import registry
from pulsar_message_filter_spark.operators.sql_surface import SHARED_SQL
from tests.conftest import SF_SMOKE


def test_shared_sql_oracle_is_the_query_text():
    graded = registry.all_graded()
    for name, sql in SHARED_SQL.items():
        assert graded[name].oracle == sql, name


def test_shared_sql_runs_on_spark(spark):
    graded = registry.all_graded()
    for name in SHARED_SQL:
        assert graded[name].fn(spark, SF_SMOKE).count() > 0, name
