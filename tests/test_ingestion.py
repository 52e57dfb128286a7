"""The graded ingestion query must route exactly the malformed lines."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.ingestion import a_ingest_corrupt_routing
from tests.conftest import SF_SMOKE


def test_ingest_corrupt_routing_counts_are_exact(spark):
    docs = load(spark, "documents", SF_SMOKE)
    n_total = docs.count()
    n_bad = docs.filter(F.col("doc_id") % 11 == 0).count()
    row = a_ingest_corrupt_routing(spark, SF_SMOKE).collect()[0]
    assert row.n_corrupt_total == n_bad
    assert row.n_clean_total == n_total - n_bad
    n_sources = docs.select("source").distinct().count()
    assert row.n_sources == n_sources
