"""The README quickstart must actually run (doc-rot guard)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_quickstart_batch(spark):
    from pulsar_message_filter_spark import load, Selector
    from pulsar_message_filter_spark.filtering import route

    events = load(spark, "events", SF_ORACLE)
    sel = Selector("props.k > 50 AND event_type IN ('purchase', 'error')")
    accepted = sel.apply(events)
    assert accepted.count() > 0
    assert "TRY_CAST(json_extract_string(props" in sel.duckdb_sql()

    verdicts = route(events, accept=sel, reschedule="value >= 150")
    assert set(verdicts) == {"ACCEPT", "REJECT", "RESCHEDULE"}
    assert sum(df.count() for df in verdicts.values()) == events.count()
