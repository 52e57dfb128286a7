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


def test_quickstart_curation(spark):
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark import load
    from pulsar_message_filter_spark.operators.dedup import dedup_near
    from pulsar_message_filter_spark.operators.mixture import (
        build_training_mixture,
        pack_sequences,
    )

    docs = load(spark, "documents", SF_ORACLE)
    unique = dedup_near(docs, threshold=0.8)
    assert 0 < unique.count() <= docs.count()
    mixed = build_training_mixture(
        unique, "lang", {"en": 0.5, "zh": 0.2, "es": 0.15, "de": 0.1, "fr": 0.05}
    )
    assert 0 < mixed.count() < unique.count()
    packs = pack_sequences(mixed, budget=1024)
    assert packs.filter(F.col("pack_id") < 0).count() == 0
    assert packs.count() == mixed.count()


def test_quickstart_sliding_distinct(spark):
    from pulsar_message_filter_spark import load
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    events = load(spark, "events", SF_ORACLE)
    reach = sliding_distinct(
        events, "ts", "user_id", "6 hours", "2 hours", method="auto"
    )
    rows = reach.collect()
    assert rows and {"ws_us", "n_distinct"} <= set(reach.columns)
    assert all(r.n_distinct > 0 for r in rows)

    # README's string-key example: event_type folds to a long scan-side
    types = sliding_distinct(
        events, "ts", "event_type", "6 hours", "2 hours", method="hll"
    )
    trows = types.collect()
    assert trows and {"ws_us", "n_distinct"} <= set(types.columns)
    assert all(r.n_distinct > 0 for r in trows)
