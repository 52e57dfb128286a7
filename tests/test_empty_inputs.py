"""Empty-input robustness: every core operator must return an empty frame
with the right schema — not crash — when a filter upstream leaves nothing.
At 100 TB an empty partition/day/source is routine, and a pipeline that
dies on it pages someone at 3am."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE


def _empty_docs(spark):
    return load(spark, "documents", SF_SMOKE).filter(F.col("doc_id") < 0)


def test_dedup_ops_on_empty_corpus(spark):
    from pulsar_message_filter_spark.operators.dedup import (
        connected_components,
        dedup_exact,
        minhash_near_dups,
        pagerank_lite,
    )

    empty = _empty_docs(spark)
    assert dedup_exact(empty, "text", "doc_id").count() == 0
    assert minhash_near_dups(empty, "text", "doc_id").count() == 0
    no_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(no_pairs).count() == 0
    assert pagerank_lite(no_pairs).count() == 0


def test_bloom_ops_on_empty_sides(spark):
    from pulsar_message_filter_spark.operators.dedup import (
        bloom_build,
        bloom_dedup_incremental,
    )

    docs = load(spark, "documents", SF_SMOKE).limit(20)
    empty = _empty_docs(spark)
    # empty history: everything in the batch survives
    assert bloom_dedup_incremental(docs, empty).count() == 20
    # empty batch: nothing out, no crash
    assert bloom_dedup_incremental(empty, docs).count() == 0
    # empty build yields the all-zero filter
    filt = bloom_build(empty.select(F.xxhash64("text").alias("h")))
    assert int(filt.sum()) == 0


def test_sketches_and_stats_on_empty_input(spark):
    from pulsar_message_filter_spark.operators.ngrams import survivor_pick
    from pulsar_message_filter_spark.operators.features import winsorize
    from pulsar_message_filter_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        hll_registers,
    )
    from pulsar_message_filter_spark.operators.text import token_entropy

    empty_events = load(spark, "events", SF_SMOKE).filter(F.col("event_id") < 0)
    assert cms_build(empty_events, "user_id").count() == 0
    assert hll_registers(empty_events, "user_id").count() == 0
    # probing an empty sketch returns 0 estimates (coalesced), not nulls
    keys = spark.createDataFrame([(1,), (2,)], ["user_id"])
    ests = cms_estimate(cms_build(empty_events, "user_id"), keys, "user_id").collect()
    assert sorted(r.est for r in ests) == [0, 0]
    assert token_entropy(_empty_docs(spark)).count() == 0
    assert (
        winsorize(
            empty_events.select("event_type", F.lit(1).cast("long").alias("v")),
            F.col("v"),
            "event_type",
        ).count()
        == 0
    )
    no_pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    quality = spark.createDataFrame([(1, 10)], ["doc_id", "n_chars"])
    assert survivor_pick(no_pairs, quality).count() == 0


def test_round5_ops_on_empty_input(spark):
    from pulsar_message_filter_spark.operators.cdc import agg_delta, apply_agg_delta
    from pulsar_message_filter_spark.operators.dedup import prefix_filter_jaccard
    from pulsar_message_filter_spark.operators.graph import (
        cooccurrence_edges,
        khop_counts,
        triangle_count,
    )
    from pulsar_message_filter_spark.operators.sketch import (
        histogram_bins,
        histogram_quantiles,
        weighted_median,
    )
    from pulsar_message_filter_spark.operators.text import unigram_surprisal
    from pulsar_message_filter_spark.operators.timeseries import max_concurrency

    empty_docs = _empty_docs(spark)
    assert prefix_filter_jaccard(empty_docs).count() == 0
    assert unigram_surprisal(empty_docs).count() == 0

    no_edges = spark.createDataFrame([], "u bigint, v bigint")
    assert triangle_count(no_edges).collect()[0].n_triangles == 0
    no_groups = spark.createDataFrame([], "g bigint, item bigint")
    assert cooccurrence_edges(no_groups, "g", "item").count() == 0
    seeds = spark.createDataFrame([(1,)], "seed long")
    # seeds with no edges: only hop-0 rows survive
    got = khop_counts(no_edges, seeds, 2).collect()
    assert [(r.hop, r.n_nodes) for r in got] == [(0, 1)]

    no_vals = spark.createDataFrame([], "x double")
    hist = histogram_bins(no_vals, "x")
    assert histogram_quantiles(hist, [0.5]).count() == 0
    no_w = spark.createDataFrame([], "id long, g string, v long, w long")
    assert weighted_median(no_w, "g", F.col("v"), F.col("w")).count() == 0

    no_iv = spark.createDataFrame([], "k string, s long, e long")
    assert max_concurrency(no_iv, "k", "s", "e").count() == 0

    base = spark.createDataFrame([], "g long, n_orders long, total_cents long")
    chg = spark.createDataFrame([], "g long, dn long, dcents long")
    assert apply_agg_delta(base, agg_delta(chg, "g"), "g").count() == 0


def test_round7_ops_on_empty_inputs(spark):
    from pulsar_message_filter_spark.operators.dedup import (
        pagerank_lite_int,
        winnowing_fingerprints,
    )
    from pulsar_message_filter_spark.operators.graph import node_triangle_counts

    empty = _empty_docs(spark)
    assert winnowing_fingerprints(empty).count() == 0
    no_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert pagerank_lite_int(no_pairs).count() == 0
    no_edges = spark.createDataFrame([], "u bigint, v bigint")
    assert node_triangle_counts(no_edges).count() == 0


def test_round11_ops_on_empty_inputs(spark):
    from pulsar_message_filter_spark.operators.dedup import cluster_survivors
    from pulsar_message_filter_spark.operators.mixture import epoch_shuffle
    from pulsar_message_filter_spark.operators.multimodal import (
        AUDIO_FRAME_SCHEMA,
        AUDIO_SPECTRAL_SCHEMA,
        audio_frame_features,
        audio_spectral_features,
    )
    from pulsar_message_filter_spark.operators.scrub import (
        k_anonymity_audit,
        suppress_small_groups,
    )

    empty_docs = _empty_docs(spark)
    assert epoch_shuffle(empty_docs, "doc_id", epoch=1).count() == 0

    empty_cust = load(spark, "customer", SF_SMOKE).filter("c_custkey < 0")
    audit = k_anonymity_audit(empty_cust, ["c_nationkey"], "c_acctbal")
    assert audit.count() == 0
    assert suppress_small_groups(empty_cust, ["c_nationkey"], "c_acctbal").count() == 0
    # suppression with NO failing groups keeps every record
    full = load(spark, "customer", SF_SMOKE)
    assert (
        suppress_small_groups(full, ["c_mktsegment"], "c_acctbal", k=1, min_l=1).count()
        == full.count()
    )

    no_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    quality = spark.createDataFrame([(1, 10)], ["doc_id", "n_chars"])
    assert cluster_survivors(no_pairs, quality, "doc_id", "n_chars").count() == 0

    # audio stages on an empty / non-audio binary corpus: empty, right schema
    empty_bin = spark.createDataFrame([], "path string, content binary")
    assert empty_bin.mapInPandas(audio_frame_features, AUDIO_FRAME_SCHEMA).count() == 0
    junk = spark.createDataFrame([("x.bin", b"not audio")], "path string, content binary")
    assert junk.mapInPandas(audio_spectral_features, AUDIO_SPECTRAL_SCHEMA).count() == 0


def test_tws_batch_twins_on_empty_stream(spark):
    """The three E8 batch twins (round 12) must return empty frames with
    their full schemas when the upstream filter leaves nothing."""
    from pulsar_message_filter_spark.streaming.pipeline import (
        redelivery_counter_batch,
        session_ttl_batch,
        user_profile_batch,
    )

    empty = load(spark, "events", SF_SMOKE).filter(F.col("event_id") < 0)
    sess = session_ttl_batch(empty)
    assert sess.columns == [
        "user_id", "session_start_ms", "session_end_ms", "n_events",
    ]
    assert sess.count() == 0
    prof = user_profile_batch(empty)
    assert prof.columns == [
        "user_id", "n_types", "top_type", "n_events", "recent_csv",
    ]
    assert prof.count() == 0
    assert redelivery_counter_batch(empty).count() == 0


def test_jpeg_single_pixel_roundtrip():
    """The degenerate 1x1 image — a single MCU that is almost entirely
    edge padding — must round-trip exactly (constant tile, exact DC)."""
    import numpy as np

    from pulsar_message_filter_spark.operators.jpeg import (
        decode_jpeg_pixels,
        synth_jpeg,
    )

    px = np.full((1, 1, 3), 160, np.uint8)
    out = decode_jpeg_pixels(synth_jpeg(1, 1, pixels=px))
    assert out.shape == (1, 1, 3)
    assert int(np.abs(out.astype(int) - 160).max()) == 0


def test_sliding_distinct_on_empty_input(spark):
    """Empty input: the auto pre-flight must estimate 0 (→ exact), and
    every method must return an empty frame with the right schema."""
    from pulsar_message_filter_spark.operators.windows import (
        sliding_distinct,
        sliding_key_space,
    )

    empty = load(spark, "events", SF_SMOKE).filter(F.col("event_id") < 0)
    assert sliding_key_space(empty, "ts", "user_id", "4 hours", "1 hour") == 0
    for method in ("auto", "exact", "approx", "hll"):
        out = sliding_distinct(
            empty, "ts", "user_id", "4 hours", "1 hour", method=method
        )
        assert out.count() == 0
        assert {"ws_us", "n_distinct"} <= set(out.columns)
