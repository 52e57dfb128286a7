"""Tests for corpus scrubbing (PII/domain) and profiling (shard/histogram) ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.profiling import (
    histogram,
    shard_assign,
    shard_balance,
)
from pulsar_message_filter_spark.operators.scrub import (
    domain_profile,
    f25_pii_scrub,
    f26_domain_profile,
    pii_scrub,
)
from pulsar_message_filter_spark.operators.profiling import (
    f27_shard_balance,
    f28_price_histogram,
)
from tests.conftest import SF_SMOKE


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "write to bob@corp.com or call 555-1234 now"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.io"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pii_scrub(df, "text").collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "[EMAIL]" in out[1].text and "[PHONE]" in out[1].text
    assert "bob@corp.com" not in out[1].text and "555-1234" not in out[1].text
    assert out[2].n_email == 0 and out[2].n_phone == 0 and out[2].text == "no pii here"
    assert out[3].n_email == 2 and out[3].text.count("[EMAIL]") == 2


def test_graded_pii_scrub_has_negatives_and_no_leftover_pii(spark):
    rows = f25_pii_scrub(spark, SF_SMOKE).collect()
    assert any(r.n_email == 0 for r in rows) and any(r.n_email > 0 for r in rows)
    assert any(r.n_phone == 0 for r in rows) and any(r.n_phone > 0 for r in rows)
    assert all("@" not in r.text for r in rows)  # every email redacted
    assert all("555-" not in r.text for r in rows)


def test_domain_profile_counts_docs_vs_urls(spark):
    df = spark.createDataFrame(
        [
            (1, "x https://a.com/1 y https://a.com/2 z https://b.org/"),
            (2, "https://a.com/ only"),
        ],
        ["doc_id", "text"],
    )
    out = {r.domain: r for r in domain_profile(df, "text").collect()}
    assert out["a.com"].n_docs == 2 and out["a.com"].n_urls == 3
    assert out["b.org"].n_docs == 1 and out["b.org"].n_urls == 1


def test_graded_domain_profile_mass_conserved(spark):
    docs = load(spark, "documents", SF_SMOKE)
    n_docs = docs.count()
    n_mirror = docs.filter(F.col("doc_id") % 4 == 0).count()
    out = f26_domain_profile(spark, SF_SMOKE)
    assert out.agg(F.sum("n_urls")).collect()[0][0] == n_docs + n_mirror


def test_shard_assign_deterministic_uniform_and_stable(spark):
    docs = load(spark, "documents", SF_SMOKE).select("doc_id")
    a = {r.doc_id: r.shard for r in shard_assign(docs, "doc_id", 8).collect()}
    b = {
        r.doc_id: r.shard
        for r in shard_assign(docs.repartition(7), "doc_id", 8).collect()
    }
    assert a == b  # content-addressed: stable under repartitioning
    assert set(a.values()) == set(range(8))
    counts = shard_balance(shard_assign(docs, "doc_id", 8)).collect()
    n = sum(r.n_rows for r in counts)
    assert all(abs(r.n_rows - n / 8) < 0.5 * n / 8 for r in counts)  # rough balance


def test_shard_assign_rejects_bad_width(spark):
    import pytest

    docs = load(spark, "documents", SF_SMOKE).select("doc_id")
    with pytest.raises(ValueError):
        shard_assign(docs, "doc_id", 5)


def test_shard_256_path(spark):
    docs = load(spark, "documents", SF_SMOKE).select("doc_id")
    shards = shard_assign(docs, "doc_id", 64).select("shard").distinct().collect()
    assert all(0 <= r.shard < 64 for r in shards)
    assert len(shards) > 32  # 500 docs over 64 uniform shards hit most cells


def test_histogram_bucket_arithmetic(spark):
    df = spark.createDataFrame([(0.0,), (29.9,), (30.0,), (95.0,)], ["v"])
    out = {r.bucket: r.n for r in histogram(df, "v", 30.0).collect()}
    assert out == {0: 2, 1: 1, 3: 1}


def test_graded_histogram_mass_conserved(spark):
    orders = load(spark, "orders", SF_SMOKE)
    out = f28_price_histogram(spark, SF_SMOKE)
    assert out.agg(F.sum("n")).collect()[0][0] == orders.count()
    rows = out.collect()
    assert all(r.min_cents >= r.bucket * 3000000 for r in rows)
    assert all(r.max_cents < (r.bucket + 1) * 3000000 for r in rows)


def test_graded_shard_balance_covers_all_docs(spark):
    out = f27_shard_balance(spark, SF_SMOKE).collect()
    docs = load(spark, "documents", SF_SMOKE)
    assert sum(r.n_rows for r in out) == docs.count()
    assert sum(r.total_weight for r in out) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )


def test_train_val_test_split_partitions_and_is_stable(spark):
    from pulsar_message_filter_spark.operators.sampling import train_val_test_split

    docs = load(spark, "documents", SF_SMOKE).select("doc_id")
    a = {r.doc_id: r.split for r in train_val_test_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in train_val_test_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b  # split membership survives re-sharding
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 5 * (c["val"] + c["test"])  # ~90/5/5


def test_label_balanced_sample_caps_every_label(spark):
    from pulsar_message_filter_spark.operators.sampling import label_balanced_sample

    emb = load(spark, "embeddings", SF_SMOKE).select("label", "vec_id")
    out = label_balanced_sample(emb, "label", "vec_id", 10)
    counts = {r.label: r.n for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()}
    full = {r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    for label, n in counts.items():
        assert n == min(10, full[label])
    # deterministic: same pick twice
    s1 = sorted(map(tuple, out.collect()))
    s2 = sorted(map(tuple, label_balanced_sample(emb, "label", "vec_id", 10).collect()))
    assert s1 == s2
