"""TWELFTH differential fuzz family: windowed-merge algebra fuzz.

The round-19 windowed-merge quartet grades per-DAY partials on the
fixture corpus; the underlying claim is algebraic — for ANY partition of
the rows into windows, merging per-window partials equals a direct
whole-range build:

* HLL registers merge by per-register MAX,
* CMS cells merge by cell SUM,
* KMV bottom-k merges by union-then-re-take-bottom-k (min-set algebra),
* fixed-bin histograms merge by bin SUM (exact).

This family draws SEEDED RANDOM frames (key cardinality, value range,
frequency shape incl. a hot key, number of windows, and a RANDOM —
not hash-structured — window assignment) and checks each identity
Spark-side.  No oracle needed: the identity itself is the witness, and
the graded queries pin the cross-engine half on the fixtures.
"""

from __future__ import annotations

import random
import zlib

import pytest
from pyspark.sql import functions as F


def _synth(spark, seed: int):
    """Seeded synthetic frame: (window, key, value) with a skewed key."""
    rng = random.Random(zlib.crc32(b"wmerge") ^ seed)
    n = rng.randint(3000, 8000)
    n_keys = rng.randint(40, 1500)
    n_windows = rng.randint(2, 9)
    hot_share = rng.choice([0, 0.4])  # sometimes one key owns 40% of rows
    rows = []
    for i in range(n):
        if hot_share and rng.random() < hot_share:
            k = 0
        else:
            k = rng.randint(0, n_keys - 1)
        rows.append((rng.randint(0, n_windows - 1), k, rng.randint(0, 50_000)))
    return (
        spark.createDataFrame(rows, "w int, key long, value long"),
        n_windows,
    )


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_hll_register_max_merge_equals_direct(spark, seed):
    from pulsar_message_filter_spark.operators.sketch import (
        hll_registers,
        hll_registers_by,
    )

    df, _ = _synth(spark, seed)
    direct = {
        (r.register,): r.max_rho for r in hll_registers(df, "key").collect()
    }
    partials = hll_registers_by(df, "key", [F.col("w")])
    merged = {
        (r.register,): r.max_rho
        for r in partials.groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == direct


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_cms_cell_sum_merge_equals_direct(spark, seed):
    from pulsar_message_filter_spark.operators.sketch import cms_build, cms_merge

    df, _ = _synth(spark, seed)
    direct = sorted(tuple(r) for r in cms_build(df, "key").collect())
    merged = sorted(
        tuple(r)
        for r in cms_merge(cms_build(df, "key", group_cols=[F.col("w")])).collect()
    )
    assert merged == direct


@pytest.mark.parametrize("seed", [21, 22])
def test_kmv_bottomk_union_rerank_equals_direct(spark, seed):
    """Min-set algebra on the real hash column: every whole-range
    bottom-k hash is in its own window's bottom-k."""
    K = 64
    df, _ = _synth(spark, seed)
    h = F.conv(
        F.substring(F.md5(F.col("key").cast("string")), 1, 8), 16, 10
    ).cast("long")
    hashed = df.select("w", h.alias("h"))
    direct = [
        r.h
        for r in hashed.select("h")
        .distinct()
        .orderBy("h")
        .limit(K)
        .collect()
    ]
    from pyspark.sql import Window

    w_win = Window.partitionBy("w").orderBy("h")
    partials = (
        hashed.distinct()
        .withColumn("rk", F.row_number().over(w_win))
        .filter(F.col("rk") <= K)
    )
    merged = [
        r.h
        for r in partials.select("h")
        .distinct()
        .orderBy("h")
        .limit(K)
        .collect()
    ]
    assert merged == direct


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_histogram_bin_sum_merge_equals_direct(spark, seed):
    from pulsar_message_filter_spark.operators.sketch import histogram_bins

    df, _ = _synth(spark, seed)
    direct = sorted(
        tuple(r) for r in histogram_bins(df, "value", width=256).collect()
    )
    partials = df.groupBy(
        "w", F.floor(F.col("value") / 256).cast("long").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    merged = sorted(
        tuple(r)
        for r in partials.groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect()
    )
    assert merged == direct
