"""Pin Spark's built-in skewness to the exact-integer-moments formula used
by the graded agg_moments_exact query (C13 estimator documentation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents
from tests.conftest import SF_SMOKE


def test_builtin_skewness_matches_population_formula(spark):
    li = load(spark, "lineitem", SF_SMOKE)
    c = cents("l_quantity")
    row = (
        li.agg(
            F.count("*").alias("n"),
            F.sum(c).alias("s1"),
            F.sum(c * c).alias("s2"),
            F.sum(c * c * c).alias("s3"),
            F.skewness((F.col("l_quantity"))).alias("builtin"),
        )
        .collect()[0]
    )
    n, s1, s2, s3 = row.n, row.s1, row.s2, row.s3
    m1, m2, m3 = s1 / n, s2 / n, s3 / n
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1**3) / var**1.5
    # Spark's skewness is the population estimator g1 — same formula
    assert abs(skew - row.builtin) < 1e-9, (skew, row.builtin)
