"""Sampling operators (SURVEY.md §2.C26 extensions).

Three tiers by reproducibility:

* ``sample(fraction, seed)`` — reproducible within Spark, but the RNG is
  engine-specific → rows-only (``sample_seeded`` in relational.py).
* ``sampleBy`` — stratified per-key fractions, same RNG caveat →
  rows-only, with ground-truth proportion tests in pytest.
* **content-hash sampling** — ``md5(key)`` prefix thresholding.  md5 is
  identical everywhere, so the *same rows* are selected by Spark, DuckDB,
  or any other engine — the only sampling that is reproducible across
  engines, re-runs, AND cluster topologies.  This is the right default
  for 100 TB pipelines: sampling decisions become content-addressed
  (join-stable, resumable, auditable) instead of RNG-state-dependent.
  Oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded


def hash_sample(df: DataFrame, key, hex_threshold: str = "0d") -> DataFrame:
    """Deterministic content-hash sample: keep rows whose ``md5(key)`` hex
    prefix sorts below ``hex_threshold`` (2 hex chars → threshold/256 ≈
    fraction; '0d' ≈ 5%).  Lexicographic compare of lowercase hex is
    engine-portable — no RNG, no bit-casting dialects."""
    key_col = F.col(key) if isinstance(key, str) else key
    return df.filter(F.substring(F.md5(key_col.cast("string")), 1, 2) < hex_threshold)


@graded(
    "sample_hash_deterministic",
    oracle="""
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
    """,
    section="C26,D8",
    description="content-hash sampling (~5%): md5-prefix threshold selects "
    "the SAME rows on every engine — the reproducible-sampling scale "
    "pattern; oracle-checked exactly, unlike RNG sampling",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return hash_sample(orders, "o_orderkey", "0d").select("o_orderkey", "o_orderstatus")


@graded(
    "sample_stratified",
    oracle=None,  # sampleBy RNG is engine-specific (same class as C26 seeded)
    section="C26",
    description="stratified sampleBy: per-status fractions, fixed seed — "
    "rows-only; proportions ground-truth-tested in pytest",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return orders.sampleBy(
        "o_orderstatus", fractions={"F": 0.10, "O": 0.05, "P": 0.50}, seed=42
    ).select("o_orderkey", "o_orderstatus")
