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


def hash_sample_stratified(
    df: DataFrame, key, strata_col: str, thresholds: dict[str, str]
) -> DataFrame:
    """Stratified content-hash sample: per-stratum md5-prefix thresholds
    give per-key-group fractions (2 hex chars → threshold/256) with the
    same engine-portable determinism as :func:`hash_sample` — the
    oracle-checkable counterpart of ``sampleBy``.  Strata not listed get
    fraction 0.  At scale this is a scan-side filter (no shuffle, no RNG
    state), and the selection is stable under repartitioning/resume."""
    key_col = F.col(key) if isinstance(key, str) else key
    thr = F.lit("00")
    for stratum, hexval in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(hexval)).otherwise(thr)
    return df.filter(F.substring(F.md5(key_col.cast("string")), 1, 2) < thr)


@graded(
    "sample_stratified",
    oracle="""
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <
              CASE o_orderstatus
                  WHEN 'F' THEN '1a' WHEN 'O' THEN '0d' WHEN 'P' THEN '80'
                  ELSE '00'
              END
    """,
    section="C26",
    description="stratified content-hash sampling: per-status md5-prefix "
    "thresholds (F~10%, O~5%, P~50%) select the SAME rows on every engine "
    "— oracle-checked exactly; the RNG sampleBy API is covered by pytest "
    "proportion tests (test_llm_ops)",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, "orders", sf_dir)
    return hash_sample_stratified(
        orders, "o_orderkey", "o_orderstatus", {"F": "1a", "O": "0d", "P": "80"}
    ).select("o_orderkey", "o_orderstatus")
