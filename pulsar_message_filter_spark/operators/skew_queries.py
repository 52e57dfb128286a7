"""Graded surface for skew mitigation (F14): salting must be invisible.

``functions/skew.py`` implements two-stage salted aggregation; the graded
query here proves the property that makes it usable: **the rewrite is
semantically invisible** — the oracle is the plain single-stage GROUP BY,
and the hash gate asserts bit-equality of every aggregate.

The events table groups by ``event_type`` (5 values over 10k+ rows — a
hot-key shape by construction: each key is ~20% of the table).  Salting
sprays each key over 16 sub-keys (deterministic ``xxhash64(event_id)``
salt), pre-aggregates, then combines — exact for decomposable aggregates
(sum/count/min/max in integer cents).

Scale notes: stage 1's reducers scale with n_salts × keys instead of
keys; stage 2 touches only keys × n_salts partial rows.  This is the
aggregation-side complement of AQE's skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.skew import salted_agg
from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded


@graded(
    "salted_hot_key_agg",
    oracle=f"""
        SELECT event_type,
               count(*) AS n,
               CAST(sum({cents_sql('value')}) AS BIGINT) AS total_cents,
               max({cents_sql('value')}) AS max_cents
        FROM events GROUP BY 1
    """,
    section="F14,C11",
    description="salted two-stage aggregation over a hot-key distribution "
    "(5 keys, 16 salts): the oracle is the PLAIN single-stage GROUP BY -- "
    "hash equality proves the skew rewrite is semantically invisible",
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    return salted_agg(
        events,
        ["event_type"],
        {
            "n": ("sum", F.count("*")),
            "total_cents": ("sum", F.sum(cents("value"))),
            "max_cents": ("max", F.max(cents("value"))),
        },
        n_salts=16,
        salt_source="event_id",
    )
