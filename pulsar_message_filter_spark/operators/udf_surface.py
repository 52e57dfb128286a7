"""G-series graded queries — the UDF / UDAF / UDTF surface (SURVEY.md §2.G).

Design rule: UDFs are the escape hatch, not the hot path.  These queries
exist to prove every Python-extension surface works (row UDF, Arrow-batched
pandas UDF/UDAF, grouped map, mapInPandas, UDTF) — and that *deterministic*
UDF logic remains oracle-gradable: where the Python computes exact
integer/string results, the DuckDB twin is still supplied.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

# ---------------------------------------------------------------------------
# G1 — row-at-a-time scalar UDF (deterministic → still oracle-graded)
# ---------------------------------------------------------------------------


@graded(
    "g1_scalar_udf",
    oracle="""
        SELECT doc_id,
               CASE WHEN len(string_split(text, ' ')) % 2 = 0 THEN 'even' ELSE 'odd' END
                 AS parity
        FROM documents WHERE doc_id < 100
    """,
    section="G1",
    description="row-at-a-time Python UDF computing a deterministic label "
    "(the slow path — kept off hot queries by design)",
)
def g1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    parity = F.udf(lambda t: "even" if len(t.split(" ")) % 2 == 0 else "odd", "string")
    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 100)
        .select("doc_id", parity("text").alias("parity"))
    )


# ---------------------------------------------------------------------------
# G2/G3 — pandas scalar UDF + grouped-agg pandas UDAF
# ---------------------------------------------------------------------------


@graded(
    "g3_pandas_udaf",
    oracle="""
        SELECT lang,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq_chars,
               count(*) AS n
        FROM documents GROUP BY 1
    """,
    section="G2,G3",
    description="Arrow-batched pandas UDAF (grouped agg) over exact integers — "
    "oracle-graded because int64 sums are order-independent",
)
def g3_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def sum_sq(chars: pd.Series) -> int:
        c = chars.astype("int64")
        return int((c * c).sum())

    @F.pandas_udf("long")
    def n_rows(chars: pd.Series) -> int:
        return len(chars)

    # note: Spark disallows mixing group-agg pandas UDFs with built-in
    # aggregates in one agg() — so the count is a pandas UDAF too
    return (
        load(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            sum_sq("n_chars").alias("sum_sq_chars"),
            n_rows("n_chars").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# G4 — grouped map (applyInPandas): per-group deterministic reduction
# ---------------------------------------------------------------------------


@graded(
    "g4_grouped_map",
    oracle="""
        SELECT label,
               count(*) AS n_vecs,
               min(vec_id) AS min_vec,
               max(vec_id) AS max_vec
        FROM embeddings GROUP BY 1
    """,
    section="G4",
    description="applyInPandas grouped map — whole group as one pandas frame; "
    "deterministic int outputs stay oracle-graded",
)
def g4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vecs": [len(pdf)],
                "min_vec": [int(pdf["vec_id"].min())],
                "max_vec": [int(pdf["vec_id"].max())],
            }
        )

    return (
        load(spark, "embeddings", sf_dir)
        .groupBy("label")
        .applyInPandas(
            reduce_group, "label int, n_vecs long, min_vec bigint, max_vec bigint"
        )
    )


# ---------------------------------------------------------------------------
# G5 — mapInPandas: whole-partition streaming transform
# ---------------------------------------------------------------------------


@graded(
    "g5_map_in_pandas",
    oracle="""
        SELECT doc_id, n_chars,
               n_chars - len(replace(text, ' ', '')) + 1 AS n_tokens
        FROM documents WHERE doc_id < 100
    """,
    section="G5",
    description="mapInPandas partition transform (the batch-scoring shape) — "
    "deterministic arithmetic, oracle-graded",
)
def g5_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "n_chars"]].copy()
            out["n_tokens"] = pdf["text"].str.split(" ").map(len)
            yield out

    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 100)
        .mapInPandas(score, "doc_id bigint, n_chars bigint, n_tokens long")
    )


# ---------------------------------------------------------------------------
# G6 — Python UDTF (table function): shingle expansion
# ---------------------------------------------------------------------------


@graded(
    "g6_udtf_shingles",
    oracle="""
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(string_split(text,' ')) - 2),
                      i -> string_split(text,' ')[i] || ' ' ||
                           string_split(text,' ')[i+1] || ' ' ||
                           string_split(text,' ')[i+2])) AS shingle
        FROM documents WHERE doc_id < 30
    """,
    section="G6",
    description="Python UDTF generating 3-token shingle rows per document",
)
def g6_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="shingle: string")
    class Shingler:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield (" ".join(toks[i : i + 3]),)

    spark.udtf.register("shingler", Shingler)
    load(spark, "documents", sf_dir).filter(F.col("doc_id") < 30).createOrReplaceTempView(
        "g6_docs"
    )
    return spark.sql(
        "SELECT doc_id, s.shingle FROM g6_docs, LATERAL shingler(text) s"
    )


# ---------------------------------------------------------------------------
# G5 — mapInArrow: zero-copy Arrow-batch transform
# ---------------------------------------------------------------------------


@graded(
    "g5b_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(len(text) AS BIGINT) AS text_len,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents WHERE doc_id < 100
    """,
    section="G5",
    description="mapInArrow partition transform: pyarrow.compute kernels "
    "(utf8_length / split_pattern / list_value_length) on the raw Arrow "
    "batch — no pandas materialization at all, the cheapest Python-side "
    "path when the logic is expressible in Arrow kernels",
)
def g5b_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow twin of g5: same per-doc features computed with
    ``pyarrow.compute`` kernels directly on each ``RecordBatch``.  Skips
    the Arrow→pandas→Arrow round-trip ``mapInPandas`` pays, which matters
    when batches are wide or string-heavy (pandas object arrays)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def features(batches):
        for batch in batches:
            doc_id = batch.column(batch.schema.get_field_index("doc_id"))
            text = batch.column(batch.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_id,
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int64(),
                    ),
                ],
                ["doc_id", "text_len", "n_tokens"],
            )

    return (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .mapInArrow(features, "doc_id bigint, text_len bigint, n_tokens bigint")
    )
