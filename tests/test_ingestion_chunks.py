"""Chunk-reassembly contracts beyond the fixture corpus: the synthetic
corners the graded query's hash can't reach on real documents."""

from __future__ import annotations

from pyspark.sql import functions as F


def _reassemble(spark, rows):
    """Run the graded query's reassembly core on hand-built chunk rows
    ``(doc_id, idx, part)`` with the same sorted-collect discipline."""
    chunks = spark.createDataFrame(rows, "doc_id long, idx int, part string")
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_seen"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "part"))),
                lambda x: x.part,
            ),
        ).alias("payload"),
    )


def test_out_of_order_chunks_reassemble_in_idx_order(spark):
    rows = [(1, 3, "cc"), (1, 1, "aa"), (1, 4, "dd"), (1, 2, "bb")]
    got = _reassemble(spark, rows).collect()[0]
    assert got.payload == "aabbccdd" and got.n_seen == 4


def test_empty_lost_chunk_is_intact_but_incomplete(spark):
    """The corner the graded docstring names: payload shorter than one
    stride → the lost chunk is '', so the reassembled bytes equal the
    original even though the group is incomplete.  intact and
    is_complete MUST stay independent."""
    original = "xy"  # stride for 4 chunks of a 2-char payload: c=1 -> parts x,y,'',''
    # chunk 4 ('' part) lost:
    rows = [(7, 1, "x"), (7, 2, "y"), (7, 3, "")]
    got = _reassemble(spark, rows).collect()[0]
    assert got.n_seen == 3  # incomplete
    assert got.payload == original  # yet byte-intact


def test_fixture_grade_has_no_empty_lost_chunks(spark):
    """Pin the fixture precondition the graded query's docstring states:
    on the real corpus every dropped chunk is non-empty, so
    incomplete ⇒ non-intact in the graded output.  A regenerated
    testdata set with ultra-short documents trips this immediately."""
    from pulsar_message_filter_spark.registry import all_graded
    from tests.conftest import SF_SMOKE

    df = all_graded()["chunk_reassembly"].fn(spark, SF_SMOKE)
    bad = df.filter(~F.col("is_complete") & F.col("intact")).count()
    incomplete = df.filter(~F.col("is_complete")).count()
    assert bad == 0
    assert incomplete > 0  # the lost-chunk rule is live on the fixtures
