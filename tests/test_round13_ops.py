"""Round-13 ops: ADVICE-r09 hardening pins + this round's widening queries.

Covers the fork-safety guard in tmpdirs (an exiting fork()ed child must
not rmtree the parent's live run root) and the empty-subscription parity
guard on selector_fanout_nway's oracle.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_run_root_survives_forked_child_exit():
    """A fork()ed child inherits _RUN_ROOT and the atexit hook; its exit
    must NOT delete the parent's still-live run root (ADVICE r09)."""
    from pulsar_message_filter_spark import tmpdirs

    path = tmpdirs.run_scoped_dir("fork_guard_probe")
    os.makedirs(path, exist_ok=True)
    assert tmpdirs._OWNER_PID == os.getpid()

    pid = os.fork()
    if pid == 0:  # child: run the cleanup hook directly, then hard-exit
        try:
            tmpdirs._cleanup()
        finally:
            os._exit(0)
    _, status = os.waitpid(pid, 0)
    assert os.waitstatus_to_exitcode(status) == 0
    assert os.path.isdir(path), "child exit wiped the parent's run root"


def test_fanout_oracle_emits_no_row_for_empty_subscription():
    """Each oracle branch carries GROUP BY/HAVING so a zero-match
    subscription yields NO row — matching Spark's filter(matched) side
    (ADVICE r09: ungrouped branches emit (0, NULL) on empty input)."""
    import duckdb

    from pulsar_message_filter_spark.registry import all_graded

    oracle = all_graded()["selector_fanout_nway"].oracle
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE, "
                "user_id BIGINT, props VARCHAR)")
    # Empty table: every subscription matches nothing → zero rows total.
    out = con.execute(oracle).fetchall()
    assert out == []


def test_g6b_chunker_covers_every_token_exactly_once(spark):
    """Chunk rows reassemble to the original text: concat of chunk_text in
    chunk_idx order == text, n_tokens sums to the token count, and the
    last chunk is the only one allowed to be short."""
    from pulsar_message_filter_spark.operators.widen2 import (
        _CHUNK,
        g6b_udtf_chunker,
    )

    out = g6b_udtf_chunker(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        assert " ".join(r.chunk_text for r in rows) == docs[doc_id]
        toks = docs[doc_id].split(" ")
        assert sum(r.n_tokens for r in rows) == len(toks)
        for r in rows[:-1]:
            assert r.n_tokens == _CHUNK  # only the tail may be short


def test_g4b_gap_rank_matches_window_form(spark):
    """The grouped-map output must equal the pure window-function plan —
    the mechanism check the oracle does, pinned locally too."""
    from pyspark.sql import Window

    from pulsar_message_filter_spark.operators.widen2 import (
        g4b_grouped_map_gap_rank,
    )

    got = sorted(
        (tuple(r) for r in g4b_grouped_map_gap_rank(spark, SF_SMOKE).collect())
    )
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    w = Window.partitionBy("label").orderBy("vec_id")
    want = sorted(
        tuple(r)
        for r in emb.select(
            "label",
            "vec_id",
            F.row_number().over(w).cast("long").alias("rnk"),
            (
                F.col("vec_id")
                - F.coalesce(F.lag("vec_id").over(w), F.col("vec_id"))
            ).cast("long").alias("gap"),
        ).collect()
    )
    assert got == want


def test_b7_composite_buckets_are_exhaustive_and_disjoint(spark):
    """n_rows over the three buckets partitions the table; the NULL
    bucket skips every value (n_nonnull=0, sum coalesced to 0)."""
    from pulsar_message_filter_spark.operators.widen2 import (
        b7_null_3vl_composite,
    )

    rows = {r.bucket: r for r in b7_null_3vl_composite(spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert sum(r.n_rows for r in rows.values()) == ev.count()
    assert rows["NULL"].n_nonnull == 0
    assert rows["NULL"].sum_cents == 0
    assert rows["NULL"].n_rows == ev.filter(F.col("event_type") == "error").count()
    for b in ("MID", "EDGE"):
        assert rows[b].n_nonnull == rows[b].n_rows


def test_density_preserving_replicate_semantics(spark, tmp_path):
    """The SCALING round-14 claims rest on this fixture contract:
    each events copy gets a DISJOINT user population, every user keeps
    exactly their original event count (per-user density constant), and
    copy i's timestamps shift by the documented jitter."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import scale_smoke

    old = scale_smoke.BASE_SF_DIR
    scale_smoke.BASE_SF_DIR = SF_SMOKE
    try:
        out = str(tmp_path / "x2")
        scale_smoke.replicate(spark, 2, out, density_preserving=True)
        base = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        rep = spark.read.parquet(f"{out}/events.parquet")

        assert rep.count() == 2 * base.count()
        # disjoint user populations: copy 1's users sit exactly one
        # USER_SHIFT above copy 0's
        base_users = {r.user_id for r in base.select("user_id").distinct().collect()}
        rep_users = {r.user_id for r in rep.select("user_id").distinct().collect()}
        assert rep_users == base_users | {
            u + scale_smoke.USER_SHIFT for u in base_users
        }
        # per-user density constant: every user (old and shifted) keeps
        # exactly their original event count
        base_counts = {
            r.user_id: r.n
            for r in base.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        rep_counts = {
            r.user_id: r.n
            for r in rep.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        for u, n in base_counts.items():
            assert rep_counts[u] == n
            assert rep_counts[u + scale_smoke.USER_SHIFT] == n
        # copy 1's timestamps shift by the documented jitter (ts may read
        # as ns-int64 under nanosAsLong or as timestamp)
        t0 = base.selectExpr("min(ts) AS m").collect()[0].m
        t1 = rep.filter(F.col("user_id") >= scale_smoke.USER_SHIFT).selectExpr(
            "min(ts) AS m"
        ).collect()[0].m
        if isinstance(t0, int):
            assert t1 - t0 == scale_smoke._JITTER_MS * 1_000_000
        else:
            assert (t1 - t0).total_seconds() == scale_smoke._JITTER_MS / 1000.0
    finally:
        scale_smoke.BASE_SF_DIR = old
