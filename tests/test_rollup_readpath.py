"""Rollup read-path graded queries (VERDICT r06 #6): the multi-epoch
store build + merge-on-read answers are pinned against ground truth —
the MG undercount theorem and the KLL rank-error bound — at SF_SMOKE."""

from conftest import SF_SMOKE

EPOCHS = 3
MG_K = 12  # must match operators.rollup_queries._MG_K


def test_mg_rollup_readpath_undercount_bound(spark):
    """Mergeable Misra-Gries (Agarwal et al.): estimates never overcount,
    and total undercount after merging epoch summaries and recompressing
    stays <= n/(k+1) with n = total events across all epochs."""
    from pulsar_message_filter_spark.registry import all_graded

    est = {
        r["user_id"]: r["est_count"]
        for r in all_graded()["stream_mg_rollup_readpath"].fn(spark, SF_SMOKE).collect()
    }
    assert est, "rollup read path returned no heavy hitters"
    assert len(est) <= MG_K

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    true = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").count().withColumnRenamed("count", "c").collect()
    }
    n = sum(true.values())
    bound = n / (MG_K + 1)
    for uid, w in est.items():
        assert 0 < w <= true[uid], (uid, w, true[uid])
        assert true[uid] - w <= bound, (uid, w, true[uid], bound)


def test_kll_rollup_readpath_rank_error(spark):
    """The merged 3-epoch KLL estimates stay inside the pinned rank-error
    bound (self-measured in-result), for every key and percentile."""
    from pulsar_message_filter_spark.registry import all_graded

    rows = all_graded()["stream_kll_rollup_readpath"].fn(spark, SF_SMOKE).collect()
    n_types = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert len(rows) == 4 * n_types  # 4 percentiles per key
    for r in rows:
        assert r["rank_error"] <= 0.03, (r["event_type"], r["p"], r["rank_error"])
        assert r["sketch_n"] > 0


def test_rollup_readpath_store_is_epoch_keyed(spark, tmp_path):
    """The emulated store uses the same epoch-keyed layout as the streaming
    sinks: replaying one epoch rewrites only its own partition (exactly-once
    discipline), leaving other epochs' summaries bit-identical."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.streaming.pipeline import (
        mg_epoch_summary,
        read_mg_rollup,
    )

    store = str(tmp_path / "store")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")

    def write_epoch(e: int) -> None:
        (
            mg_epoch_summary(
                events.filter(F.col("event_id") % EPOCHS == e), "user_id", k=MG_K
            )
            .withColumn("epoch_id", F.lit(e))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(store)
        )

    for e in range(EPOCHS):
        write_epoch(e)
    before = sorted(map(tuple, read_mg_rollup(spark, store, k=MG_K).collect()))
    write_epoch(1)  # replayed micro-batch
    after = sorted(map(tuple, read_mg_rollup(spark, store, k=MG_K).collect()))
    assert before == after


def test_cms_rollup_readpath_merge_identity(spark, tmp_path):
    """Sum-merging per-epoch CMS cells equals building the sketch over the
    whole table (merge exactness), and an epoch present in only ONE of the
    two stores is excluded from the merge (the crash-consistency rule)."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.sketch import cms_build, hll_registers
    from pulsar_message_filter_spark.streaming.pipeline import read_sketch_rollup

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    store = str(tmp_path / "store")

    def write(df, sub, e):
        (df.withColumn("epoch_id", F.lit(e))
           .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
           .partitionBy("epoch_id").parquet(f"{store}/{sub}"))

    for e in range(EPOCHS):
        batch = events.filter(F.col("event_id") % EPOCHS == e)
        write(cms_build(batch, "user_id"), "cms", e)
        write(hll_registers(batch, "user_id"), "hll", e)
    merged, _ = read_sketch_rollup(spark, store)
    direct = cms_build(events, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    # torn epoch: CMS written, HLL missing → that epoch must drop out
    write(cms_build(events.limit(5), "user_id"), "cms", 99)
    merged2, _ = read_sketch_rollup(spark, store)
    assert sorted(map(tuple, merged2.collect())) == sorted(map(tuple, direct.collect()))


def test_sketch_store_compaction_preserves_rollup_reads(spark, tmp_path):
    """Round-19 (epoch-growth probe consequence): compact_parquet on a
    CLOSED sketch store — epoch_id demotes from partition dir to data
    column — must leave read_sketch_rollup's merged answer AND the
    torn-epoch consistency rule byte-identical, with fewer files."""
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.sketch import cms_build, hll_registers
    from pulsar_message_filter_spark.streaming.compaction import (
        compact_parquet,
        sink_file_stats,
    )
    from pulsar_message_filter_spark.streaming.pipeline import read_sketch_rollup

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    store = str(tmp_path / "store")

    def write(df, sub, e):
        (df.withColumn("epoch_id", F.lit(e))
           .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
           .partitionBy("epoch_id").parquet(f"{store}/{sub}"))

    for e in range(EPOCHS):
        batch = events.filter(F.col("event_id") % EPOCHS == e)
        write(cms_build(batch, "user_id"), "cms", e)
        write(hll_registers(batch, "user_id"), "hll", e)
    # torn epoch BEFORE compaction: cms half only — must stay excluded after
    write(cms_build(events.limit(5), "user_id"), "cms", 99)

    cms_before, hll_before = read_sketch_rollup(spark, store)
    cms_rows = sorted(map(tuple, cms_before.collect()))
    hll_rows = sorted(map(tuple, hll_before.collect()))

    for sub in ("cms", "hll"):
        r = compact_parquet(
            spark, f"{store}/{sub}", target_file_bytes=1 << 30,
            min_files_to_compact=2,
        )
        assert r["compacted"] and r["files_after"] < r["files_before"]
        assert sink_file_stats(spark, f"{store}/{sub}")["n_files"] == r["files_after"]

    cms_after, hll_after = read_sketch_rollup(spark, store)
    assert sorted(map(tuple, cms_after.collect())) == cms_rows
    assert sorted(map(tuple, hll_after.collect())) == hll_rows
    # epochs= filter still works on the demoted column
    one_epoch_cms, _ = read_sketch_rollup(spark, store, epochs=[0])
    direct = cms_build(events.filter(F.col("event_id") % EPOCHS == 0), "user_id")
    assert sorted(map(tuple, one_epoch_cms.collect())) == sorted(
        map(tuple, direct.collect())
    )
