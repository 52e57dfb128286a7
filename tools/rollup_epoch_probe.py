"""How does sketch-store merge-on-read scale in EPOCHS?

The rollup stores' scale claim (rollup_queries.py, streaming/pipeline.py)
is "the store grows in EPOCHS, not events": per-epoch state is bounded
(≤64 HLL register rows, ≤4×1024 CMS cells), so a reader merging a year
of hourly epochs (~8.8k) touches epochs × bounded rows.  This probe
measures that read path directly at E ∈ {10, 100, 1000} epochs with
REALISTIC store layout (one parquet partition per epoch — exactly what
the foreachBatch sinks produce), isolating two costs the claim glosses
over:

* the MERGE itself (groupBy over E × bounded rows — should be trivial), and
* the FILE-LISTING/small-files overhead of E partition directories —
  the cost that actually bites epoch-granular stores at scale, and the
  reason ``streaming/compaction.py`` (FFD bin-packing) exists.

Synthetic partials are deterministic (register/cell content derived from
the epoch id) — the probe measures plan+IO shape, not sketch math.

Usage::

    python tools/rollup_epoch_probe.py            # E = 10, 100, 1000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.session import get_spark
    from pulsar_message_filter_spark.streaming.pipeline import read_sketch_rollup

    spark = get_spark("pmf-rollup-epoch-probe")
    root = tempfile.mkdtemp(prefix="pmf_epoch_probe_")
    out = []
    try:
        for n_epochs in (10, 100, 1000):
            store = os.path.join(root, f"e{n_epochs}")
            # one job writes ALL epoch partitions (identical layout to the
            # per-epoch dynamic-overwrite sinks: store/{cms,hll}/epoch_id=N/)
            epochs = spark.range(n_epochs).withColumnRenamed("id", "epoch_id")
            hll = epochs.crossJoin(
                spark.range(64).withColumnRenamed("id", "register")
            ).select(
                "epoch_id",
                "register",
                ((F.col("register") * 7 + F.col("epoch_id")) % 20 + 1).alias(
                    "max_rho"
                ),
            )
            cms = epochs.crossJoin(
                spark.range(4 * 1024).withColumnRenamed("id", "cid")
            ).select(
                "epoch_id",
                (F.col("cid") % 4).alias("row"),
                (F.col("cid") / 4).cast("long").alias("cell"),
                ((F.col("cid") + F.col("epoch_id")) % 97 + 1).alias("cnt"),
            )
            for name, df in (("hll", hll), ("cms", cms)):
                df.repartition("epoch_id").write.mode("overwrite").partitionBy(
                    "epoch_id"
                ).parquet(os.path.join(store, name))

            def read_merge():
                t0 = time.time()
                merged_cms, merged_hll = read_sketch_rollup(spark, store)
                # force both merges through a full materialization
                merged_cms.write.format("noop").mode("overwrite").save()
                merged_hll.write.format("noop").mode("overwrite").save()
                return time.time() - t0

            read_merge()  # warm (footer/listing caches)
            sec = round(min(read_merge(), read_merge()), 3)
            out.append({"epochs": n_epochs, "merge_read_sec": sec})
            print(f"E={n_epochs:>5}: merge-on-read {sec}s", file=sys.stderr)

        # compacted leg: the SAME E=1000 data rewritten into a few files
        # (epoch_id demoted to a data column — read_sketch_rollup's
        # consistency semi-join only needs the column, not the layout).
        # This quantifies what streaming/compaction.py's FFD pass buys
        # the read side once epoch granularity stops paying for itself.
        compacted = os.path.join(root, "e1000_compacted")
        for name in ("hll", "cms"):
            spark.read.parquet(os.path.join(root, "e1000", name)).repartition(
                4
            ).write.mode("overwrite").parquet(os.path.join(compacted, name))

        def read_merge_c():
            t0 = time.time()
            merged_cms, merged_hll = read_sketch_rollup(spark, compacted)
            merged_cms.write.format("noop").mode("overwrite").save()
            merged_hll.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        read_merge_c()
        sec_c = round(min(read_merge_c(), read_merge_c()), 3)
        out.append({"epochs": 1000, "compacted": True, "merge_read_sec": sec_c})
        print(f"E= 1000 (compacted to 4 files/side): {sec_c}s", file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    import math

    t1, t2 = out[0]["merge_read_sec"], out[2]["merge_read_sec"]
    print(
        json.dumps(
            {
                "rows_per_epoch": {"hll": 64, "cms": 4096},
                "legs": out,
                "exponent_10_to_1000": round(math.log(t2 / t1) / math.log(100), 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
