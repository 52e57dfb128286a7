"""Measure the two exact top-k cosine paths against each other.

The engine's rule is "UDFs are the slow path — stay in codegen"; dense
linear algebra is the documented exception.  This tool quantifies it:
same exact top-k computation, (a) pure Column algebra (``zip_with`` +
``aggregate`` fold per pair, whole-stage codegen) vs (b) Arrow-batched
numpy matmul with partition-local top-k.  Corpus is the sf0.1 embeddings
replicated N× (key-shifted); queries are a fixed small block.

Usage::  python tools/udf_vs_jvm.py [replication=16] [n_queries=100]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.similarity import brute_topk, numpy_topk
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-udf-vs-jvm")
    base = load(spark, "embeddings", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    root = tempfile.mkdtemp(prefix="pmf_uvj_")
    try:
        copies = [
            base.select((F.col("vec_id") + i * 10_000_000).alias("vec_id"), "embedding", "label")
            for i in range(repl)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(f"{root}/emb.parquet")
        corpus = spark.read.parquet(f"{root}/emb.parquet")
        queries = corpus.filter(F.col("vec_id") < n_queries)
        n_corpus = corpus.count()

        def timed(df) -> float:
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2)

        t_np = timed(numpy_topk(spark, queries, corpus, k=10))
        t_jvm = timed(brute_topk(queries, corpus, k=10))
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "topk_cosine_path_compare",
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "pairs": n_corpus * n_queries,
                "jvm_column_algebra_sec": t_jvm,
                "numpy_arrow_matmul_sec": t_np,
                "speedup": round(t_jvm / t_np, 1) if t_np else None,
            }
        )
    )


if __name__ == "__main__":
    main()
