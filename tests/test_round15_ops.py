"""Round-15 ops: semantic pins for the widen3 queries.

Each pin is an INDEPENDENT witness — recomputed invariants or a numpy
re-derivation — not a rerun of the DuckDB oracle (check_parity already
does that).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _docs_split(spark):
    """The md5-prefix split rule, recomputed directly."""
    from pulsar_message_filter_spark.io import load

    return load(spark, "documents", SF_SMOKE).select(
        "doc_id",
        "lang",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6",
            F.lit("train"),
        )
        .otherwise("val")
        .alias("split"),
    )


def test_f82_counts_and_permille_consistent(spark):
    from pulsar_message_filter_spark.operators.widen3 import (
        f82_cross_split_contamination,
    )

    out = {r.lang: r for r in f82_cross_split_contamination(spark, SF_SMOKE).collect()}
    assert out, "no output rows"

    val_by_lang = {
        r.lang: r.n
        for r in _docs_split(spark)
        .where(F.col("split") == "val")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(out) == set(val_by_lang)
    for lang, r in out.items():
        assert r.n_val_docs == val_by_lang[lang]
        assert 0 <= r.n_contaminated <= r.n_val_docs
        expect = math.floor(1000.0 * r.n_contaminated / r.n_val_docs + 0.5)
        assert r.contaminated_permille == expect


def test_f82_python_brute_force_witness(spark):
    """Brute-force recount of the contaminated-doc set in pure Python
    (every val doc's 8-shingles vs the full train gram set) must match
    f82's total exactly.  The positive-path guard below keeps this from
    degrading to a vacuous 0==0 if a future fixture generation loses its
    cross-split overlap."""
    from pulsar_message_filter_spark.io import load

    split = {r.doc_id: r.split for r in _docs_split(spark).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, "documents", SF_SMOKE).select("doc_id", "text").collect()
    }
    # Find a (train, val) pair sharing an 8-gram, brute force in Python.
    train_grams: set[str] = set()
    for d, t in docs.items():
        if split[d] != "train":
            continue
        toks = t.split(" ")
        train_grams.update(
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        )
    contaminated_py = set()
    for d, t in docs.items():
        if split[d] != "val":
            continue
        toks = t.split(" ")
        if any(
            " ".join(toks[i : i + 8]) in train_grams
            for i in range(len(toks) - 7)
        ):
            contaminated_py.add(d)

    from pulsar_message_filter_spark.operators.widen3 import (
        f82_cross_split_contamination,
    )

    assert contaminated_py, (
        "fixture lost its cross-split 8-gram overlap — the witness would "
        "be vacuous; regenerate testdata or shrink the shingle size"
    )
    out = f82_cross_split_contamination(spark, SF_SMOKE).collect()
    total_contaminated = sum(r.n_contaminated for r in out)
    assert total_contaminated == len(contaminated_py)


def test_f83_df_ratio_threshold_and_direct_count(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import f83_stopword_autodetect

    rows = f83_stopword_autodetect(spark, SF_SMOKE).collect()
    assert rows, "fixture vocabulary should yield high-df tokens"
    n_docs = load(spark, "documents", SF_SMOKE).count()
    for r in rows:
        assert r.df_permille >= 500
        assert r.df <= n_docs
        assert r.df_permille == math.floor(1000.0 * r.df / n_docs + 0.5)

    # Direct recount of one token's df without the explode path.
    tok = rows[0].token
    df_direct = (
        load(spark, "documents", SF_SMOKE)
        .where(
            (F.col("text") == tok)
            | F.col("text").startswith(tok + " ")
            | F.col("text").endswith(" " + tok)
            | F.col("text").contains(" " + tok + " ")
        )
        .count()
    )
    assert df_direct == rows[0].df


def test_e2c_each_event_in_exactly_three_windows(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import e2c_sliding_revenue

    out = e2c_sliding_revenue(spark, SF_SMOKE).collect()
    n_events = load(spark, "events", SF_SMOKE).count()
    assert sum(r.n_events for r in out) == 3 * n_events
    slide_us = 2 * 3600 * 1_000_000
    for r in out:
        assert r.ws_us % slide_us == 0
        assert r.n_users <= r.n_events


def test_c3b_profile_invariants_and_one_day_recount(spark):
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import c3b_distinct_pairs_daily

    rows = c3b_distinct_pairs_daily(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_types <= r.n_user_type_pairs

    day = rows[0].day
    direct = (
        load(spark, "events", SF_SMOKE)
        .where(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss") == day)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert direct == rows[0].n_user_type_pairs


def test_selector_props_range_in_rows_satisfy_predicate(spark):
    import json

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import selector_props_range_in

    out = {r.event_id for r in selector_props_range_in(spark, SF_SMOKE).collect()}
    src = load(spark, "events", SF_SMOKE).select(
        "event_id", "event_type", "value", "props"
    ).collect()
    expect = set()
    for r in src:
        k = json.loads(r.props).get("k") if r.props else None
        if (
            k is not None
            and 20 <= float(k) <= 60
            and r.event_type in {"click", "view", "purchase"}
            and not (r.value < 50)
        ):
            expect.add(r.event_id)
    assert out == expect


def test_rollup_share_of_parent_sums(spark):
    from pulsar_message_filter_spark.operators.widen3 import rollup_share_of_parent

    rows = rollup_share_of_parent(spark, SF_SMOKE).collect()
    grand = [r for r in rows if r.region_name == "(all)"]
    regions = [
        r for r in rows if r.region_name != "(all)" and r.nation_name == "(all)"
    ]
    nations = [
        r for r in rows if r.region_name != "(all)" and r.nation_name != "(all)"
    ]
    assert len(grand) == 1
    assert grand[0].share_of_parent_permille == 1000

    # Nation revenues sum exactly to their region subtotal (integer cents).
    by_region: dict[str, int] = {}
    for n in nations:
        by_region[n.region_name] = by_region.get(n.region_name, 0) + n.revenue_cents
    for r in regions:
        assert by_region[r.region_name] == r.revenue_cents
    assert sum(r.revenue_cents for r in regions) == grand[0].revenue_cents

    # Shares within one parent sum to 1000 within integer-floor slack.
    for r in regions:
        kids = [n for n in nations if n.region_name == r.region_name]
        s = sum(n.share_of_parent_permille for n in kids)
        assert abs(s - 1000) <= len(kids)


def test_f85_numpy_witness(spark):
    """Recompute the whole per-label int8 quantization error profile in
    numpy (float64, same floor-based rounding) and compare exactly."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import f85_int8_quant_error

    out = {r.label: r for r in f85_int8_quant_error(spark, SF_SMOKE).collect()}

    pdf = (
        load(spark, "embeddings", SF_SMOKE)
        .select("label", "embedding")
        .toPandas()
    )
    acc: dict[int, list[int]] = {}
    for _, row in pdf.iterrows():
        xs = np.asarray(row.embedding, dtype=np.float32).astype(np.float64)
        scale = np.abs(xs).max() / 127.0
        if scale <= 0:
            continue
        err = np.abs(xs - np.floor(xs / scale + 0.5) * scale).max()
        acc.setdefault(int(row.label), []).append(int(math.floor(err * 1e9 + 0.5)))
    assert set(out) == set(acc)
    for label, errs in acc.items():
        assert out[label].n_vecs == len(errs)
        expect = math.floor(sum(errs) / len(errs) / 1000.0 + 0.5)
        assert out[label].avg_max_err_1e6 == expect


def test_f2b_simhash_python_witness(spark):
    """Recompute the md5 bit-plane SimHash in pure Python for every doc
    and compare fingerprints exactly (ties at vote sum 0 break to 1)."""
    import hashlib

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import f2b_simhash_exact

    out = {r.doc_id: r.simhash16 for r in f2b_simhash_exact(spark, SF_SMOKE).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, "documents", SF_SMOKE)
        .where(F.col("doc_id") < 200)
        .collect()
    }
    assert set(out) == set(docs)
    for d, text in docs.items():
        votes = [0] * 16
        for token in set(text.split(" ")):
            v = int(hashlib.md5(token.encode()).hexdigest()[:4], 16)
            for j in range(16):
                votes[j] += 1 if (v >> j) & 1 else -1
        expect = sum((1 << j) for j in range(16) if votes[j] >= 0)
        assert out[d] == expect, f"doc {d}: {out[d]} != {expect}"


def test_f2c_minhash_python_witness(spark):
    """Recompute all four md5-permutation MinHash signatures in pure
    Python and compare exactly."""
    import hashlib

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import f2c_minhash_exact

    out = {r.doc_id: r for r in f2c_minhash_exact(spark, SF_SMOKE).collect()}
    docs = {
        r.doc_id: r.text
        for r in load(spark, "documents", SF_SMOKE)
        .where(F.col("doc_id") < 200)
        .collect()
    }
    assert set(out) == set(docs)
    for d, text in docs.items():
        for s in range(4):
            expect = min(
                int(hashlib.md5(f"{t}#{s}".encode()).hexdigest()[:8], 16)
                for t in set(text.split(" "))
            )
            assert out[d][f"sig{s}"] == expect, (d, s)


def test_f2c_minhash_clone_docs_share_signature(spark):
    """Two docs with identical token SETS must have identical signatures
    (the property LSH banding relies on)."""
    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.widen3 import f2c_minhash_exact

    docs = {
        r.doc_id: frozenset(r.text.split(" "))
        for r in load(spark, "documents", SF_SMOKE)
        .where(F.col("doc_id") < 200)
        .collect()
    }
    out = {r.doc_id: (r.sig0, r.sig1, r.sig2, r.sig3)
           for r in f2c_minhash_exact(spark, SF_SMOKE).collect()}
    by_tokset: dict[frozenset, set] = {}
    for d, ts in docs.items():
        by_tokset.setdefault(ts, set()).add(out[d])
    for ts, sigs in by_tokset.items():
        assert len(sigs) == 1
