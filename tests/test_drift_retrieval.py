"""Library-level invariants for the drift monitors (KS, PSI, CUSUM,
Benford) and the retrieval operators (BM25, postings, chi-squared
token/label), plus the multi-column distributed prefix scan they ride."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pulsar_message_filter_spark.functions.prefix import (
    distributed_prefix_sum,
    distributed_prefix_sums,
)
from pulsar_message_filter_spark.operators.drift import ks_two_sample, psi_profile
from pulsar_message_filter_spark.operators.retrieval import bm25_scores


def test_multi_prefix_matches_single_column_scans(spark):
    rows = [(k % 3, i, i % 7, (i * i) % 5) for k, i in enumerate(range(200))]
    df = spark.createDataFrame(rows, "g int, o int, x int, y int")
    multi = distributed_prefix_sums(
        df, "g", ["o"], {"x": "cx", "y": "cy"}, total_col="tx"
    )
    sx = distributed_prefix_sum(df, "g", ["o"], "x", "cx")
    got = {(r.g, r.o): (r.cx, r.cy, r.tx) for r in multi.collect()}
    want_x = {(r.g, r.o): (r.cx, r.group_total) for r in sx.collect()}
    # single-column delegate agrees on the shared column and the total
    assert all(got[k][0] == v[0] and got[k][2] == v[1] for k, v in want_x.items())
    # and the second cum is the plain-window ground truth
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    truth = {
        (r.g, r.o): r.cy
        for r in df.withColumn("cy", F.sum("y").over(w)).collect()
    }
    assert all(got[k][1] == truth[k] for k in truth)


def test_ks_identical_samples_is_zero(spark):
    rows = [(float(v), t) for v in range(50) for t in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, t string")
    out = ks_two_sample(
        df, "v", F.col("t") == "a", F.col("t") == "b"
    ).collect()[0]
    assert out.ks_stat == 0.0 and out.n_a == 50 and out.n_b == 50


def test_ks_disjoint_samples_is_one(spark):
    rows = [(float(v), "a") for v in range(30)] + [
        (float(v + 100), "b") for v in range(20)
    ]
    df = spark.createDataFrame(rows, "v double, t string")
    out = ks_two_sample(
        df, "v", F.col("t") == "a", F.col("t") == "b"
    ).collect()[0]
    assert out.ks_stat == 1.0


def test_ks_half_shift(spark):
    # B = A shifted so exactly half of A lies below all of B
    rows = [(float(v), "a") for v in range(10)] + [
        (float(v) + 4.5, "b") for v in range(10)
    ]
    df = spark.createDataFrame(rows, "v double, t string")
    out = ks_two_sample(
        df, "v", F.col("t") == "a", F.col("t") == "b"
    ).collect()[0]
    assert out.ks_stat == 0.5


def test_psi_identical_halves_is_zero(spark):
    rows = [(float(v % 40) * 10, h) for v in range(80) for h in (0, 1)]
    df = spark.createDataFrame(rows, "value double, half int")
    out = psi_profile(df, "value", F.col("half") == 0)
    terms = [r.psi_term for r in out.collect()]
    assert len(terms) == 20 and all(t == 0.0 for t in terms)


def test_psi_total_is_nonnegative_and_detects_shift(spark):
    ref = [(float(v % 5) * 25, 1) for v in range(100)]
    cur = [(float(v % 5) * 25 + 250, 0) for v in range(100)]
    df = spark.createDataFrame(ref + cur, "value double, half int")
    total = sum(
        r.psi_term for r in psi_profile(df, "value", F.col("half") == 1).collect()
    )
    assert total > 1.0  # disjoint supports → large PSI


def test_bm25_prefers_term_dense_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash hash hash"),
            (2, "hash filler filler filler filler filler filler filler"),
            (3, "filler filler"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["hash"]).collect()}
    assert set(got) == {1, 2}  # doc 3 never matches
    assert got[1] > got[2] > 0.0


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    docs = spark.createDataFrame(
        [(i, "common rare" if i == 0 else "common filler") for i in range(10)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["common", "rare"]).collect()}
    solo = bm25_scores(docs, ["common"]).collect()
    # the rare term contributes more to doc 0 than `common` does anywhere
    common_only = max(r.bm25 for r in solo)
    assert got[0] > 2 * common_only


def test_chi2_flags_label_correlated_token(spark):
    from pulsar_message_filter_spark.operators.retrieval import (
        f45_chi2_token_label,
    )
    import tempfile, os

    # synthetic corpus: 'marker' appears in exactly the 'en' docs
    rows = [
        (i, ("marker base" if i < 10 else "base other"),
         ("en" if i < 10 else "fr"), "s", 10)
        for i in range(20)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = f45_chi2_token_label(spark, d).collect()
    by_term = {r.term: r for r in out}
    assert by_term["marker"].chi2 == 20.0  # perfect association, n=20
    assert "base" not in by_term  # present in every doc → degenerate, filtered
    assert by_term["other"].chi2 == 20.0  # perfectly anti-correlated


def test_ewma_constant_series_is_flat(spark):
    import tempfile, os
    from pulsar_message_filter_spark.operators.timeseries import timeseries_ewma
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1 + (i % 20), 12, 0, 0), i, "t", 1.0, "{}")
        for i in range(100)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = timeseries_ewma(spark, d).collect()
    # 5 events/day every day → EWMA of a constant series equals the constant
    assert len(out) == 20
    assert all(r.ewma == 5.0 for r in out)


def test_js_divergence_zero_for_identical_distribution(spark):
    import tempfile, os
    from pulsar_message_filter_spark.operators.retrieval import (
        f47_js_divergence_sources,
    )

    # two sources with the SAME unigram distribution → JS = 0 for both
    rows = [(i, "a a b", "en", f"s{i % 2}", 5) for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = f47_js_divergence_sources(spark, d).collect()
    assert len(out) == 2 and all(r.js_divergence == 0.0 for r in out)


def test_js_divergence_bounded_by_ln2(spark):
    import tempfile, os
    from pulsar_message_filter_spark.operators.retrieval import (
        f47_js_divergence_sources,
    )
    import math

    # disjoint vocabularies → JS approaches its ln(2) maximum
    rows = [(i, "aa aa", "en", "s0", 5) for i in range(20)] + [
        (i + 100, "bb bb", "en", "s1", 5) for i in range(20)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.source: r.js_divergence for r in f47_js_divergence_sources(spark, d).collect()}
    # each source holds half the corpus, disjoint vocab: p = (1,0),
    # corpus q = (1/2,1/2), m = (3/4,1/4) →
    # JS = 1/2·ln(4/3) + 1/4·ln(2/3) + 1/4·ln(2)
    want = 0.5 * math.log(4 / 3) + 0.25 * math.log(2 / 3) + 0.25 * math.log(2)
    for v in out.values():
        assert abs(v - want) < 1e-6


def test_quantile_normalize_midrank_properties(spark):
    import tempfile, os
    from pulsar_message_filter_spark.operators.drift import f48_quantile_normalize

    rows = [(i, "t", "en", "s0", [10, 20, 20, 30][i]) for i in range(4)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r.pct for r in f48_quantile_normalize(spark, d).collect()}
    # mid-rank: 10 → 0.5/4, ties 20,20 → (1 + 1)/4 = 0.5, 30 → 3.5/4
    assert out[0] == 0.125 and out[1] == 0.5 and out[2] == 0.5 and out[3] == 0.875


def test_pmi_sign_matches_association(spark):
    import tempfile, os
    from pulsar_message_filter_spark.operators.retrieval import f46_pmi_token_pairs

    # x and y always co-occur (PMI > 0); p q co-occur at independence rate
    rows = []
    for i in range(60):
        rows.append((i, "x y", "en", "s", 3))
    for i in range(120):
        rows.append((1000 + i, ["p filler", "q filler", "p q"][i % 3], "en", "s", 3))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {(r.u, r.v): r for r in f46_pmi_token_pairs(spark, d).collect()}
    assert out[("x", "y")].pmi > 1.0  # perfect co-occurrence, rare pair
    assert out[("x", "y")].n_ab == 60


def test_trimmed_mean_drops_exact_tail_counts(spark):
    from pulsar_message_filter_spark.operators.robust import trimmed_mean_cents

    # 10 values 0..9 in cents*100, trim 10% → drop exactly min and max
    rows = [("g", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = trimmed_mean_cents(df, "g", F.round(F.col("value") * 100).cast("long")).collect()[0]
    assert out.n == 10 and out.k_trim == 1
    assert out.trimmed_mean == sum(range(1, 9)) / 8  # mean of 1..8

def test_trimmed_mean_tie_splitting(spark):
    from pulsar_message_filter_spark.operators.robust import trimmed_mean_cents

    # 5 copies of 100 and 5 of 200, trim 20% → drop 2 from each tail;
    # ties split exactly: keep 3x100 + 3x200
    rows = [("g", 1.0)] * 5 + [("g", 2.0)] * 5
    df = spark.createDataFrame(rows, "g string, value double")
    out = trimmed_mean_cents(
        df, "g", F.round(F.col("value") * 100).cast("long"), trim_frac=0.2
    ).collect()[0]
    assert out.k_trim == 2 and out.trimmed_mean == 1.5


def test_mad_lower_median_convention(spark):
    from pulsar_message_filter_spark.operators.robust import lower_median_cents

    rows = [("g", v) for v in [1, 3, 3, 7, 100]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = lower_median_cents(df, "g", F.col("v")).collect()[0]
    assert out.med_cents == 3
    # even count → LOWER median (no interpolation)
    df2 = spark.createDataFrame([("g", v) for v in [1, 2, 3, 4]], "g string, v long")
    assert lower_median_cents(df2, "g", F.col("v")).collect()[0].med_cents == 2


def test_mmr_diversity_beats_near_duplicate(spark):
    from pulsar_message_filter_spark.operators.similarity import mmr_rerank

    cands = [
        (1, 0.99, [1.0, 0.0, 0.0]),
        (2, 0.98, [0.999, 0.01, 0.0]),  # near-duplicate of 1
        (3, 0.80, [0.0, 1.0, 0.0]),     # diverse, lower relevance
    ]
    out = mmr_rerank(cands, k=3, lam=0.5)
    assert [o[1] for o in out] == [1, 3, 2]
    # first pick is pure relevance; later scores carry the penalty
    assert out[0][3] == 0.5 * 0.99
    # lambda=1 → plain relevance order
    plain = mmr_rerank(cands, k=3, lam=1.0)
    assert [o[1] for o in plain] == [1, 2, 3]
    # empty candidates → empty result, no error
    assert mmr_rerank([], k=5) == []


def test_cramers_v_and_mi_invariants(spark):
    import tempfile, os
    from datetime import datetime
    from pulsar_message_filter_spark.operators.drift import (
        crosstab_cramers_v,
        mi_type_hour_profile,
    )

    # independent type x weekday/hour grid → V = 0 and every MI term = 0
    rows = []
    eid = 0
    for d in range(1, 15):          # two full weeks
        for h in (0, 12):
            for t in ("a", "b"):
                rows.append((eid, datetime(2024, 1, d, h, 0, 0), eid, t, 1.0, "{}"))
                eid += 1
    with tempfile.TemporaryDirectory() as dd:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(dd, "events.parquet"))
        v = crosstab_cramers_v(spark, dd).collect()[0]
        mi = mi_type_hour_profile(spark, dd).collect()
    assert v.cramers_v == 0.0 and v.n == len(rows)
    assert all(r.mi_term == 0.0 for r in mi)


def test_seasonal_backtest_perfect_weekly_pattern(spark):
    import tempfile, os
    from datetime import datetime
    from pulsar_message_filter_spark.operators.behavior import (
        forecast_seasonal_backtest,
    )

    # counts repeat with period 7 exactly → MAE = WAPE = 0
    rows, eid = [], 0
    for d in range(1, 29):
        for _ in range((d - 1) % 7 + 1):
            rows.append((eid, datetime(2024, 1, d, 12, 0, 0), eid, "t", 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as dd:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(dd, "events.parquet"))
        out = forecast_seasonal_backtest(spark, dd).collect()[0]
    assert out.n_days_scored == 21 and out.mae == 0.0 and out.wape == 0.0


def test_conversion_lag_median_and_window(spark):
    import tempfile, os
    from datetime import datetime
    from pulsar_message_filter_spark.operators.behavior import funnel_conversion_lag

    rows = [
        # user 1: view day 1, purchases at +10s and +100s → lag 10
        (1, datetime(2024, 1, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 0, 10), 1, "purchase", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 10, 1, 40), 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE view → not a conversion; later one counts
        (4, datetime(2024, 1, 1, 9, 0, 0), 2, "purchase", 1.0, "{}"),
        (5, datetime(2024, 1, 1, 11, 0, 0), 2, "view", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 11, 0, 30), 2, "purchase", 1.0, "{}"),
        # user 3: view only → no conversion row
        (7, datetime(2024, 1, 1, 12, 0, 0), 3, "view", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as dd:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(dd, "events.parquet"))
        out = funnel_conversion_lag(spark, dd).collect()
    assert len(out) == 1
    r = out[0]
    # lags are {10, 30}; lower median = 10
    assert r.cohort_week == 0 and r.n_converted == 2 and r.median_lag_s == 10


def _write_ev(spark, rows, d):
    import os

    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))


def test_abtest_balanced_identical_arms_z_zero(spark):
    import tempfile
    from datetime import datetime
    from pulsar_message_filter_spark.operators.abtest import abtest_two_proportion

    rows = []
    for u in range(40):  # even/odd arms identical: half of each convert
        et = "purchase" if u % 4 < 2 else "view"
        rows.append((u, datetime(2024, 1, 2, 10, 0, 0), u, et, 1.0, "{}"))
    with tempfile.TemporaryDirectory() as d:
        _write_ev(spark, rows, d)
        out = abtest_two_proportion(spark, d).collect()[0]
    assert out.n_a == out.n_b == 20
    assert out.p_a == out.p_b == 0.5
    assert out.z_stat == 0.0 and out.srm_chi2 == 0.0


def test_abtest_cuped_perfect_covariate(spark):
    import tempfile
    from datetime import datetime
    from pulsar_message_filter_spark.operators.abtest import abtest_cuped

    # y = 2x exactly → theta = 2, variance reduction = 1
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, datetime(2024, 1, 5, 0, 0, 0), u, "t", float(u + 1), "{}"))
        eid += 1
        rows.append((eid, datetime(2024, 1, 20, 0, 0, 0), u, "t", 2.0 * (u + 1), "{}"))
        eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_ev(spark, rows, d)
        out = abtest_cuped(spark, d).collect()[0]
    assert out.n == 10 and out.theta == 2.0 and out.var_reduction == 1.0
