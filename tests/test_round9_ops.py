"""Ground-truth tests for the round-9 operator batch: mergeable
reservoir sampling, sample-quantile sketch, exact ROC-AUC, leave-one-out
target encoding — plus the prefix-scan branch-consistency regression
(the localCheckpoint fix in functions/prefix.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE


def test_reservoir_bottom_k_merge_identity(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)): the
    mergeability claim, exercised on a real disjoint split of orders."""
    from pulsar_message_filter_spark.operators.sampling import (
        _RES_K,
        reservoir_bottom_k,
    )

    orders = load(spark, "orders", SF_SMOKE)
    full = {
        (r.o_orderpriority, r["__k"])
        for r in reservoir_bottom_k(
            orders, "o_orderpriority", "o_orderkey"
        ).collect()
    }
    half_a = reservoir_bottom_k(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        "o_orderpriority",
        "o_orderkey",
    )
    half_b = reservoir_bottom_k(
        orders.filter(F.col("o_orderkey") % 2 == 1),
        "o_orderpriority",
        "o_orderkey",
    )
    # merge = union the two k-row states, re-take bottom-k
    merged_state = half_a.unionByName(half_b).select(
        "o_orderpriority", F.col("__k").alias("o_orderkey")
    )
    merged = {
        (r.o_orderpriority, r["__k"])
        for r in reservoir_bottom_k(
            merged_state, "o_orderpriority", "o_orderkey"
        ).collect()
    }
    assert merged == full
    # every stratum holds exactly k rows (strata are larger than k here)
    from collections import Counter

    per = Counter(s for s, _ in full)
    assert all(v == _RES_K for v in per.values()), per


def test_reservoir_sample_is_priority_order(spark):
    """rk must walk the sample in ascending md5-priority order and the
    sampled keys must be the globally smallest hashes of their stratum."""
    from pulsar_message_filter_spark.operators.sampling import (
        sample_reservoir_merge,
    )
    import hashlib

    rows = sample_reservoir_merge(spark, SF_SMOKE).collect()
    assert rows
    orders = load(spark, "orders", SF_SMOKE).select(
        "o_orderpriority", "o_orderkey"
    ).collect()
    truth = {}
    for r in orders:
        h = int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:8], 16)
        truth.setdefault(r.o_orderpriority, []).append((h, r.o_orderkey))
    for s in truth:
        truth[s] = [k for _, k in sorted(truth[s])[:12]]
    got = {}
    for r in sorted(rows, key=lambda r: (r.o_orderpriority, r.rk)):
        got.setdefault(r.o_orderpriority, []).append(r.o_orderkey)
        h = int(hashlib.md5(str(r.o_orderkey).encode()).hexdigest()[:8], 16)
        assert h == r.h
    assert got == truth


def test_sample_quantiles_rank_error_bound(spark):
    """The sketch's quantile estimates must sit at a CDF position within
    the binomial 5-sigma band of the requested p (k=256 SRS-like
    sample), and k_used must equal min(k, stratum size)."""
    from pulsar_message_filter_spark.operators.sketch import (
        _SQ_K,
        sketch_sample_quantiles,
    )

    rows = sketch_sample_quantiles(spark, SF_SMOKE).collect()
    assert rows
    li = load(spark, "lineitem", SF_SMOKE).select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long")
    ).collect()
    vals = {}
    for r in li:
        vals.setdefault(r[0], []).append(r[1])
    for r in rows:
        vs = sorted(vals[r.l_returnflag])
        n = len(vs)
        assert r.k_used == min(_SQ_K, n)
        # CDF position of the estimate (inclusive), vs requested p
        import bisect

        pos = bisect.bisect_right(vs, r.sample_q_cents) / n
        band = 5.0 * (r.p * (1 - r.p) / r.k_used) ** 0.5 + 1.0 / r.k_used
        assert abs(pos - r.p) <= band, (r.l_returnflag, r.p, pos, band)
        # exact column really is the exact order statistic
        import math

        want_exact = vs[math.ceil(r.p * n) - 1]
        assert r.exact_q_cents == want_exact
        assert r.err_cents == r.sample_q_cents - r.exact_q_cents


def test_auc_matches_brute_force(spark):
    """Grouped rank-sum AUC equals the O(n²)-definition AUC
    (P(score⁺ > score⁻) + ½ P(tie)) computed by brute force."""
    from pulsar_message_filter_spark.operators.abtest import eval_auc_rank

    rows = eval_auc_rank(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    li = load(spark, "lineitem", SF_SMOKE).select(
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        (F.col("l_returnflag") == "R").cast("int"),
    ).collect()
    groups = {}
    for g, v, y in li:
        groups.setdefault(g, []).append((v, y))
    for r in rows:
        data = groups[r.l_linestatus]
        pos = sorted(v for v, y in data if y == 1)
        neg = sorted(v for v, y in data if y == 0)
        assert r.n_pos == len(pos) and r.n_neg == len(neg)
        # brute force via two-pointer over sorted arrays
        import bisect

        num = 0.0
        for p in pos:
            lt = bisect.bisect_left(neg, p)
            eq = bisect.bisect_right(neg, p) - lt
            num += lt + 0.5 * eq
        want = num / (len(pos) * len(neg))
        assert abs(r.auc - want) < 5e-7, (r.l_linestatus, r.auc, want)
        assert abs(r.gini - (2 * want - 1)) < 1e-6


def test_target_encode_loo_is_leak_free(spark):
    """Per-cell LOO encodings match the closed form (Σy - y)/(n-1), the
    cells partition the table, and the encoding of a positive row is
    strictly below the naive category mean (the leak direction)."""
    from pulsar_message_filter_spark.operators.features import (
        _TE_M,
        feature_target_encode_loo,
    )

    rows = feature_target_encode_loo(spark, SF_SMOKE).collect()
    orders = load(spark, "orders", SF_SMOKE).select(
        "o_orderpriority", (F.col("o_orderstatus") == "F").cast("int")
    ).collect()
    agg, prior_n = {}, [0, 0]
    for c, y in orders:
        n, s = agg.get(c, (0, 0))
        agg[c] = (n + 1, s + y)
        prior_n[0] += y
        prior_n[1] += 1
    prior = prior_n[0] / prior_n[1]
    total_rows = 0
    for r in rows:
        n, s = agg[r.o_orderpriority]
        assert r.n_cat == n
        total_rows += r.n_rows
        want = (s - r.label) / (n - 1)
        assert abs(r.enc_loo - want) < 5e-7
        want_s = (s - r.label + _TE_M * prior) / (n - 1 + _TE_M)
        assert abs(r.enc_loo_smooth - want_s) < 5e-7
        mean = s / n
        if r.label == 1:
            assert r.enc_loo < mean  # removing a positive lowers the rate
        else:
            assert r.enc_loo > mean or s == 0
    assert total_rows == prior_n[1]


def test_prefix_scan_branch_consistency(spark):
    """Regression for the repartitionByRange branch-desync bug: the three
    internal evaluations of the scan's partitioned table must see ONE
    set of range boundaries (localCheckpoint), so per-group final cums
    equal group totals on EVERY run.  Before the fix this flaked within
    a handful of runs (rows silently dropped at the offsets join)."""
    from pulsar_message_filter_spark.functions.prefix import (
        distributed_prefix_sums,
    )

    base = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"),
        # non-monotone value ordering so ranges actually interleave
        F.pmod(F.col("id") * 2654435761, F.lit(99991)).alias("v"),
        F.lit(1).alias("one"),
    )
    for _ in range(3):
        sc = distributed_prefix_sums(base, "g", ["v", "one"], {"one": "cum"})
        got = {
            r.g: (r.mx, r.cnt)
            for r in sc.groupBy("g")
            .agg(F.max("cum").alias("mx"), F.count("*").alias("cnt"))
            .collect()
        }
        for g, (mx, cnt) in got.items():
            assert mx == cnt, (g, mx, cnt)
        assert sum(c for _, c in got.values()) == 5000
