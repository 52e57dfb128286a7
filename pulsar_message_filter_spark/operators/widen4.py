"""Round-11 widening queries — codifying the round-15 exact-distinct
scale diagnosis as graded surfaces, plus exact twins for three
previously rows-only-by-design approximate families (clustering
assignment, int8 ANN, MMR re-ranking).

Five queries:

* ``e2d_sliding_reach_auto`` — the new :func:`windows.sliding_distinct`
  helper with ``method='auto'``: the pre-flight key-space estimate picks
  the exact path at test scale, and the result is hash-checked against
  the DuckDB oracle — proving the auto plumbing end-to-end.
* ``e2e_sliding_reach_hll`` — the documented 100 TB alternative at the
  SAME 6h/2h window spec as ``e2c_sliding_revenue``: per-window
  register-table HLL (deterministic family, so the per-window estimates
  themselves are oracle-checked), with the per-window sketch size in the
  result as the state-bound witness.
* ``kmeans_assign_exact`` — the f2b/f2c move applied to clustering: on
  integer-quantized embeddings the Lloyd assignment step is exact int64
  arithmetic, so one full assignment pass (argmin over k centroids with
  a deterministic tie-break) is hash-identical cross-engine.
* ``f21b_topk_int8_exact`` — the int8 quantize→dot→rank ANN chain with
  floor instead of round-half, hash-exact end to end.
* ``f49b_mmr_exact`` — the greedy MMR pick order on an integer score
  lattice, oracle-checked via a step-unrolled SQL argmax chain.

Same design rules as widen.py/widen2.py/widen3.py: idiomatic Column
algebra, hand-paired DuckDB oracle, identical aliases both sides, and a
100 TB scale note per docstring.

Reference caveat (SURVEY.md §0): /root/reference ships no source; the
binding spec is the JMS/SQL92 selector surface plus the driver's
DuckDB-oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.sketch import (
    _HLL_A,
    _HLL_ALPHA,
    _HLL_B,
    _HLL_M,
    _HLL_MULT,
    _P,
    fold_sql,
    hll_corrected_estimate,
    hll_registers_by,
)
from pulsar_message_filter_spark.operators.windows import sliding_distinct
from pulsar_message_filter_spark.registry import graded

# ---------------------------------------------------------------------------
# E2/C12 — sliding distinct reach through the auto exact/approx switch.
# ---------------------------------------------------------------------------

_HOUR_US = 3600 * 1_000_000


@graded(
    "e2d_sliding_reach_auto",
    oracle=f"""
        WITH hits AS (
            -- floor-aligned window base (integer positive-mod, not //:
            -- DuckDB // truncates toward zero, diverging from F.window's
            -- floor semantics for pre-1970 negative-epoch timestamps)
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_HOUR_US}) + {_HOUR_US}) % {_HOUR_US})
                   - k * {_HOUR_US} AS ws_us,
                   user_id
            FROM events, LATERAL unnest([0, 1, 2, 3]) AS t(k)
        )
        SELECT ws_us,
               count(DISTINCT user_id) AS n_distinct,
               count(*) AS n_events
        FROM hits GROUP BY ws_us
    """,
    section="E2,C12,F14",
    description="sliding 4h-window/1h-hop distinct-user reach through "
    "sliding_distinct(method='auto'): the O(1)-state key-space pre-flight "
    "picks the exact path below the pair budget (as at every graded SF, "
    "where the oracle's exact DISTINCT matches) and the sketch above it "
    "— above the session-derived budget (shuffle partitions x 1.56M "
    "pairs/partition; 50M at the measured 32-partition reference) "
    "n_distinct becomes the sketch estimate BY DESIGN (guard measured "
    "firing at x256 in SCALING.md round-16)",
)
def e2d_sliding_reach_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding distinct reach with the scale guard engaged.

    100 TB scale shape: ``method='auto'`` first runs one column-pruned
    scan whose aggregation state is a single HLL++ sketch over the
    expanded (window, key) struct — cost O(scan), state O(1) — and only
    commits to exact ``countDistinct`` when the estimated pair space fits
    the session-derived budget (shuffle partitions × the measured
    per-partition wall; 50M on the 32-partition reference session).
    Above the budget the same
    call returns the ``approx_count_distinct`` plan, the measured 4.8×
    cheaper x256 path (SCALING.md round-15).  At sf0.01–0.1 the estimate
    is far below budget, so the graded result is the exact form and
    hash-matches the oracle.
    """
    ev = load(spark, "events", sf_dir)
    return sliding_distinct(
        ev,
        "ts",
        "user_id",
        "4 hours",
        "1 hour",
        extra_aggs=[F.count("*").alias("n_events")],
        method="auto",
    )


# ---------------------------------------------------------------------------
# E2/C12/F14 — the at-scale sibling: per-sliding-window deterministic HLL.
# Same 6h/2h spec as e2c_sliding_revenue, so the two graded queries are the
# exact form and its documented 100 TB replacement side by side.
# ---------------------------------------------------------------------------

_SLIDE_US = 2 * 3600 * 1_000_000  # 2h hop, matching e2c_sliding_revenue


@graded(
    "e2e_sliding_reach_hll",
    oracle=f"""
        WITH h0 AS (
            -- floor-aligned base via integer positive-mod (see e2d note)
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   - k * {_SLIDE_US} AS ws_us,
                   (user_id * {_HLL_A} + {_HLL_B}) % {_P} AS hv
            FROM events, LATERAL unnest([0, 1, 2]) AS t(k)
        ),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM h0),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        )
        SELECT ws_us,
               CAST(count(*) AS BIGINT) AS n_registers,
               CASE WHEN ({_HLL_M} - count(*)) > 0
                         AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                             / (sum(power(2.0, -max_rho)) + ({_HLL_M} - count(*)))
                             <= 2.5 * {_HLL_M}
                    THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                             / ({_HLL_M} - count(*))), 4)
                    ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                               / (sum(power(2.0, -max_rho))
                                  + ({_HLL_M} - count(*))), 4)
               END AS reach_estimate
        FROM regs GROUP BY ws_us
    """,
    section="E2,C12,F14",
    description="per-sliding-window HLL distinct reach at e2c's exact 6h/2h "
    "spec — the measured 100 TB replacement for exact sliding distinct: "
    "deterministic register family with the Flajolet small-range "
    "linear-counting correction, so each window's estimate is itself "
    "oracle-checked, and the per-window register count (<= 64) ships in "
    "the result as the state-bound witness",
)
def e2e_sliding_reach_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct reach via per-window register tables.

    100 TB scale shape: the row expansion is arithmetic (each event emits
    its 3 member window starts — exact long math, no join, no timestamp
    rendering), and the only shuffle is keyed on (window, register) whose
    value space is bounded by 3 × slides × 64 ROWS TOTAL regardless of
    input size — the x256-measured density segment for this family is
    0.29 vs 1.23 for the exact form it replaces (SCALING.md round-15).
    Window partials also MERGE (per-register max), so rollups to wider
    spans never touch raw keys — the hll_windowed_merge read path.
    """
    ev = load(spark, "events", sf_dir)
    us = F.unix_micros("ts")
    # pmod, not %: floor alignment (matches F.window) even for pre-1970
    # negative-epoch timestamps, where Spark's % truncates toward zero
    base = (us - F.pmod(us, F.lit(_SLIDE_US))).alias("base")
    expanded = (
        ev.select(base, "user_id")
        .select(
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
            "base",
            "user_id",
        )
        .select(
            (F.col("base") - F.col("k") * F.lit(_SLIDE_US)).alias("ws_us"),
            "user_id",
        )
    )
    regs = hll_registers_by(expanded, "user_id", [F.col("ws_us")])
    # corrected estimate (Flajolet small-range linear counting) — shared
    # with sliding_distinct(method='hll'); see sketch.hll_corrected_estimate
    corrected = hll_corrected_estimate(F.col("n_registers"), F.col("__hsum"))
    return (
        regs.groupBy("ws_us")
        .agg(
            F.count("*").alias("n_registers"),
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__hsum"),
        )
        .select("ws_us", "n_registers", corrected.alias("reach_estimate"))
    )


# ---------------------------------------------------------------------------
# E2/C12/D1 — the round-12 string-key HLL path graded end-to-end: the
# PUBLIC sliding_distinct(method='hll') helper on a STRING key column
# (event_type folds to a long via sketch.hll_key_expr's polynomial hash,
# itself SQL-expressible).  Grades, in one query: the helper's hll branch,
# the floor-aligned pmod expansion, the string fold, the register family,
# the small-range correction, and the final HALF_UP integer round (the
# reachable estimate set was probed .5-free cross-engine; all event-type
# cardinalities land in the linear-counting branch).
# ---------------------------------------------------------------------------

# The fold SQL is single-sourced from sketch.fold_sql (ADVICE r12): the
# oracle can never drift from the fold it grades.


@graded(
    "e2f_sliding_type_reach_hll",
    oracle=f"""
        WITH f AS (
            -- floor-aligned base (integer positive-mod, see e2d note) +
            -- the char-level polynomial string fold (sketch.hll_key_expr)
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   AS base,
                   {fold_sql('event_type')} AS kv
            FROM events
        ),
        h0 AS (
            SELECT base - k * {_SLIDE_US} AS ws_us,
                   (kv * {_HLL_A} + {_HLL_B}) % {_P} AS hv
            FROM f, LATERAL unnest([0, 1, 2]) AS t(k)
        ),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM h0),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        )
        SELECT ws_us,
               CAST(round(
                   CASE WHEN ({_HLL_M} - count(*)) > 0
                             AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                 / (sum(power(2.0, -max_rho)) + ({_HLL_M} - count(*)))
                                 <= 2.5 * {_HLL_M}
                        THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                                 / ({_HLL_M} - count(*))), 4)
                        ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                   / (sum(power(2.0, -max_rho))
                                      + ({_HLL_M} - count(*))), 4)
                   END, 0) AS BIGINT) AS n_distinct
        FROM regs GROUP BY ws_us
    """,
    section="E2,C12,D1,F14",
    description="sliding 6h/2h distinct event-TYPE reach through the public "
    "sliding_distinct(method='hll') helper on a STRING key: the char-level "
    "polynomial fold (hll_key_expr), pmod floor alignment, register family, "
    "small-range correction, and the final integer round are all inside the "
    "hash grade — string-keyed sketches (types, session ids) stay "
    "oracle-checkable",
)
def e2f_sliding_type_reach_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-keyed sliding HLL reach via the public helper.

    100 TB scale shape: identical to e2e's — arithmetic expansion (3
    member windows per event, exact long math), one shuffle keyed on
    (window, register) whose value space is ≤ 64 rows per window
    regardless of input, partials mergeable by per-register max.  The
    string fold runs scan-side inside codegen (transform + aggregate over
    the char array — no UDF), so string keys cost one extra projection,
    not a Python boundary.
    """
    ev = load(spark, "events", sf_dir)
    return sliding_distinct(ev, "ts", "event_type", "6 hours", "2 hours", method="hll")


# ---------------------------------------------------------------------------
# E2/C12/D1 — the NON-ASCII twin of e2f (VERDICT r12 #3): the same public
# sliding_distinct(method='hll') path, but the key is event_type pushed
# through a codepoint bijection covering every UTF-8 width — 2-byte
# (Greek/Cyrillic/ü), 3-byte (CJK/kana), and 4-byte astral (😀, the UTF-16
# surrogate-pair case).  The fold's ascii()/split('') codepoint semantics
# are now INSIDE a driver hash grade on multi-byte data, not just a pytest
# pin — if either engine ever regressed to code-unit iteration (Spark
# returning the high surrogate, say), this query goes red.  translate()
# parity on the exact mapping was probed cross-engine first (all five
# event types byte-identical, 'view' → 'вあ中😀').  Estimates stay in the
# linear-counting branch (≤5 distinct keys per window), whose 63-value
# table is .5-free cross-engine (standing test, test_sketch.py).
# ---------------------------------------------------------------------------

#: codepoint bijection: ASCII → 2-byte × 7, 3-byte × 2, 4-byte astral × 1
_E2G_FROM = "aceiklprsuvw"
_E2G_TO = "αб中あкλπρσüв😀"


@graded(
    "e2g_sliding_unicode_reach_hll",
    oracle=f"""
        WITH f AS (
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   AS base,
                   {fold_sql(
                       f"translate(event_type, '{_E2G_FROM}', '{_E2G_TO}')"
                   )} AS kv
            FROM events
        ),
        h0 AS (
            SELECT base - k * {_SLIDE_US} AS ws_us,
                   (kv * {_HLL_A} + {_HLL_B}) % {_P} AS hv
            FROM f, LATERAL unnest([0, 1, 2]) AS t(k)
        ),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM h0),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        )
        SELECT ws_us,
               CAST(round(
                   CASE WHEN ({_HLL_M} - count(*)) > 0
                             AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                 / (sum(power(2.0, -max_rho)) + ({_HLL_M} - count(*)))
                                 <= 2.5 * {_HLL_M}
                        THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                                 / ({_HLL_M} - count(*))), 4)
                        ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                   / (sum(power(2.0, -max_rho))
                                      + ({_HLL_M} - count(*))), 4)
                   END, 0) AS BIGINT) AS n_distinct
        FROM regs GROUP BY ws_us
    """,
    section="E2,C12,D1,F14",
    description="e2f's NON-ASCII twin: sliding 6h/2h HLL reach where the "
    "string key runs through a codepoint bijection spanning 2-, 3-, and "
    "4-byte UTF-8 (incl. a surrogate-pair emoji) before the polynomial "
    "fold — pins hll_key_expr's codepoint semantics cross-engine inside "
    "the driver hash grade, so string-keyed sketches on real-world "
    "unicode data can't silently diverge from their oracles",
)
def e2g_sliding_unicode_reach_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-keyed sliding HLL reach via the public helper.

    Same 100 TB shape as e2f (arithmetic window expansion, one shuffle
    bounded at ≤64 register rows per window, mergeable partials); the
    only addition is one scan-side ``translate`` projection before the
    fold — still zero Python, still whole-stage codegen.  The point is
    the key DOMAIN: multi-byte UTF-8 through ``split('')``/``ascii``,
    graded hash-exact against DuckDB's ``string_split``/``ascii``.
    """
    ev = load(spark, "events", sf_dir)
    keyed = ev.select(
        "ts", F.translate("event_type", _E2G_FROM, _E2G_TO).alias("etype_u")
    )
    return sliding_distinct(keyed, "ts", "etype_u", "6 hours", "2 hours", method="hll")


# ---------------------------------------------------------------------------
# E2/C12/F14 — NON-ALIGNED sliding HLL (round-13): sliding_distinct's hll
# branch previously required window % slide == 0; sliding_expand now
# carries the general membership rule (ws > t − window over a
# ceil(window/slide) candidate expansion — one scan-side filter, no join),
# and this query grades the new branch end-to-end at a 5h/2h spec where
# events sit in 2 OR 3 windows depending on phase.  Two firsts in the
# grade: the data-dependent membership filter, and — at sf0.1, where
# per-window reach exceeds the 2.5·m linear-counting threshold — the RAW
# alpha estimator branch of the correction (e2e/e2f/e2g only ever graded
# the linear branch).  The reachable estimate set was probed .5-free
# cross-engine at all three SFs before committing to the integer round.
# ---------------------------------------------------------------------------

_E2H_WIN_US = 5 * 3600 * 1_000_000
_E2H_SLIDE_US = 2 * 3600 * 1_000_000


@graded(
    "e2h_sliding_unaligned_reach_hll",
    oracle=f"""
        WITH h0 AS (
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_E2H_SLIDE_US}) + {_E2H_SLIDE_US})
                      % {_E2H_SLIDE_US})
                   - k * {_E2H_SLIDE_US} AS ws_us,
                   epoch_us(ts) AS t_us,
                   (user_id * {_HLL_A} + {_HLL_B}) % {_P} AS hv
            FROM events, LATERAL unnest([0, 1, 2]) AS t(k)
        ),
        hf AS (SELECT ws_us, hv FROM h0 WHERE ws_us > t_us - {_E2H_WIN_US}),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM hf),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        )
        SELECT ws_us,
               CAST(round(
                   CASE WHEN ({_HLL_M} - count(*)) > 0
                             AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                 / (sum(power(2.0, -max_rho)) + ({_HLL_M} - count(*)))
                                 <= 2.5 * {_HLL_M}
                        THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                                 / ({_HLL_M} - count(*))), 4)
                        ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                   / (sum(power(2.0, -max_rho))
                                      + ({_HLL_M} - count(*))), 4)
                   END, 0) AS BIGINT) AS n_distinct
        FROM regs GROUP BY ws_us
    """,
    section="E2,C12,F14",
    description="NON-aligned sliding HLL reach (5h window / 2h hop, where "
    "window % slide != 0) through the public sliding_distinct(method='hll') "
    "— grades the general ws > t - window membership filter AND, at sf0.1, "
    "the raw-alpha estimator branch of the Flajolet correction (reach "
    "exceeds the 2.5m linear-counting threshold there), neither of which "
    "any aligned sketch query could reach",
)
def e2h_sliding_unaligned_reach_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-aligned sliding HLL reach via the public helper.

    100 TB scale shape: unchanged from e2e/e2f — arithmetic candidate
    expansion (ceil(5/2)=3 per event), one scan-side membership filter
    (pruned before the shuffle, so the boundary candidates never move),
    one shuffle keyed on (window, register) bounded at ≤64 rows per
    window, partials mergeable by per-register max.
    """
    ev = load(spark, "events", sf_dir)
    return sliding_distinct(ev, "ts", "user_id", "5 hours", "2 hours", method="hll")


# ---------------------------------------------------------------------------
# E2/C12/F14 — hll + extra_aggs (round-18): the helper previously REFUSED
# extra_aggs under method='hll' with a "do it yourself in two passes"
# error; it now runs that second windowed pass itself and joins per
# window.  This query grades the composed output — sketch n_distinct AND
# exact rider aggregates (count + long-sum) in one frame — so the join
# keying, window-set equality between the two passes, and both value
# paths sit inside one hash grade.  .5-free probe re-run for this spec's
# rounded estimates at all three SFs (raw-alpha branch reached at sf0.1).
# ---------------------------------------------------------------------------


@graded(
    "e2i_sliding_hll_with_aggs",
    oracle=f"""
        WITH h0 AS (
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   - k * {_SLIDE_US} AS ws_us,
                   (user_id * {_HLL_A} + {_HLL_B}) % {_P} AS hv,
                   -- floor, not CAST: DuckDB's double→int cast ROUNDS while
                   -- Spark's truncates; value is non-negative (fixture
                   -- min 0.01), so floor IS Spark's truncation
                   CAST(floor(value) AS BIGINT) AS value_l
            FROM events, LATERAL unnest([0, 1, 2]) AS t(k)
        ),
        counts AS (
            SELECT ws_us, count(*) AS n_events,
                   CAST(sum(value_l) AS BIGINT) AS sum_value
            FROM h0 GROUP BY ws_us
        ),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM h0),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        ),
        est AS (
            SELECT ws_us,
                   CAST(round(
                       CASE WHEN ({_HLL_M} - count(*)) > 0
                                 AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                     / (sum(power(2.0, -max_rho))
                                        + ({_HLL_M} - count(*)))
                                     <= 2.5 * {_HLL_M}
                            THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                                     / ({_HLL_M} - count(*))), 4)
                            ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                       / (sum(power(2.0, -max_rho))
                                          + ({_HLL_M} - count(*))), 4)
                       END, 0) AS BIGINT) AS n_distinct
            FROM regs GROUP BY ws_us
        )
        SELECT ws_us, n_distinct, n_events, sum_value
        FROM est JOIN counts USING (ws_us)
    """,
    section="E2,C12,F14",
    description="sliding 6h/2h HLL reach WITH rider aggregates: "
    "method='hll' now runs extra_aggs as a second windowed pass joined "
    "per window (previously a refuse-and-explain error) — the sketch "
    "estimate, exact event count, and exact long-sum land in one frame "
    "and the whole composition (two passes + per-window join) is inside "
    "the hash grade",
)
def e2i_sliding_hll_with_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch distinct + exact rider aggregates, one output frame.

    100 TB scale shape: the sketch pass is e2e's (bounded ≤64 register
    rows per window); the rider pass is one ordinary windowed
    aggregation (map-side combinable); the join keys two per-window
    frames whose row count is the window count — broadcastable at any
    data size.  Two scans total, the documented cost of mixing a
    two-stage sketch with one-stage aggregates.
    """
    ev = load(spark, "events", sf_dir)
    return sliding_distinct(
        ev,
        "ts",
        "user_id",
        "6 hours",
        "2 hours",
        extra_aggs=[
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("long")).alias("sum_value"),
        ],
        method="hll",
    )


# ---------------------------------------------------------------------------
# E2/C12/B7 — NULL-key semantics inside the hash grade (round-19, the
# ADVICE-r13 fix made graded behavior): sliding_distinct now filters
# null-ts/null-key rows up front for EVERY method, so a NULL key neither
# mints a rho-26 register row (which inflated the hll estimate) nor counts
# toward extra_aggs.  This query manufactures a deterministic NULL slice
# (user_id % 10 == 0 → NULL) on the sketch key and grades the composed
# output — hll n_distinct over the surviving keys PLUS a rider count that
# must also exclude the nulled rows — against an oracle whose only
# null-handling is one WHERE clause.  If the up-front filter ever regressed
# (either pass seeing the nulls again), both columns go red.  The .5-free
# probe was re-run for this key domain at all three SFs (raw-alpha branch
# reached at sf0.1, same as e2h/e2i).
# ---------------------------------------------------------------------------


@graded(
    "e2j_sliding_hll_null_keys",
    oracle=f"""
        WITH h0 AS (
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   - k * {_SLIDE_US} AS ws_us,
                   (user_id * {_HLL_A} + {_HLL_B}) % {_P} AS hv
            FROM events, LATERAL unnest([0, 1, 2]) AS t(k)
            -- the documented null rule, in oracle form: a NULL key is
            -- excluded from BOTH passes (no register row, no rider count)
            WHERE user_id % 10 <> 0
        ),
        counts AS (
            SELECT ws_us, count(*) AS n_events FROM h0 GROUP BY ws_us
        ),
        h1 AS (SELECT ws_us, (xor(hv, hv >> 16) * {_HLL_MULT}) % {_P} AS hv FROM h0),
        h2 AS (SELECT ws_us, (xor(hv, hv >> 13) * {_HLL_MULT}) % {_P} AS hv FROM h1),
        h AS (SELECT ws_us, xor(hv, hv >> 16) AS hv FROM h2),
        regs AS (
            SELECT ws_us, hv % {_HLL_M} AS register,
                   max(CASE WHEN hv // {_HLL_M} > 0
                            THEN 25 - floor(log2(hv // {_HLL_M}))
                            ELSE 26 END) AS max_rho
            FROM h GROUP BY 1, 2
        ),
        est AS (
            SELECT ws_us,
                   CAST(round(
                       CASE WHEN ({_HLL_M} - count(*)) > 0
                                 AND {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                     / (sum(power(2.0, -max_rho))
                                        + ({_HLL_M} - count(*)))
                                     <= 2.5 * {_HLL_M}
                            THEN round({_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                                     / ({_HLL_M} - count(*))), 4)
                            ELSE round({_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                                       / (sum(power(2.0, -max_rho))
                                          + ({_HLL_M} - count(*))), 4)
                       END, 0) AS BIGINT) AS n_distinct
            FROM regs GROUP BY ws_us
        )
        SELECT ws_us, n_distinct, n_events
        FROM est JOIN counts USING (ws_us)
    """,
    section="E2,C12,B7,F14",
    description="sliding 6h/2h HLL reach where a deterministic tenth of the "
    "keys is NULLed scan-side: grades sliding_distinct's up-front null "
    "filter — NULL keys mint no register row AND are excluded from the "
    "rider count, matching countDistinct semantics — so the null rule all "
    "three methods now share sits inside a driver hash grade",
)
def e2j_sliding_hll_null_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-keyed sliding HLL reach via the public helper.

    100 TB scale shape: identical to e2i's (bounded register shuffle +
    one windowed rider pass + per-window broadcastable join); the null
    filter is one scan-side predicate fused into both passes' scans, so
    the null rule costs nothing at any scale.
    """
    ev = load(spark, "events", sf_dir)
    keyed = ev.select(
        "ts",
        F.when(F.col("user_id") % 10 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("uid_n"),
    )
    return sliding_distinct(
        keyed,
        "ts",
        "uid_n",
        "6 hours",
        "2 hours",
        extra_aggs=[F.count("*").alias("n_events")],
        method="hll",
    )


# ---------------------------------------------------------------------------
# F13/F14 — exact Lloyd assignment step on integer-quantized embeddings.
# kmeans_lite_clusters stays rows-only (iterative, float centroids); this
# twin freezes ONE deterministic assignment pass in exact int64 arithmetic
# so the clustering math itself earns a hash-exact grade (the f2b/f2c move).
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_SCALE = 1000


@graded(
    "kmeans_assign_exact",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       v -> CAST(floor(CAST(v AS DOUBLE) * {_KM_SCALE}) AS BIGINT)
                   ) AS qv
            FROM embeddings
        ),
        cents AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
            FROM (SELECT * FROM q ORDER BY vec_id LIMIT {_KM_K})
        ),
        scored AS (
            SELECT q.vec_id, c.cluster,
                   list_sum(list_transform(range(1, len(q.qv) + 1),
                       i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS d2
            FROM q CROSS JOIN cents c
        ),
        best AS (
            SELECT vec_id, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rn
            FROM scored
        )
        SELECT CAST(cluster AS BIGINT) AS cluster,
               count(*) AS n_members,
               CAST(sum(vec_id) AS BIGINT) AS sum_vec_id,
               CAST(sum(d2) AS BIGINT) AS sum_d2
        FROM best WHERE rn = 1 GROUP BY cluster
    """,
    section="F13,F14",
    description="exact Lloyd assignment step: embeddings quantized to int "
    "(floor(v*1000)), centroids = the 8 lowest vec_ids, every point "
    "assigned to its nearest centroid by exact int64 squared distance "
    "(ties to the lowest cluster id) — the clustering assignment math "
    "itself hash-checked cross-engine; kmeans_lite_clusters remains the "
    "iterative float form",
)
def kmeans_assign_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd assignment pass, exact end to end.

    100 TB scale shape: identical to the production assign step — the
    k×dim centroid matrix is the ONLY collect (bounded, 8×64 longs here),
    shipped back as literals so assignment is a map-only pass over the
    corpus scan (k fused distance expressions per row, no join, no
    shuffle until the k-row final agg).  Integer quantization is what
    makes the grade exact: float32→double is lossless, double*1000 and
    floor are bit-identical IEEE ops on both engines, and every distance
    is int64 (max |q|≈2e3, so d² ≤ 64·(4e3)² ≪ 2⁶³) — no summation-order
    drift possible.
    """
    emb = load(spark, "embeddings", sf_dir)
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * _KM_SCALE).cast("long"),
        ).alias("qv"),
    )
    cent_rows = q.orderBy("vec_id").limit(_KM_K).collect()  # O(k·dim) only
    if not cent_rows:  # empty corpus → no centroids, graceful empty result
        return spark.createDataFrame(
            [], "cluster bigint, n_members bigint, sum_vec_id bigint, sum_d2 bigint"
        )
    best_cluster, best_d2 = None, None
    for idx, row in enumerate(cent_rows):
        carr = F.array(*[F.lit(int(c)) for c in row.qv])
        d2 = F.aggregate(
            F.zip_with("qv", carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        if best_d2 is None:
            best_cluster, best_d2 = F.lit(idx), d2
        else:
            # strict <, ascending idx → ties keep the LOWEST cluster id,
            # matching the oracle's ORDER BY d2, cluster
            best_cluster = F.when(d2 < best_d2, idx).otherwise(best_cluster)
            best_d2 = F.least(d2, best_d2)
    return (
        q.select(
            "vec_id",
            best_cluster.cast("long").alias("cluster"),
            best_d2.alias("d2"),
        )
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("vec_id").alias("sum_vec_id"),
            F.sum("d2").alias("sum_d2"),
        )
    )


# ---------------------------------------------------------------------------
# F4/F13 — exact int8-lattice top-k: the f21 quantize-and-scan path with the
# engine-boundary-sensitive rounding replaced by floor, so the whole
# quantize → pairwise-dot → per-query-rank chain is hash-exact.
# ---------------------------------------------------------------------------

_I8_NQ = 30  # query prefix, matching f21_topk_int8
_I8_K = 3


@graded(
    "f21b_topk_int8_exact",
    oracle=f"""
        WITH am AS (
            SELECT vec_id,
                   list_max(list_transform(embedding,
                       v -> abs(CAST(v AS DOUBLE)))) AS amax,
                   embedding
            FROM embeddings
        ),
        q8 AS (
            -- amax = 0 (all-zero vector) would give 0/0 = NaN; both
            -- engines map it to the zero vector instead
            SELECT vec_id,
                   list_transform(embedding,
                       v -> CASE WHEN amax > 0
                                 THEN CAST(floor(CAST(v AS DOUBLE) / amax * 127)
                                      AS BIGINT)
                                 ELSE 0 END
                   ) AS qv
            FROM am
        ),
        pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, len(q.qv) + 1),
                       i -> q.qv[i] * c.qv[i])) AS dot8
            FROM q8 q JOIN q8 c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {_I8_NQ}
        )
        SELECT query_id, neighbor_id, CAST(dot8 AS BIGINT) AS dot8,
               CAST(rank AS BIGINT) AS rank
        FROM (
            SELECT query_id, neighbor_id, dot8,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot8 DESC, neighbor_id) AS rank
            FROM pairs
        ) WHERE rank <= {_I8_K}
    """,
    section="F4,F13,D5,F14",
    description="exact int8-lattice top-k: floor(v/amax*127) quantization "
    "(deterministic IEEE ops — no round-half boundary), pairwise integer "
    "dot products, per-query rank with neighbor-id tie-break — the "
    "quantize→scan→rank ANN chain itself hash-checked; f21_topk_int8 "
    "remains the production round+rerank form",
)
def f21b_topk_int8_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact int8 candidate scan.

    100 TB scale shape: identical to ``int8_topk``'s candidate stage —
    quantize once on the corpus scan (pure Column algebra inside
    codegen), broadcast the bounded query block, score with an integer
    fold (the 4–8× scan-bandwidth win), rank per query.  Floor on the
    shared double quotient v/amax·127 is what makes it exact: division
    and multiplication are correctly-rounded IEEE ops, so both engines
    floor the SAME double; every downstream value is int64 (|q|≤127,
    dot ≤ 64·127² ≪ 2⁶³).
    """
    from pyspark.sql.window import Window as W

    emb = load(spark, "embeddings", sf_dir)
    amax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    q8 = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            # amax = 0 (all-zero vector) → 0/0 = NaN; map to the zero
            # vector instead (matching the oracle's CASE)
            lambda x: F.when(
                amax > 0, F.floor(x.cast("double") / amax * 127)
            ).otherwise(F.lit(0).cast("long")),
        ).alias("qv"),
    )
    queries = q8.where(F.col("vec_id") < _I8_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    pairs = (
        F.broadcast(queries)
        .join(
            q8.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("cq")),
            F.col("query_id") != F.col("neighbor_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("qq", "cq", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot8"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot8"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _I8_K)
    )


# ---------------------------------------------------------------------------
# F4 — exact MMR selection: the greedy maximal-marginal-relevance loop on
# an integer-quantized score lattice, so the inherently-sequential pick
# order itself is oracle-checked (f49_mmr_rerank stays the float form).
# The oracle unrolls the k greedy steps as chained CTEs — deterministic
# argmax per step with the same integer scores and id tie-break.
# ---------------------------------------------------------------------------

_MMR_K = 10
_MMR_POOL = 50  # candidate ids 1.._MMR_POOL; vec_id 0 is the query


def _mmr_exact_oracle() -> str:
    """Build the unrolled greedy oracle: sel1..sel10 each pick the integer
    argmax of 7*rel - 3*max_sim_to_selected (score x10 keeps lambda=0.7
    exact in int64), ties to the smaller id."""
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
        sel{k} AS MATERIALIZED (
            SELECT c.id, c.rel8, 7 * c.rel8 - 3 * max(ps.s) AS score10,
                   {k} AS rank
            FROM rel c JOIN psim ps ON ps.ia = c.id
            WHERE ps.ib IN (SELECT id FROM acc{k - 1})
              AND c.id NOT IN (SELECT id FROM acc{k - 1})
            GROUP BY c.id, c.rel8
            ORDER BY score10 DESC, c.id LIMIT 1
        ),
        acc{k} AS MATERIALIZED (SELECT * FROM acc{k - 1} UNION ALL SELECT * FROM sel{k})""")
    return f"""
        WITH am AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                       u -> abs(CAST(u AS DOUBLE)))) AS amax
            FROM embeddings WHERE vec_id <= {_MMR_POOL}
        ),
        q8 AS MATERIALIZED (
            -- amax = 0 (all-zero vector) would give 0/0 = NaN; both
            -- engines map it to the zero vector instead
            SELECT vec_id,
                   list_transform(embedding,
                       v -> CASE WHEN amax > 0
                                 THEN CAST(floor(CAST(v AS DOUBLE) / amax * 127)
                                      AS BIGINT)
                                 ELSE 0 END) AS qv
            FROM am
        ),
        qv0 AS (SELECT qv FROM q8 WHERE vec_id = 0),
        rel AS MATERIALIZED (
            SELECT p.vec_id AS id,
                   list_sum(list_transform(range(1, len(p.qv) + 1),
                       i -> p.qv[i] * q.qv[i])) AS rel8,
                   p.qv AS qv
            FROM q8 p, qv0 q WHERE p.vec_id >= 1
        ),
        psim AS MATERIALIZED (
            SELECT a.id AS ia, b.id AS ib,
                   list_sum(list_transform(range(1, len(a.qv) + 1),
                       i -> a.qv[i] * b.qv[i])) AS s
            FROM rel a JOIN rel b ON a.id <> b.id
        ),
        sel1 AS MATERIALIZED (
            SELECT id, rel8, 7 * rel8 AS score10, 1 AS rank
            FROM rel ORDER BY score10 DESC, id LIMIT 1
        ),
        acc1 AS MATERIALIZED (SELECT * FROM sel1),{",".join(steps)}
        SELECT CAST(rank AS BIGINT) AS rank,
               CAST(id AS BIGINT) AS neighbor_id,
               CAST(rel8 AS BIGINT) AS rel8,
               CAST(score10 AS BIGINT) AS score10
        FROM acc{_MMR_K}
    """


@graded(
    "f49b_mmr_exact",
    oracle=_mmr_exact_oracle(),
    section="F4,F14",
    description=f"exact MMR diversified selection (lambda=0.7 as integer "
    f"7/3 weights, k={_MMR_K}) over the fixed candidate pool vec_id "
    f"1..{_MMR_POOL} scored against query 0 on the floor-int8 lattice — "
    "the greedy pick sequence itself is hash-checked against a "
    "10-step-unrolled SQL argmax chain; f49_mmr_rerank stays the "
    "production float form",
)
def f49b_mmr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked MMR: integer scores make the greedy loop exact.

    100 TB scale shape: identical to ``mmr_rerank``'s documented contract
    — the sequential loop runs driver-side on a BOUNDED candidate block
    (first-stage retrieval output; 51 quantized vectors ≈ a few KB
    here), which is the only collect.  At scale the pool arrives from the
    distributed ANN stage; MMR cost is O(k·pool) regardless of corpus
    size.  Integer quantization (floor of the shared IEEE quotient, as
    f21b) plus 7/3 integer weights remove every float comparison from
    the argmax, so the pick order is engine-independent.
    """
    emb = load(spark, "embeddings", sf_dir)
    amax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    q8 = emb.where(F.col("vec_id") <= _MMR_POOL).select(
        "vec_id",
        F.transform(
            "embedding",
            # amax = 0 → zero vector, matching the oracle's CASE (f21b note)
            lambda x: F.when(
                amax > 0, F.floor(x.cast("double") / amax * 127)
            ).otherwise(F.lit(0).cast("long")),
        ).alias("qv"),
    )
    block = {int(r.vec_id): list(r.qv) for r in q8.collect()}  # bounded pool
    if 0 not in block:  # empty/queryless corpus → graceful empty result
        return spark.createDataFrame(
            [], "rank bigint, neighbor_id bigint, rel8 bigint, score10 bigint"
        )
    q0 = block.pop(0)

    def dot(a: list, b: list) -> int:
        return sum(x * y for x, y in zip(a, b))

    rel = {i: dot(q0, v) for i, v in block.items()}
    ids = sorted(block)
    psim = {
        (a, b): dot(block[a], block[b]) for a in ids for b in ids if a != b
    }
    selected: list[int] = []
    out = []
    for rank in range(1, _MMR_K + 1):
        cands = [i for i in ids if i not in selected]
        if not cands:  # pool smaller than k: emit what exists
            break
        scored = []
        for i in cands:
            pen = max(psim[(i, s)] for s in selected) if selected else 0
            scored.append((7 * rel[i] - 3 * pen, -i, i))
        score10, _, pick = max(scored)
        selected.append(pick)
        out.append((rank, pick, rel[pick], score10))
    return spark.createDataFrame(
        out, "rank bigint, neighbor_id bigint, rel8 bigint, score10 bigint"
    )
