"""Round-15 widening queries — new oracle-checked entries for the
still-thin §2 rows (F7 stopwords, E2 sliding, C3 distinct, C16 rollup,
B9/B11 props coercion) plus two new training-data-pipeline primitives
that had no graded twin yet: cross-split decontamination (val-vs-train
shingle overlap, the complement of f22's external-benchmark check) and
int8 embedding-quantization error profiling (the ANN compression
pre-flight).

Same design rules as widen.py / widen2.py: idiomatic Column algebra,
hand-paired DuckDB oracle per query, identical output aliases on both
sides, and a 100 TB scale note in each docstring.  Hashed outputs are
exact integers or strings for every COMPUTED column; the one raw
double that ships (selector_props_range_in's `value`) is a pass-through
of the parquet column, bit-identical on both engines because neither
recomputes it — the same precedent as the B-series selector queries.

Reference caveat (SURVEY.md §0): /root/reference ships no source; the
binding spec is the JMS/SQL92 selector surface plus the driver's
DuckDB-oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.registry import graded
from pulsar_message_filter_spark.selector import Selector

_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------------
# F1/F2/F6 — cross-split decontamination: val docs sharing any 8-token
# shingle with the train split.  f22_contamination checks documents against
# an EXTERNAL benchmark gram list (broadcast); this is the other real-world
# decontamination: between two splits of the SAME corpus, where both sides
# are big and the candidate generation must be an equi-join on the gram key.
# ---------------------------------------------------------------------------

_SHINGLE = 8


@graded(
    "f82_cross_split_contamination",
    oracle=f"""
        WITH tagged AS (
            SELECT doc_id, lang, string_split(text, ' ') AS toks,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        ), grams AS (
            SELECT DISTINCT doc_id, lang, split,
                   array_to_string(toks[i:(i + {_SHINGLE} - 1)], ' ') AS gram
            FROM tagged,
                 LATERAL unnest(generate_series(1, len(toks) - {_SHINGLE} + 1))
                     AS t(i)
        ), train_grams AS (
            SELECT DISTINCT gram FROM grams WHERE split = 'train'
        ), val_docs AS (
            SELECT doc_id, lang FROM tagged WHERE split = 'val'
        ), contaminated AS (
            SELECT DISTINCT g.doc_id
            FROM grams g JOIN train_grams t USING (gram)
            WHERE g.split = 'val'
        )
        SELECT v.lang,
               count(*) AS n_val_docs,
               count(c.doc_id) AS n_contaminated,
               CAST(floor(1000.0 * count(c.doc_id) / count(*) + 0.5) AS BIGINT)
                   AS contaminated_permille
        FROM val_docs v LEFT JOIN contaminated c USING (doc_id)
        GROUP BY v.lang
    """,
    section="F1,F2,F6,C6,D8",
    description=f"cross-split decontamination: {_SHINGLE}-token shingle "
    "overlap between the md5-split val docs and the train split, per-lang "
    "contamination rate — the train/eval leakage audit run before every "
    "training data release",
)
def f82_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Val-vs-train shingle-overlap decontamination.

    100 TB scale shape: candidate generation is a gram-keyed equi-join
    (semi-join of val grams against distinct train grams), never a doc×doc
    comparison — cost is bounded by Σ df(gram) on the val side after the
    distinct-gram reduction, and both inputs are map-side-combinable
    distinct aggregates.  The gram key is a stable string; a hot gram (a
    boilerplate sentence) fattens one reducer, which AQE skew-split
    handles, or pre-hash the gram to 64 bits (xxhash64) to cut shuffle
    width — semantics unchanged.  The final per-lang rollup is a 20-group
    agg.  No driver-side state.
    """
    from pulsar_message_filter_spark.io import widen

    # widen (guide §2.5): the 8-token shingle explode is heavy per-row
    # work that otherwise runs in the single-row-group scan's one task
    # (same-session A/B this round: ~1.9 s narrow vs ~1.55 s widened)
    docs = widen(load(spark, "documents", sf_dir), "doc_id")
    tagged = docs.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("toks"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6",
            F.lit("train"),
        )
        .otherwise("val")
        .alias("split"),
    )
    grams = (
        tagged.where(F.size("toks") >= _SHINGLE)
        .select(
            "doc_id",
            "lang",
            "split",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - _SHINGLE),
                    lambda i: F.array_join(F.slice("toks", i + 1, _SHINGLE), " "),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    train_grams = grams.where(F.col("split") == "train").select("gram").distinct()
    val_grams = grams.where(F.col("split") == "val")
    contaminated = (
        val_grams.join(train_grams, "gram", "leftsemi").select("doc_id").distinct()
    )
    val_docs = tagged.where(F.col("split") == "val").select("doc_id", "lang")
    flagged = contaminated.withColumn("hit", F.lit(1))
    return (
        val_docs.join(flagged, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_val_docs"),
            F.count("hit").alias("n_contaminated"),
            F.floor(
                1000.0 * F.count("hit") / F.count("*") + F.lit(0.5)
            ).cast("long").alias("contaminated_permille"),
        )
    )


# ---------------------------------------------------------------------------
# F7/F9/F10 — corpus-derived stopword detection: document-frequency ratio.
# The static-list stopword filter (f7) assumes a curated list exists; real
# pipelines DERIVE the list from df ratios before filtering.
# ---------------------------------------------------------------------------

_DF_PERMILLE_MIN = 500  # token must appear in >= 50% of docs


@graded(
    "f83_stopword_autodetect",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT token, count(*) AS df,
               CAST(floor(1000.0 * count(*) / max(n.n_docs) + 0.5) AS BIGINT)
                   AS df_permille
        FROM tok, n
        GROUP BY token
        HAVING CAST(floor(1000.0 * count(*) / max(n.n_docs) + 0.5) AS BIGINT)
               >= {_DF_PERMILLE_MIN}
    """,
    section="F7,F9,F10",
    description="corpus-derived stopword detection: tokens whose document-"
    f"frequency ratio is >= {_DF_PERMILLE_MIN}/1000 — the step that BUILDS "
    "the list the static stopword filter consumes",
)
def f83_stopword_autodetect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency stopword candidates.

    100 TB scale shape: (doc_id, token) distinct is a map-side-combinable
    dedup keyed by token after the per-doc explode; df counting is a
    vocab-keyed agg (vocab ≪ corpus).  The corpus size joins in as a
    broadcast single-row aggregate — no second scan of the token table,
    no collect.  Output is a few hundred rows at any corpus size (it is a
    df-RATIO threshold), so the HAVING prunes before any sort.
    """
    docs = load(spark, "documents", sf_dir)
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    n_docs = docs.select(F.count("*").alias("n_docs"))
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.floor(1000.0 * F.col("df") / F.col("n_docs") + F.lit(0.5))
            .cast("long")
            .alias("df_permille"),
        )
        .where(F.col("df_permille") >= _DF_PERMILLE_MIN)
    )


# ---------------------------------------------------------------------------
# E2 — sliding 6h/2h windows with revenue + distinct users (each event in
# exactly 3 windows).  Widens E2 beyond count-only slides: money (exact
# cents) and a distinct-agg inside the slide.
# ---------------------------------------------------------------------------

_SLIDE_US = 2 * 3600 * 1_000_000  # 2h hop in microseconds


@graded(
    "e2c_sliding_revenue",
    oracle=f"""
        WITH hits AS (
            -- floor-aligned window base (integer positive-mod, not //:
            -- DuckDB // truncates toward zero, diverging from F.window's
            -- floor semantics for pre-1970 negative-epoch timestamps)
            SELECT (epoch_us(ts)
                    - ((epoch_us(ts) % {_SLIDE_US}) + {_SLIDE_US}) % {_SLIDE_US})
                   - k * {_SLIDE_US} AS ws_us,
                   user_id, {cents_sql('value')} AS v_cents
            FROM events, LATERAL unnest([0, 1, 2]) AS t(k)
        )
        SELECT ws_us, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               CAST(sum(v_cents) AS BIGINT) AS revenue_cents
        FROM hits GROUP BY ws_us
    """,
    section="E2,C12",
    description="sliding 6h-window/2h-hop aggregate: per-window event count, "
    "distinct users, and exact integer-cents revenue — each event lands in "
    "exactly three windows",
)
def e2c_sliding_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window revenue with a distinct-agg inside the slide.

    100 TB scale shape: `F.window` expands each row to its 3 member
    windows BEFORE the shuffle (an Expand node, no join), then one
    hash-agg keyed on (window, user) feeds the distinct; the same plan
    Structured Streaming uses for this window spec, so the batch twin and
    the stream share state math.  Window starts ship as epoch integers —
    no timestamp-rendering drift.

    Measured limit of the EXACT distinct (SCALING.md round-15 x256): the
    (window, user) key space is slide_factor x |users touched|, and once
    it outgrows the map-side partial-agg tables the shuffle carries
    nearly raw rows — x64→x256 segment exponent 1.23, and more shuffle
    partitions do NOT help (measured 256 vs 32: slightly worse).  At
    100 TB the graded scale path for sliding distinct reach is the
    sketch: `hll_windowed_merge` (register-bounded, x64→x256 density
    segment 0.29) or `approx_count_distinct` (measured 4.8x cheaper at
    x256).  `window_sliding_reach` shares THIS query's exact-distinct
    class (segment 1.19) — same limit, same guard.
    """
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "6 hours", "2 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(cents("value")).alias("revenue_cents"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("ws_us"),
            "n_events",
            "n_users",
            "revenue_cents",
        )
    )


# ---------------------------------------------------------------------------
# C3 — multi-column DISTINCT as a first-class reduction (the daily
# active-pair profile), widening C3 past single-purpose distincts.
# ---------------------------------------------------------------------------


@graded(
    "c3b_distinct_pairs_daily",
    oracle=f"""
        SELECT strftime(d, '{_DUCK_FMT}') AS day,
               count(*) AS n_user_type_pairs,
               count(DISTINCT event_type) AS n_types
        FROM (
            SELECT DISTINCT date_trunc('day', ts) AS d, user_id, event_type
            FROM events
        )
        GROUP BY d
    """,
    section="C3,D2",
    description="multi-column DISTINCT reduction: distinct (day, user, type) "
    "triples collapsed then profiled per day — dedup-then-aggregate in one "
    "plan",
)
def c3b_distinct_pairs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (day, user, type) triples, then a per-day profile.

    100 TB scale shape: the DISTINCT is a hash-agg keyed by the triple
    (map-side partial dedup first), and the per-day rollup reuses the
    shuffle's day prefix — Catalyst plans both in one exchange because
    the second agg's keys are a prefix of the first's.  No window, no
    sort.
    """
    ev = load(spark, "events", sf_dir)
    triples = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id", "event_type"
    ).distinct()
    return triples.groupBy("d").agg(
        F.count("*").alias("n_user_type_pairs"),
        F.countDistinct("event_type").alias("n_types"),
    ).select(
        F.date_format("d", _FMT).alias("day"), "n_user_type_pairs", "n_types"
    )


# ---------------------------------------------------------------------------
# B9/B11/B4/B5 — props coercion composite: BETWEEN and IN over the
# JSON-extracted numeric property, rendered to BOTH engines from one AST.
# ---------------------------------------------------------------------------

_PROPS_SEL = Selector(
    "props.k BETWEEN 20 AND 60 AND event_type IN ('click', 'view', 'purchase') "
    "AND NOT (value < 50)"
)


@graded(
    "selector_props_range_in",
    oracle="SELECT event_id, user_id, event_type, value FROM events WHERE "
    + _PROPS_SEL.duckdb_sql(),
    section="B9,B11,B4,B5,B3",
    description="props-coercion composite: JSON property BETWEEN range + "
    "header IN list + NOT — one AST rendered to Catalyst and to the DuckDB "
    "oracle (parity by construction)",
)
def selector_props_range_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-property range selector.

    100 TB scale shape: compiles to ordinary Catalyst expressions over a
    `get_json_object` extraction, so column pruning still reaches the
    scan (only props/event_type/value/user_id/event_id are read) and the
    whole predicate runs inside the scan stage's WholeStageCodegen span —
    zero shuffle.
    """
    return (
        load(spark, "events", sf_dir)
        .filter(_PROPS_SEL.column())
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# C16 — hierarchical share-of-parent over ROLLUP(region, nation): each
# nation row carries its share of the region, each region row its share of
# the grand total.  Widens C16 past plain rollup output.
# ---------------------------------------------------------------------------


@graded(
    "rollup_share_of_parent",
    oracle=f"""
        WITH r AS (
            SELECT coalesce(r.r_name, '(all)') AS region_name,
                   CASE WHEN GROUPING(n.n_name) = 1 THEN '(all)'
                        ELSE n.n_name END AS nation_name,
                   GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS lvl,
                   CAST(sum({cents_sql('l.l_extendedprice * (1 - l.l_discount)')})
                        AS BIGINT) AS revenue_cents
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP(r.r_name, n.n_name)
        )
        SELECT region_name, nation_name, revenue_cents,
               CAST(floor(1000.0 * revenue_cents /
                    sum(revenue_cents) OVER (PARTITION BY lvl, CASE WHEN
                        lvl = 0 THEN region_name ELSE '' END) + 0.5) AS BIGINT)
                   AS share_of_parent_permille
        FROM r
    """,
    section="C16,C11,C20",
    description="ROLLUP(region, nation) revenue with share-of-parent per "
    "level: nation rows vs their region subtotal, region rows vs the grand "
    "total — hierarchical contribution in one pass",
)
def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent over a two-level rollup.

    100 TB scale shape: one join tree (supplier/nation/region all
    broadcast — they are dimension-sized at every SF), one rollup agg
    (Expand + hash-agg, partial map-side), then a window whose partition
    is (level, region) — at most |regions|+2 partitions of at most
    |nations| rows each, so the window stage is trivially bounded no
    matter the fact-table size.
    """
    li = load(spark, "lineitem", sf_dir)
    su = load(spark, "supplier", sf_dir)
    na = load(spark, "nation", sf_dir)
    re = load(spark, "region", sf_dir)
    joined = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    # grouping()/grouping_id() must appear in the agg list in Spark, so
    # compute lvl there and derive the display names afterwards.
    rolled = (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents"),
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("long")
            .alias("lvl"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            # lvl (grouping bits), not NULL-ness, marks subtotal rows; the
            # '(all)' label would still conflate with a genuinely-NULL
            # n_name, which TPC-H guarantees non-null (ADVICE r10)
            F.when(F.col("lvl") % 2 == 1, F.lit("(all)"))
            .otherwise(F.col("n_name"))
            .alias("nation_name"),
            "lvl",
            "revenue_cents",
        )
    )
    parent = Window.partitionBy(
        "lvl", F.when(F.col("lvl") == 0, F.col("region_name")).otherwise(F.lit(""))
    )
    return rolled.select(
        "region_name",
        "nation_name",
        "revenue_cents",
        F.floor(
            1000.0 * F.col("revenue_cents") / F.sum("revenue_cents").over(parent)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("share_of_parent_permille"),
    )


# ---------------------------------------------------------------------------
# F13/D5 — int8 symmetric-quantization error profile: the pre-flight run
# before shipping embeddings to an int8 ANN index (pairs with f21_topk_int8,
# which is rows-only; this one is exact and oracle-graded).
# ---------------------------------------------------------------------------


@graded(
    "f85_int8_quant_error",
    oracle="""
        WITH v AS (
            SELECT label,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
            FROM embeddings
        ), err AS (
            SELECT label,
                   CAST(floor(list_max(list_transform(xs,
                       x -> abs(x - floor(x / scale + 0.5) * scale)))
                       * 1e9 + 0.5) AS BIGINT) AS err_1e9
            FROM v WHERE scale > 0
        )
        SELECT label, count(*) AS n_vecs,
               CAST(floor(sum(err_1e9) / count(*) / 1000.0 + 0.5) AS BIGINT)
                   AS avg_max_err_1e6
        FROM err GROUP BY label
    """,
    section="F13,D5",
    description="int8 symmetric quantization error: per-vector max "
    "reconstruction error under scale=maxabs/127, averaged per label — the "
    "accuracy pre-flight before an int8 ANN index build",
)
def f85_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-error profile in pure Column lambda algebra.

    100 TB scale shape: entirely per-row array lambdas (transform /
    array_max) followed by one label-keyed hash agg — no UDF, no shuffle
    except the ~|labels|-group agg.  The per-row error is floored to an
    int64 at 1e-9 resolution BEFORE aggregation so the cross-engine sum
    is order-independent integer math (the parity.py discipline applied
    to doubles that aren't cents).
    """
    emb = load(spark, "embeddings", sf_dir)
    xs = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select(
        "label",
        xs.alias("xs"),
        (F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))) / 127.0
         ).alias("scale"),
    ).where(F.col("scale") > 0)
    err = v.select(
        "label",
        F.floor(
            F.array_max(
                F.transform(
                    "xs",
                    lambda x: F.abs(
                        x - F.floor(x / F.col("scale") + 0.5) * F.col("scale")
                    ),
                )
            )
            * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("err_1e9"),
    )
    return err.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.floor(F.sum("err_1e9") / F.count("*") / 1000.0 + F.lit(0.5))
        .cast("long")
        .alias("avg_max_err_1e6"),
    )


# ---------------------------------------------------------------------------
# F2/D8 — EXACT SimHash twin: the rows-only f2_simhash uses a Python-side
# hash family (engine-specific by design); this one derives the 16 bit
# planes from md5(token), which both engines compute identically, so the
# full fingerprint is oracle-checked end to end (the g3b move applied to
# F2: every approximate surface gets an exact graded twin where one
# exists).
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


@graded(
    "f2b_simhash_exact",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id < 200
        ), hv AS (
            SELECT doc_id,
                   (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substr(md5(token), 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5(token), 4, 1)) - 1) AS v
            FROM tok
        ), votes AS (
            SELECT doc_id, j,
                   sum(CASE WHEN (v // (1 << j)) % 2 = 1 THEN 1 ELSE -1 END) AS s
            FROM hv, LATERAL unnest(generate_series(0, {_SIMHASH_BITS - 1})) AS t(j)
            GROUP BY doc_id, j
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN s >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT)
                   AS simhash{_SIMHASH_BITS}
        FROM votes GROUP BY doc_id
    """,
    section="F2,D8",
    description=f"exact {_SIMHASH_BITS}-bit SimHash from md5(token) bit "
    "planes — same fingerprint on both engines, making the SimHash "
    "construction itself oracle-checked (ties break to 1 at vote sum 0); "
    "graded on the fixed doc_id<200 prefix at every scale factor",
)
def f2b_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked SimHash fingerprints.

    100 TB scale shape: explode to distinct (doc, token), md5 each token
    once, then an Expand-style bit-plane explode (x16, a literal array —
    no join) into a (doc, bit)-keyed vote agg and a doc-keyed reassembly
    agg.  All map-side-combinable hash aggs; per-doc state is 16 ints.
    The md5 runs on the TOKEN (vocab-sized distinct set after dedup), so
    a hot token's hash is computed per occurrence but reduced map-side
    before the shuffle.
    """
    docs = load(spark, "documents", sf_dir).where(F.col("doc_id") < 200)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    hv = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("long").alias("v"),
    )
    votes = (
        hv.select(
            "doc_id",
            "v",
            F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("j"),
        )
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(
                    F.col("v").bitwiseAND(F.expr("shiftleft(1L, j)")) != 0, 1
                ).otherwise(-1)
            ).alias("s")
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(1L, j)")).otherwise(0)
        )
        .cast("long")
        .alias(f"simhash{_SIMHASH_BITS}")
    )


# ---------------------------------------------------------------------------
# F2/D8 — EXACT MinHash twin: like f2b for SimHash, the signature
# construction itself graded cross-engine.  The production path
# (f2_minhash_lsh) uses the xxhash64 family — engine-specific by design;
# here each of the 4 permutations is min over tokens of the 32-bit integer
# from md5(token || '#' || seed), which both engines compute identically.
# ---------------------------------------------------------------------------

_MH_SEEDS = (0, 1, 2, 3)


def _duck_hex32(expr: str) -> str:
    """DuckDB SQL for the first-8-hex-chars-of-md5 → BIGINT (no conv())."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"


_MH_SIG_SQL = ", ".join(
    "CAST(min({h}) AS BIGINT) AS sig{s}".format(
        h=_duck_hex32("token || '#{s}'".format(s=s)), s=s
    )
    for s in _MH_SEEDS
)


@graded(
    "f2c_minhash_exact",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, {_MH_SIG_SQL}
        FROM tok GROUP BY doc_id
    """,
    section="F2,D8",
    description="exact 4-permutation MinHash signatures from md5(token#seed)"
    " — the signature construction (min over the token set per permutation)"
    " oracle-checked cross-engine on the fixed doc_id<200 prefix at every "
    "scale factor; the production LSH path swaps in the faster xxhash64 "
    "family with identical algebra",
)
def f2c_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked MinHash signatures.

    100 TB scale shape: one explode to distinct (doc, token), then a
    single doc-keyed hash agg computing all 4 permutation minima at once
    (map-side combinable — min is associative), no join and no second
    scan.  Signature width is a constant-per-doc output; banding for the
    LSH candidate join consumes these columns downstream.
    """
    docs = load(spark, "documents", sf_dir).where(F.col("doc_id") < 200)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    sigs = [
        F.min(
            F.conv(
                F.substring(F.md5(F.concat("token", F.lit(f"#{s}"))), 1, 8), 16, 10
            ).cast("long")
        ).alias(f"sig{s}")
        for s in _MH_SEEDS
    ]
    return tok.groupBy("doc_id").agg(*sigs)


# ---------------------------------------------------------------------------
# A1/A2/D7 — JSON-lines write→read round trip.  The CSV twin
# (a_csv_roundtrip_read) pins delimiter quoting; this pins JSON STRING
# ESCAPING: the props column is itself a JSON document, so the sink must
# escape it as a quoted string ("{\"k\": 87}") and the schema-first read
# must restore it byte-exactly — the oracle recomputes from the source
# table, so any escaping bug breaks the props-length hash.
# ---------------------------------------------------------------------------


@graded(
    "a_jsonl_roundtrip_read",
    oracle=f"""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum({cents_sql('value')}) AS BIGINT) AS value_cents,
               CAST(sum(length(props)) AS BIGINT) AS sum_props_chars
        FROM events WHERE event_id < 3000
        GROUP BY 1
    """,
    section="A1,A2,D7",
    description="JSON-lines write->read round trip: the props column (a "
    "JSON document in a string) survives the JSONL sink's string escaping "
    "and a schema-first read byte-exactly; oracle recomputes from source",
)
def a_jsonl_roundtrip_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB shape: JSONL is the other perimeter interchange format
    (event collectors, vendor drops).  Correctness is string escaping;
    schema-first read keeps the scan single-pass (no sampling pass), which
    is what matters at volume.  Deterministic per-process fixture dir,
    overwritten in place (same hygiene as the other store-building
    queries)."""
    import os as _os

    from pulsar_message_filter_spark.tmpdirs import run_scoped_dir

    ev = (
        load(spark, "events", sf_dir)
        .filter(F.col("event_id") < 3000)
        .select("event_id", "event_type", "value", "props")
    )
    tag = _os.path.basename(_os.path.normpath(sf_dir)) or "sf"
    root = run_scoped_dir(f"pmf_jsonl_rt_{tag}")
    ev.write.mode("overwrite").json(root)
    back = spark.read.schema(
        "event_id long, event_type string, value double, props string"
    ).json(root)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
        F.sum(F.length("props")).cast("long").alias("sum_props_chars"),
    )
