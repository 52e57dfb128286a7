"""Feature-engineering operators for training-data pipelines (SURVEY §2.F
extension surface): per-group standardization and a seeded iterative
clustering pass.

``feature_zscore`` shows that even *standardization* can be hash-exact
across engines: mean and variance come from integer-cents power sums, so
the z-score is a chain of identical double ops on identical int64s.

``kmeans_lite`` is the iterative-algorithm representative (driver contract
allows rows-only for these): a fixed number of Lloyd iterations with
seeded initial centroids.  Each iteration is one distributed assign +
aggregate; only the k×dim centroid matrix (O(k), not O(n)) returns to the
driver between iterations — the legitimate scalar-sized collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.operators.parity import cents, cents_sql
from pulsar_message_filter_spark.operators.similarity import EMB_DIM, dot
from pulsar_message_filter_spark.registry import graded

# ---------------------------------------------------------------------------
# per-group z-score standardization (exact)
# ---------------------------------------------------------------------------


@graded(
    "feature_zscore",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum({cents_sql('value')}) AS BIGINT) AS s1,
                   CAST(sum({cents_sql('value')} * {cents_sql('value')}) AS BIGINT) AS s2
            FROM events GROUP BY 1
        )
        SELECT e.event_id,
               round(({cents_sql('e.value')} - s.s1 / s.n)
                     / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 6) AS zscore
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.event_id < 2000
    """,
    section="F13,C11",
    description="per-group z-score standardization — hash-exact via integer "
    "power sums (population std), the feature-scaling primitive",
)
def feature_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    c = cents("value")
    stats = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    m1 = F.col("s1") / F.col("n")
    std_c = F.sqrt(F.col("s2") / F.col("n") - m1 * m1)
    return (
        events.filter(F.col("event_id") < 2000)
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            F.round((cents("value") - m1) / std_c, 6).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# seeded k-means-lite (iterative; rows-only by design)
# ---------------------------------------------------------------------------


def kmeans_lite(
    corpus: DataFrame, k: int = 8, iters: int = 3, seed: int = 11
) -> DataFrame:
    """Fixed-iteration Lloyd clustering over the embedding column.

    Initial centroids are seeded gaussians; each iteration assigns every
    vector to its nearest centroid (squared-L2 via the dot identity —
    pure Column algebra, one scan) and recomputes centroids with a
    posexplode + mean aggregation.  Deterministic: same seed + iteration
    count → same assignment.  Returns (vec_id, cluster, dist2).
    """
    import random as _random

    rng = _random.Random(seed)
    centroids = [
        [rng.gauss(0.0, 0.13) for _ in range(EMB_DIM)] for _ in range(k)
    ]

    def assign(df: DataFrame) -> DataFrame:
        # dist²(x, c) = |x|² - 2x·c + |c|²; |x|² is rank-invariant, so the
        # argmin needs only  -2x·c + |c|²  per centroid
        best_cluster, best_score = None, None
        for idx, cent in enumerate(centroids):
            carr = F.array(*[F.lit(v) for v in cent])
            c_norm2 = sum(v * v for v in cent)
            score = -2.0 * dot(F.col("embedding"), carr) + F.lit(c_norm2)
            if best_score is None:
                best_cluster, best_score = F.lit(idx), score
            else:
                best_cluster = F.when(score < best_score, idx).otherwise(best_cluster)
                best_score = F.least(score, best_score)
        return df.select(
            "vec_id", "embedding", best_cluster.alias("cluster"), best_score.alias("score")
        )

    for _ in range(iters):
        assigned = assign(corpus)
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims"))
            .select("cluster", F.col("dims.m").alias("centroid"))
            .collect()  # O(k·dim) — centroid matrix only, never the corpus
        )
        for row in new_rows:
            centroids[row.cluster] = list(row.centroid)

    final = assign(corpus)
    norm2 = dot(F.col("embedding"), F.col("embedding"))
    return final.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        F.round(norm2 + F.col("score"), 4).alias("dist2"),
    )


@graded(
    "kmeans_lite_clusters",
    oracle=None,  # iterative algorithm — rows-only per the driver contract
    section="F13,F14",
    description="seeded 3-iteration Lloyd clustering (k=8) over embeddings; "
    "per-iteration cost is one scan + one k×dim aggregate — rows-only",
)
def kmeans_lite_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return kmeans_lite(emb, k=8, iters=3)


# ---------------------------------------------------------------------------
# winsorized (percentile-clipped) robust aggregation (exact)
# ---------------------------------------------------------------------------


def winsorize(
    df: DataFrame,
    value: Column,
    group: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Clip ``value`` (an int64 column) to its per-group [lo, hi]
    percentiles, floored to integers so downstream sums stay exact.

    Two passes: one grouped exact-percentile aggregation (small output —
    one row per group, broadcast back), then a map-only clip.  The floor
    keeps every clipped value an int64, so the winsorized sum is
    bit-identical across engines and partition orders — robust statistics
    without float-summation drift.
    """
    bounds = df.groupBy(group).agg(
        F.floor(F.percentile(value, F.lit(lo))).alias("_p_lo"),
        F.floor(F.percentile(value, F.lit(hi))).alias("_p_hi"),
    )
    return df.join(F.broadcast(bounds), group).withColumn(
        "_clipped", F.least(F.greatest(value, F.col("_p_lo")), F.col("_p_hi"))
    )


@graded(
    "feature_winsorize",
    oracle=f"""
        WITH bounds AS (
            SELECT event_type,
                   CAST(floor(quantile_cont({cents_sql('value')}, 0.05)) AS BIGINT) AS p_lo,
                   CAST(floor(quantile_cont({cents_sql('value')}, 0.95)) AS BIGINT) AS p_hi
            FROM events GROUP BY 1
        )
        SELECT e.event_type,
               count(*) AS n,
               CAST(sum(least(greatest({cents_sql('e.value')}, b.p_lo), b.p_hi)) AS BIGINT)
                   AS winsorized_sum_cents,
               CAST(sum(CASE WHEN {cents_sql('e.value')} < b.p_lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_low,
               CAST(sum(CASE WHEN {cents_sql('e.value')} > b.p_hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clipped_high
        FROM events e JOIN bounds b USING (event_type)
        GROUP BY 1
    """,
    section="F13,C11,C14",
    description="winsorized robust aggregation: per-type values clipped to "
    "exact [p05, p95] (floored to integer cents, so the clipped sum is "
    "bit-exact); outlier-resistant feature totals + clip counts",
)
def feature_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    c = cents("value")
    clipped = winsorize(events.withColumn("_c", c), F.col("_c"), "event_type")
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("_clipped").alias("winsorized_sum_cents"),
        F.sum((F.col("_c") < F.col("_p_lo")).cast("long")).alias("n_clipped_low"),
        F.sum((F.col("_c") > F.col("_p_hi")).cast("long")).alias("n_clipped_high"),
    )


# ---------------------------------------------------------------------------
# equal-frequency binning (per-group ntile)
# ---------------------------------------------------------------------------


@graded(
    "feature_quantile_bins",
    oracle=f"""
        WITH binned AS (
            SELECT event_type,
                   {cents_sql('value')} AS c,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY {cents_sql('value')}, event_id) AS quartile
            FROM events
        )
        SELECT event_type, quartile,
               count(*) AS n,
               min(c) AS min_cents,
               max(c) AS max_cents,
               CAST(sum(c) AS BIGINT) AS sum_cents
        FROM binned GROUP BY 1, 2
    """,
    section="C18,F13,C11",
    description="equal-frequency binning: per-type value quartiles via "
    "ntile with a total order (cents, event_id tie-break — deterministic "
    "across engines); bin boundaries + exact integer sums.  Partitioned "
    "by the group key, so the sort is per-key, never global",
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    return (
        events.select("event_type", "event_id", cents("value").alias("c"))
        .withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
            F.sum("c").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Target encoding — leave-one-out + smoothed, leak-free by construction
# ---------------------------------------------------------------------------

_TE_M = 20.0  # smoothing pseudo-count toward the global prior


@graded(
    "feature_target_encode_loo",
    oracle=f"""
        WITH base AS (
            SELECT o_orderpriority,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
            FROM orders
        ),
        cat AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_cat,
                   CAST(sum(label) AS BIGINT) AS s_cat
            FROM base GROUP BY 1
        ),
        gp AS (
            SELECT CAST(sum(label) AS DOUBLE) / count(*) AS prior FROM base
        ),
        cells AS (
            SELECT b.o_orderpriority, CAST(b.label AS BIGINT) AS label,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(c.n_cat) AS n_cat, min(c.s_cat) AS s_cat
            FROM base b JOIN cat c USING (o_orderpriority)
            GROUP BY 1, 2
        )
        SELECT o_orderpriority, label, n_rows, n_cat,
               round(CAST(s_cat - label AS DOUBLE) / (n_cat - 1), 6)
                   AS enc_loo,
               round((CAST(s_cat - label AS DOUBLE) + {_TE_M} * prior)
                     / (n_cat - 1 + {_TE_M}), 6) AS enc_loo_smooth
        FROM cells CROSS JOIN gp
    """,
    section="C11,C25,F14",
    description="leave-one-out target encoding of order priority against the "
    "fulfilled-status label: each row's encoding (Σy - yᵢ)/(n-1) excludes the row "
    "itself (the leak-free form; naive mean encoding leaks the target), "
    "plus the m=20 smoothed variant shrinking rare categories toward the "
    "global prior — emitted per (category, label) cell because the LOO "
    "value is a pure function of that pair, which is also why the 100 TB "
    "form is a broadcast map, not a per-row shuffle",
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregates (per-category sums, the global prior) and a
    broadcast join back onto the (category, label) cells — the per-row
    encoded column at full scale is the same broadcast map applied in
    the scan stage, zero additional shuffles."""
    orders = load(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
    )
    cat = base.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_cat"), F.sum("label").cast("long").alias("s_cat")
    )
    glob = base.agg(
        (F.sum("label").cast("double") / F.count("*")).alias("prior")
    )
    cells = (
        base.groupBy("o_orderpriority", F.col("label").cast("long").alias("label"))
        .agg(F.count("*").alias("n_rows"))
        .join(F.broadcast(cat), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
    )
    num = (F.col("s_cat") - F.col("label")).cast("double")
    return cells.select(
        "o_orderpriority",
        "label",
        "n_rows",
        "n_cat",
        F.round(num / (F.col("n_cat") - 1), 6).alias("enc_loo"),
        F.round(
            (num + F.lit(_TE_M) * F.col("prior"))
            / (F.col("n_cat") - 1 + F.lit(_TE_M)),
            6,
        ).alias("enc_loo_smooth"),
    )
