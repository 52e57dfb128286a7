"""Session factory and runtime configuration.

Two entry paths exist (SURVEY.md §5.2):

* the driver hands us an already-built ``SparkSession`` (``entry()`` /
  ``queries()``) — we may only set *runtime-settable* SQL confs on it;
* our own tests / bench build the session themselves via :func:`get_spark`.

``configure(spark)`` is therefore the single place where every conf the
engine depends on is applied; it is idempotent and safe to call per query.

Scale posture (SURVEY.md §4.3): AQE on (runtime re-plan, partition
coalescing, skew-join), Arrow for any pandas-UDF boundary, UTC session
timezone so epoch-derived timestamps render identically to the tz-naive
DuckDB oracle, and the nanos conf required to read ``events`` at all
(FIXTURES.md quirk 1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs the engine requires.  All of these are dynamic
#: (``spark.sql.*``) so they can be applied to a session we did not build.
RUNTIME_CONFS: dict[str, str] = {
    # events.ts is parquet TIMESTAMP(NANOS); Spark 4 hard-errors without this
    # (FIXTURES.md quirk 1).  With it, ts reads as bigint epoch-nanos.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic rendering of epoch-based timestamps; matches the tz-naive
    # DuckDB oracle views.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime partition coalescing + skew-join handling — the 100 TB
    # posture costs nothing locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow transfer for every pandas-UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # A conf may be non-settable on exotic deployments; the loader
            # will surface a hard error if one it needs is missing.
            pass
    return spark


def get_spark(
    app_name: str = "pulsar-message-filter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a session with the engine's defaults.

    Local-mode sizing: ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads) and
    shuffle partitions matched to cores — on a real cluster these come from
    the deployment, and AQE coalesces over-partitioned shuffles either way.

    ``extra_confs`` are applied at BUILD time — for confs that are not
    runtime-settable (e.g. ``spark.scheduler.mode``); they only take effect
    if this call actually creates the session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # bucketed-table demos (saveAsTable) must never write into the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/pmf-warehouse"),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
