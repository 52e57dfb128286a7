"""Physical-plan inspection (SURVEY.md §4.2's "verify with explain" column).

The scale contract every operator is held to (tests/test_plans.py):

* selector predicates on native columns reach the parquet scan as
  ``PushedFilters`` (I/O skipping at 100 TB);
* dim joins are ``BroadcastHashJoin`` — no shuffle of the fact side;
* top-k compiles to ``TakeOrderedAndProject`` — per-partition heaps, never
  a global sort;
* nothing accidental is a ``CartesianProduct``;
* hot paths sit inside ``WholeStageCodegen`` spans.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (``df.explain`` writes to stdout)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries of every scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df)


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_str(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in plan_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider/fewer is better).

    Under AQE the pre-execution plan is wrapped in AdaptiveSparkPlan and
    shows no codegen markers, so AQE is toggled off just for this
    inspection (physical planning re-runs at explain time)."""
    spark = df.sparkSession
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        m = re.search(
            r"Found (\d+) WholeStageCodegen subtrees", plan_str(df, "codegen")
        )
        return int(m.group(1)) if m else 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
