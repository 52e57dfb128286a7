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


_OP_LINE = re.compile(r"^[\s:+\-*]*(?:\((\d+)\)\s*)?([A-Za-z][A-Za-z0-9]*)")
_PUSHED_ATOM = re.compile(r"([A-Za-z]+)\(([A-Za-z_][A-Za-z_0-9]*)")


def plan_fingerprint(df: DataFrame) -> dict:
    """Structural fingerprint of the physical plan for regression diffing.

    Captures what matters at 100 TB and nothing that churns: the multiset
    of physical operator kinds (joins, exchanges, aggregates, Python-eval
    nodes...), plus pushed-filter shapes as ``Predicate(column)`` with
    literal values stripped.  Expression ids, statistics, codegen stage
    numbering, and file paths never enter the fingerprint, so it is stable
    across sessions — it changes exactly when the *shape* of the plan
    changes (a new shuffle, a join strategy flip, a lost pushdown).
    """
    ops: dict[str, int] = {}
    for line in plan_str(df, "simple").splitlines():
        m = _OP_LINE.match(line)
        if not m or not m.group(2):
            continue
        op = m.group(2)
        # skip non-operator prose (e.g. "== Physical Plan ==" headers)
        if op in {"Physical", "Output", "Arguments", "Results", "Subquery"}:
            continue
        ops[op] = ops.get(op, 0) + 1
    pushed = sorted(
        {
            f"{m.group(1)}({m.group(2)})"
            for block in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df))
            for m in _PUSHED_ATOM.finditer(block.group(1))
        }
    )
    return {"ops": dict(sorted(ops.items())), "pushed": pushed}


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
