"""Float-parity canonicalization helpers (SURVEY.md §7.4.3).

All fixture money/value columns are fixed 2-decimal data (measured: the
max residual of ``x*100`` from an integer is ~1e-9 across every double
column).  That enables *exact* cross-engine aggregates:

* ``SUM``: sum the 2dp doubles, ``round(sum, 2)`` — the true sum has only
  two decimals, so the 1e-10-scale summation-order noise can never straddle
  a rounding midpoint.  Safe.
* ``AVG`` (and any divide-after-sum): division creates ≥3 decimals and the
  true value frequently lands *exactly* on a rounding midpoint (e.g. the
  mean of two cents-values), where Spark (binary-exact HALF_UP) and DuckDB
  (decimal-repr rounding) legitimately disagree.  Fix: aggregate in integer
  cents — ``sum(cast(round(x*100) as bigint))`` is an exact, order-
  independent int64 — then perform the identical double division on both
  engines.  IEEE division of identical operands is bit-identical; no
  rounding step remains.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer-cents form of a 2-decimal double column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(expr: str) -> str:
    """Oracle-side twin of :func:`cents` (DuckDB dialect)."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def avg2(col: Column | str, alias: str) -> list[Column]:
    """Building blocks for a hash-exact 2dp average: aggregate these, then
    divide with :func:`avg2_final`."""
    return [F.sum(cents(col)).alias(f"__{alias}_cents"), F.count("*").alias(f"__{alias}_n")]


def avg2_final(alias: str) -> Column:
    return ((F.col(f"__{alias}_cents") / F.col(f"__{alias}_n")) / 100).alias(alias)


def avg2_sql(expr: str, alias: str) -> str:
    """Oracle-side one-shot exact average: identical int sum + double division."""
    return f"(sum({cents_sql(expr)}) / count(*)) / 100 AS {alias}"
