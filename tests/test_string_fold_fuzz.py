"""TENTH differential fuzz family: seeded unicode string-fold fuzz.

The fixed-pool pin in test_sketch.py proves ``hll_key_expr``'s fold
agrees cross-engine on hand-picked corner classes; this family draws
SEEDED RANDOM strings from stratified codepoint ranges (ASCII, Latin-1
supplement, general BMP, astral plane, and deliberate mixtures, lengths
0–12) and checks three independent witnesses per string:

* the production Spark Column expression (``split``/``ascii``/``aggregate``),
* the oracle-side DuckDB form (``sketch.fold_sql`` — the exact fragment
  the graded e2f/e2g/cms_string_key_counts oracles compose), and
* a pure-Python ``ord`` codepoint mirror.

Seeded ``random.Random`` keeps every run deterministic (no hypothesis
shrink-state on disk, same strings every CI run).  Excluded codepoints:
surrogates U+D800–DFFF (not encodable as UTF-8 scalar values) and NUL
(embedded NUL handling differs across storage layers and no fixture can
carry it).  Everything else — combining marks, bidi controls, emoji,
unassigned-but-valid scalars — is fair game.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

_RANGES = {
    "ascii": [(0x20, 0x7E)],
    "latin1": [(0xA0, 0xFF)],
    "bmp": [(0x0100, 0xD7FF)],
    "astral": [(0x10000, 0x10FFF), (0x1F300, 0x1F64F)],
    "mixed": [(0x20, 0x7E), (0xA0, 0xFF), (0x0100, 0xD7FF), (0x1F300, 0x1F64F)],
}


def _pool(kind: str, seed: int, n: int = 120) -> list[str]:
    # zlib.crc32, not hash(): str hashing is salted per-process, and the
    # pools must be byte-identical across runs for failures to reproduce
    import zlib

    rng = random.Random(zlib.crc32(kind.encode()) ^ seed)
    ranges = _RANGES[kind]
    out = [""]  # always include the empty string
    for _ in range(n - 1):
        length = rng.randint(0, 12)
        s = "".join(
            chr(rng.randint(*rng.choice(ranges))) for _ in range(length)
        )
        out.append(s)
    return out


def _py_fold(s: str, mod: int) -> int:
    acc = 0
    for code in [0] if s == "" else [ord(c) for c in s]:
        acc = (acc * 31 + code) % mod
    return acc


@pytest.mark.parametrize("kind", sorted(_RANGES))
@pytest.mark.parametrize("seed", [1, 2])
def test_fold_three_witnesses_agree(spark, kind, seed):
    from pyspark.sql import functions as F  # noqa: F401

    from pulsar_message_filter_spark.operators.sketch import (
        _STR_FOLD_MOD,
        fold_sql,
        hll_key_expr,
    )

    pool = _pool(kind, seed)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(pool)], "i long, k string")
    got_spark = {
        r.i: r.fold
        for r in df.select("i", hll_key_expr(df, "k").alias("fold")).collect()
    }

    con = duckdb.connect()
    con.register("pool", pd.DataFrame({"i": range(len(pool)), "k": pool}))
    got_duck = dict(
        con.execute(f"SELECT i, {fold_sql('k')} FROM pool").fetchall()
    )

    assert len(got_spark) == len(pool) == len(got_duck)
    for i, s in enumerate(pool):
        expected = _py_fold(s, _STR_FOLD_MOD)
        assert got_spark[i] == got_duck[i] == expected, (
            kind,
            seed,
            s,
            got_spark[i],
            got_duck[i],
            expected,
        )
