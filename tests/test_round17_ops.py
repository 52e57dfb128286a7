"""Round-17 pins: the three ADVICE-r11 fixes.

1. Floor-aligned sliding-window bases for pre-1970 (negative-epoch)
   timestamps — Spark's ``%`` and DuckDB's ``//`` both truncate toward
   zero, while ``F.window`` floors; the arithmetic expansions now use
   ``F.pmod`` (Spark) / ``x - ((x % S) + S) % S`` (DuckDB oracle) so all
   three agree at any epoch.
2. ``amax = 0`` (all-zero embedding) quantization guard in
   f21b/f49b: 0/0 = NaN would poison the int8 lattice with
   engine-dependent NULL/NaN propagation; both sides now map the zero
   vector to the zero vector.
3. Graceful empty-input behavior for kmeans_assign_exact / f49b.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

_SLIDE_CASES_US = [
    -10_800_000_001,
    -10_800_000_000,
    -7_200_000_000,
    -5_400_000_000,
    -3_599_999_999,
    -1,
    0,
    1,
    1_799_999_999,
    3_600_000_000,
    1_700_000_000_123_456,
]
_S = 3_600_000_000  # 1h slide in µs


def test_floor_alignment_cross_engine():
    """The oracle's integer positive-mod base and Spark's pmod base must
    both equal true floor alignment for negative AND positive epochs."""
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-tests", shuffle_partitions=8)
    expected = [_S * math.floor(x / _S) for x in _SLIDE_CASES_US]

    duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT x - ((x % {_S}) + {_S}) % {_S} FROM (SELECT unnest("
            f"{_SLIDE_CASES_US}) AS x)"
        ).fetchall()
    ]
    assert duck == expected

    df = spark.createDataFrame([(x,) for x in _SLIDE_CASES_US], "x long")
    got = [
        r.base
        for r in df.select(
            (F.col("x") - F.pmod("x", F.lit(_S))).alias("base")
        ).collect()
    ]
    assert got == expected

    # the OLD truncated forms really do diverge pre-1970 (regression guard
    # that this test is not vacuous)
    assert duckdb.sql(f"SELECT (-5400000000 // {_S}) * {_S}").fetchone()[0] != (
        _S * math.floor(-5_400_000_000 / _S)
    )


def _pre1970_events(spark):
    rows = []
    base = dt.datetime(1969, 12, 31, 18, 0, 0)
    for i in range(40):
        rows.append((base + dt.timedelta(minutes=17 * i), i % 4))
    return spark.createDataFrame(rows, "ts timestamp, user_id long")


def test_sliding_hll_pre1970_aligns_with_exact(spark):
    """method='hll' (arithmetic pmod expansion) must emit exactly the
    window starts F.window (method='exact') emits, even for negative
    epochs, and its small-range estimates must track the exact counts."""
    from pulsar_message_filter_spark.operators.windows import sliding_distinct

    ev = _pre1970_events(spark)
    exact = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(
            ev, "ts", "user_id", "2 hours", "1 hour", method="exact"
        ).collect()
    }
    hll = {
        r.ws_us: r.n_distinct
        for r in sliding_distinct(
            ev, "ts", "user_id", "2 hours", "1 hour", method="hll"
        ).collect()
    }
    assert set(hll) == set(exact)  # the alignment fix: same window starts
    assert all(ws % 3_600_000_000 == 0 for ws in hll)  # floor-aligned bases
    assert any(ws < 0 for ws in hll)  # the fixture really is pre-1970
    for ws, n in exact.items():
        assert abs(hll[ws] - n) <= 1  # 64-register small-range accuracy

    # pure-Python floor-semantics recompute (independent of both engines)
    expected: dict[int, set[int]] = {}
    for row in ev.collect():
        us = int(row.ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        base = 3_600_000_000 * math.floor(us / 3_600_000_000)
        for k in range(2):
            expected.setdefault(base - k * 3_600_000_000, set()).add(row.user_id)
    assert exact == {ws: len(s) for ws, s in expected.items()}


def _write_embeddings(tmp_path, rows):
    """rows: list[(vec_id, list[float])] → <tmp>/embeddings.parquet."""
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _oracle_rows(name: str, sf_dir: str):
    import pulsar_message_filter_spark.operators.widen4  # noqa: F401 (registers)
    from pulsar_message_filter_spark.registry import _REGISTRY

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    cur = con.execute(_REGISTRY[name].oracle)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _spark_vs_oracle(spark, name: str, sf_dir: str):
    import pulsar_message_filter_spark.operators.widen4  # noqa: F401 (registers)
    from pulsar_message_filter_spark.registry import _REGISTRY

    df = _REGISTRY[name].fn(spark, sf_dir)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    o_cols, o_rows = _oracle_rows(name, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    s_ord = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_ord = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    canon_s = sorted(tuple(str(r[i]) for i in s_ord) for r in s_rows)
    canon_o = sorted(tuple(str(r[i]) for i in o_ord) for r in o_rows)
    assert canon_s == canon_o, f"{name}: engine mismatch on synthetic corpus"
    return s_rows


def test_f21b_zero_vector_no_nan_poison(spark, tmp_path):
    """An all-zero embedding (amax = 0) must quantize to the zero vector
    on BOTH engines — not 0/0 = NaN — and the two engines must still
    hash-agree on a corpus that contains such vectors in both the query
    prefix and the candidate pool."""
    import random

    rng = random.Random(17)
    rows = []
    for vid in range(56):
        if vid in (3, 31, 55):  # zero vectors: one query, two pool members
            rows.append((vid, [0.0] * 8))
        else:
            rows.append((vid, [rng.uniform(-1, 1) for _ in range(8)]))
    sf_dir = _write_embeddings(tmp_path, rows)
    got = _spark_vs_oracle(spark, "f21b_topk_int8_exact", sf_dir)
    assert got, "expected non-empty top-k"
    assert all(v is not None for r in got for v in r)
    # the zero-vector query ranks by dot8 = 0 for every neighbor → its
    # top-k are the smallest neighbor ids (deterministic tie-break)
    q3 = sorted(r for r in got if r[0] == 3)
    assert [r[1] for r in sorted(q3, key=lambda r: r[3])] == [0, 1, 2]


def test_f49b_zero_vectors_in_pool(spark, tmp_path):
    """f49b's greedy pick order must stay engine-exact with all-zero
    vectors inside the candidate pool (quantized to zero, never NaN)."""
    import random

    rng = random.Random(23)
    rows = [(0, [rng.uniform(-1, 1) for _ in range(8)])]
    for vid in range(1, 51):
        if vid in (7, 40):
            rows.append((vid, [0.0] * 8))
        else:
            rows.append((vid, [rng.uniform(-1, 1) for _ in range(8)]))
    sf_dir = _write_embeddings(tmp_path, rows)
    got = _spark_vs_oracle(spark, "f49b_mmr_exact", sf_dir)
    assert len(got) == 10
    assert all(v is not None for r in got for v in r)


def test_kmeans_and_f49b_on_empty_embeddings(spark, tmp_path):
    """Empty embeddings table: graceful empty frames, right schemas."""
    from pulsar_message_filter_spark.operators.widen4 import (
        f49b_mmr_exact,
        kmeans_assign_exact,
    )

    sf_dir = _write_embeddings(tmp_path, [])
    km = kmeans_assign_exact(spark, sf_dir)
    assert km.columns == ["cluster", "n_members", "sum_vec_id", "sum_d2"]
    assert km.count() == 0
    mmr = f49b_mmr_exact(spark, sf_dir)
    assert mmr.columns == ["rank", "neighbor_id", "rel8", "score10"]
    assert mmr.count() == 0


def test_f49b_pool_smaller_than_k(spark, tmp_path):
    """Pool of 4 candidates < k=10: emit the 4 picks, don't crash."""
    import random

    rng = random.Random(5)
    rows = [(vid, [rng.uniform(-1, 1) for _ in range(8)]) for vid in range(5)]
    sf_dir = _write_embeddings(tmp_path, rows)
    from pulsar_message_filter_spark.operators.widen4 import f49b_mmr_exact

    got = f49b_mmr_exact(spark, sf_dir).collect()
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2, 3, 4]


def test_e2f_string_hll_python_witness(spark):
    """End-to-end pure-Python recompute of e2f_sliding_type_reach_hll on
    sf0.001: string fold → avalanche hash → per-(window, register) max rho
    → small-range-corrected estimate → HALF_UP integer round.  Uses
    bit_length for rho and Decimal HALF_UP for the rounds — different
    exactness paths from both engines."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.io import load
    from pulsar_message_filter_spark.operators.sketch import (
        _HLL_A,
        _HLL_ALPHA,
        _HLL_B,
        _HLL_M,
        _HLL_MULT,
        _P,
        _STR_FOLD_MOD,
    )
    from pulsar_message_filter_spark.operators.widen4 import (
        e2f_sliding_type_reach_hll,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.ws_us: r.n_distinct for r in e2f_sliding_type_reach_hll(spark, sf).collect()}

    slide_us, members = 2 * 3600 * 1_000_000, 3
    rows = (
        load(spark, "events", sf)
        .select(F.unix_micros("ts").alias("us"), "event_type")
        .collect()
    )
    regs: dict[tuple[int, int], int] = {}
    for r in rows:
        kv = 0
        for ch in r.event_type:
            kv = (kv * 31 + ord(ch)) % _STR_FOLD_MOD
        h = (kv * _HLL_A + _HLL_B) % _P
        h ^= h >> 16
        h = (h * _HLL_MULT) % _P
        h ^= h >> 13
        h = (h * _HLL_MULT) % _P
        h ^= h >> 16
        reg, w = h % _HLL_M, h // _HLL_M
        rho = (25 - (w.bit_length() - 1)) if w > 0 else 26
        base = r.us - r.us % slide_us
        for k in range(members):
            key = (base - k * slide_us, reg)
            if regs.get(key, -1) < rho:
                regs[key] = rho

    def half_up(x: float, places: str) -> Decimal:
        return Decimal(x).quantize(Decimal(places), ROUND_HALF_UP)

    expected: dict[int, int] = {}
    by_ws: dict[int, dict[int, int]] = {}
    for (ws, reg), rho in regs.items():
        by_ws.setdefault(ws, {})[reg] = rho
    for ws, table in by_ws.items():
        hit = len(table)
        hsum = sum(2.0**-rho for rho in table.values())  # exact dyadic sum
        v_empty = _HLL_M - hit
        raw = (_HLL_ALPHA * _HLL_M * _HLL_M) / (hsum + v_empty)
        if v_empty > 0 and raw <= 2.5 * _HLL_M:
            import math

            est4 = half_up(_HLL_M * math.log(_HLL_M / v_empty), "0.0001")
        else:
            est4 = half_up(raw, "0.0001")
        expected[ws] = int(est4.quantize(Decimal("1"), ROUND_HALF_UP))
    assert got == expected


def test_quantize_int8_zero_vector_deterministic(spark):
    """Production quantize_int8 on an all-zero embedding: zero codes and
    scale 0.0 (cosine 0 against anything), never NaN/null."""
    import math

    from pulsar_message_filter_spark.operators.similarity import (
        int8_cosine,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [0.5, -0.25, 0.125, 1.0])],
        "vec_id long, embedding array<float>",
    ).select("vec_id", quantize_int8(F.col("embedding")).alias("qs"))
    rows = {r.vec_id: r.qs for r in df.collect()}
    assert list(rows[0].q) == [0, 0, 0, 0]
    assert rows[0].scale == 0.0
    assert all(v is not None for v in rows[1].q)
    assert not math.isnan(rows[1].scale)

    pair = (
        df.withColumnRenamed("qs", "qa")
        .crossJoin(df.select(F.col("qs").alias("qb")))
        .select(int8_cosine(F.col("qa"), F.col("qb")).alias("cos"))
        .collect()
    )
    assert all(r.cos is not None and not math.isnan(r.cos) for r in pair)
