"""Differential fuzz for the scalar-function surface (D1–D8) — VERDICT
r09 item #3: the one graded family that had only hand-paired oracles.

Seeded specs render from ONE pick into BOTH a Spark Column chain and
DuckDB SQL, then compare exactly.  Date/time is the priority corner (the
ntz/ns parity traps in FIXTURES.md were all found by hand); the pools are
weighted toward it.

Determinism rules that make exact compare sound:
- NO raw doubles in any output column: math legs go through exact cents
  (``CAST(round(value*100) AS BIGINT)``) or integer ops (abs/mod/intdiv/
  ceil/floor-of-div/greatest/least/bit ops), all closed under int64;
- timestamps/dates render to strings (strftime ↔ date_format) or epoch
  integers, never raw temporal objects (driver-canonicalizer rule);
- epoch seconds use floor division of epoch_us — DuckDB's
  ``CAST(epoch(ts) AS BIGINT)`` *rounds* while Spark's unix_timestamp
  truncates (the func_datetime2 trap, re-pinned here);
- dayofweek carries the +1 shift (DuckDB 0=Sunday, Spark 1=Sunday);
- booleans cast to int on both sides;
- hashes are lowercase hex on both engines (md5/sha256);
- every expression aliases identically on both sides.

Engine-parity rules the fuzzer BAKES IN (documented divergences, not
bugs): pattern maps date_format yyyy/MM/dd/HH/mm/ss/DDD ↔ strftime
%Y/%m/%d/%H/%M/%S/%j only — other pattern letters differ between the two
mini-languages; add_months ↔ ``+ INTERVAL n MONTH`` (both clamp to month
end); integer division uses Spark ``div`` ↔ DuckDB ``//`` with operands
kept non-negative (they truncate differently on negatives).
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Column
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from tests.conftest import SF_SMOKE

# ---------------------------------------------------------------------------
# snippet pools — each entry: rng -> (spark Column, duckdb SQL expr)
# Both sides are built from the same rng draws, so one spec = one pair.
# ---------------------------------------------------------------------------

_FMT_PAIRS = [  # (Spark date_format pattern, DuckDB strftime pattern)
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyyMM", "%Y%m"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("yyyy-DDD", "%Y-%j"),
]
_TS_FMT_PAIRS = [
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("HH:mm", "%H:%M"),
    ("yyyy-MM-dd'T'HH", "%Y-%m-%dT%H"),
]


def _date_pool(rng: random.Random, col: str):
    """Date-valued source column → (Column, sql) picks.

    The column is normalized to DATE on BOTH sides first: the fuzzer's
    own first run caught that this testdata generation ships o_orderdate
    as parquet TIMESTAMP_NTZ, which Spark's date-only functions
    (unix_date) reject while year/month silently accept — exactly the
    ntz-typing trap class this suite exists to probe.
    """
    k = rng.randint(2, 11)
    fmt_s, fmt_d = rng.choice(_FMT_PAIRS)
    trunc = rng.choice(["month", "quarter", "year", "week"])
    d_s = F.col(col).cast("date")
    d_d = f"CAST({col} AS DATE)"
    picks = [
        (F.year(d_s).cast("long"), f"CAST(year({d_d}) AS BIGINT)"),
        (F.month(d_s).cast("long"), f"CAST(month({d_d}) AS BIGINT)"),
        (F.dayofmonth(d_s).cast("long"), f"CAST(day({d_d}) AS BIGINT)"),
        (F.quarter(d_s).cast("long"), f"CAST(quarter({d_d}) AS BIGINT)"),
        (
            F.dayofweek(d_s).cast("long"),
            f"CAST(dayofweek({d_d}) + 1 AS BIGINT)",
        ),
        (F.dayofyear(d_s).cast("long"), f"CAST(dayofyear({d_d}) AS BIGINT)"),
        (F.weekofyear(d_s).cast("long"), f"CAST(weekofyear({d_d}) AS BIGINT)"),
        (F.unix_date(d_s), f"date_diff('day', DATE '1970-01-01', {d_d})"),
        (
            F.datediff(d_s, F.lit("1995-06-15").cast("date")).cast("long"),
            f"date_diff('day', DATE '1995-06-15', {d_d})",
        ),
        (F.date_format(d_s, fmt_s), f"strftime({d_d}, '{fmt_d}')"),
        (
            F.date_format(F.date_trunc(trunc, d_s.cast("timestamp")), "yyyy-MM-dd"),
            f"strftime(date_trunc('{trunc}', {d_d}), '%Y-%m-%d')",
        ),
        (
            F.date_format(F.last_day(d_s), "yyyy-MM-dd"),
            f"strftime(last_day({d_d}), '%Y-%m-%d')",
        ),
        (
            F.date_format(F.add_months(d_s, k), "yyyy-MM-dd"),
            f"strftime({d_d} + INTERVAL {k} MONTH, '%Y-%m-%d')",
        ),
        (
            F.date_format(F.date_add(d_s, k), "yyyy-MM-dd"),
            f"strftime({d_d} + INTERVAL {k} DAY, '%Y-%m-%d')",
        ),
    ]
    return rng.choice(picks)


def _ts_pool(rng: random.Random, col: str):
    """Timestamp-typed source column → (Column, sql) picks."""
    fmt_s, fmt_d = rng.choice(_TS_FMT_PAIRS)
    trunc = rng.choice(["hour", "day", "minute"])
    h = rng.randint(1, 23)
    picks = [
        (F.hour(col).cast("long"), f"CAST(hour({col}) AS BIGINT)"),
        (F.minute(col).cast("long"), f"CAST(minute({col}) AS BIGINT)"),
        (F.second(col).cast("long"), f"CAST(second({col}) AS BIGINT)"),
        (F.unix_micros(F.col(col)), f"epoch_us({col})"),
        # floor-division epoch seconds — the rounding-vs-truncation trap
        (F.unix_timestamp(col), f"epoch_us({col}) // 1000000"),
        (F.date_format(col, fmt_s), f"strftime({col}, '{fmt_d}')"),
        (
            F.date_format(F.date_trunc(trunc, col), "yyyy-MM-dd HH:mm:ss"),
            f"strftime(date_trunc('{trunc}', {col}), '%Y-%m-%d %H:%M:%S')",
        ),
        (
            F.date_format(F.col(col).cast("date"), "yyyy-MM-dd"),
            f"strftime(CAST({col} AS DATE), '%Y-%m-%d')",
        ),
        (
            F.date_format(F.col(col) + F.expr(f"INTERVAL {h} HOURS"), "yyyy-MM-dd HH:mm:ss"),
            f"strftime({col} + INTERVAL {h} HOUR, '%Y-%m-%d %H:%M:%S')",
        ),
        (F.dayofmonth(col).cast("long"), f"CAST(day({col}) AS BIGINT)"),
    ]
    return rng.choice(picks)


def _str_pool(rng: random.Random, col: str):
    """String-typed source column → (Column, sql) picks, incl. composed
    wrappers (length∘upper, substring∘reverse) and lowercase-hex hashes."""
    a, b = rng.randint(1, 3), rng.randint(2, 6)
    needle = rng.choice(["e", "ck", "o", "ur"])
    picks = [
        (F.upper(col), f"upper({col})"),
        (F.lower(F.reverse(col)), f"lower(reverse({col}))"),
        (F.length(F.upper(col)).cast("long"), f"CAST(length(upper({col})) AS BIGINT)"),
        (F.substring(F.reverse(col), a, b), f"substring(reverse({col}), {a}, {b})"),
        (F.lpad(col, 12, "_"), f"lpad({col}, 12, '_')"),
        (F.rpad(F.upper(col), 10, "*"), f"rpad(upper({col}), 10, '*')"),
        (F.translate(col, "aeiou", "AEIOU"), f"translate({col}, 'aeiou', 'AEIOU')"),
        (F.expr(f"replace({col}, '{needle}', '#')"), f"replace({col}, '{needle}', '#')"),
        (F.repeat(F.substring(col, 1, 2), 3), f"repeat(substring({col}, 1, 2), 3)"),
        (F.instr(col, needle).cast("long"), f"CAST(instr({col}, '{needle}') AS BIGINT)"),
        (F.ascii(col).cast("long"), f"CAST(ascii({col}) AS BIGINT)"),
        (
            F.levenshtein(col, F.lit("purchase")).cast("long"),
            f"CAST(levenshtein({col}, 'purchase') AS BIGINT)",
        ),
        (
            F.startswith(F.col(col), F.lit(needle)).cast("int").cast("long"),
            f"CAST(starts_with({col}, '{needle}') AS BIGINT)",
        ),
        (F.md5(F.col(col).cast("binary")), f"md5({col})"),
        (
            F.sha2(F.col(col).cast("binary"), 256),
            f"sha256({col})",
        ),
        (
            F.concat_ws("|", F.upper(col), F.length(col).cast("string")),
            f"concat_ws('|', upper({col}), CAST(length({col}) AS VARCHAR))",
        ),
    ]
    return rng.choice(picks)


def _int_pool(rng: random.Random, col: str):
    """Non-negative integer source column → exact int64 picks."""
    k = rng.choice([3, 7, 11, 100])
    m = rng.randint(2, 50)
    picks = [
        (F.abs(F.col(col) - m).cast("long"), f"CAST(abs({col} - {m}) AS BIGINT)"),
        ((F.col(col) % k).cast("long"), f"CAST({col} % {k} AS BIGINT)"),
        (F.expr(f"{col} div {k}").cast("long"), f"CAST({col} // {k} AS BIGINT)"),
        (F.greatest(F.col(col), F.lit(m)).cast("long"), f"CAST(greatest({col}, {m}) AS BIGINT)"),
        (F.least(F.col(col), F.lit(m)).cast("long"), f"CAST(least({col}, {m}) AS BIGINT)"),
        (
            F.expr(f"shiftleft({col} % 1000, 3)").cast("long"),
            f"CAST(({col} % 1000) << 3 AS BIGINT)",
        ),
        (F.expr(f"{col} & 255").cast("long"), f"CAST({col} & 255 AS BIGINT)"),
        (
            F.expr(f"pow({col} % 13, 2)").cast("long"),
            f"CAST(power({col} % 13, 2) AS BIGINT)",
        ),
        (
            # one array leg: join of a sequence sized by the key (D5)
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), (F.col(col) % 4 + 1).cast("int")),
                    lambda x: x.cast("string"),
                ),
                ":",
            ),
            f"array_to_string(list_transform(generate_series(1, "
            f"CAST({col} % 4 + 1 AS BIGINT)), x -> CAST(x AS VARCHAR)), ':')",
        ),
    ]
    return rng.choice(picks)


def _dbl_pool(rng: random.Random, col: str):
    """2-decimal double source column → exact integer picks (no raw
    doubles survive to the output)."""
    k = rng.choice([3, 7, 9])
    cents_s = F.round(F.col(col) * 100).cast("long")
    cents_d = f"CAST(round({col} * 100) AS BIGINT)"
    picks = [
        (cents_s, cents_d),
        ((cents_s % k).cast("long"), f"CAST({cents_d} % {k} AS BIGINT)"),
        (F.ceil(F.col(col) / k).cast("long"), f"CAST(ceil({col} / {k}) AS BIGINT)"),
        (F.floor(F.col(col) / k).cast("long"), f"CAST(floor({col} / {k}) AS BIGINT)"),
        (F.signum(F.col(col) - 100).cast("long"), f"CAST(sign({col} - 100) AS BIGINT)"),
        (
            F.abs(cents_s - 5000).cast("long"),
            f"CAST(abs({cents_d} - 5000) AS BIGINT)",
        ),
    ]
    return rng.choice(picks)


def _json_pool(rng: random.Random, col: str):
    """JSON property extraction (D7) over the events props column —
    get_json_object ↔ json_extract_string, incl. the missing-key NULL
    path and numeric coercion of the extracted string."""
    k = rng.choice([3, 7, 50])
    picks = [
        (
            F.get_json_object(col, "$.k"),
            f"json_extract_string({col}, '$.k')",
        ),
        (
            F.get_json_object(col, "$.k").cast("long"),
            f"CAST(json_extract_string({col}, '$.k') AS BIGINT)",
        ),
        (
            F.coalesce(F.get_json_object(col, "$.absent"), F.lit("none")),
            f"coalesce(json_extract_string({col}, '$.absent'), 'none')",
        ),
        (
            (F.get_json_object(col, "$.k").cast("long") % k).cast("long"),
            f"CAST(CAST(json_extract_string({col}, '$.k') AS BIGINT) % {k} "
            "AS BIGINT)",
        ),
        (
            (F.get_json_object(col, "$.k").cast("long") > k)
            .cast("int")
            .cast("long"),
            f"CAST(CAST(json_extract_string({col}, '$.k') AS BIGINT) > {k} "
            "AS BIGINT)",
        ),
        (
            F.get_json_object(col, "$.absent").isNull().cast("int").cast("long"),
            f"CAST(json_extract_string({col}, '$.absent') IS NULL AS BIGINT)",
        ),
    ]
    return rng.choice(picks)


def _cond_pool(rng: random.Random, str_col: str, int_col: str, str_vals):
    """Conditional/null family (D4): CASE chains, nullif+coalesce.

    Literals are drawn from the TABLE'S OWN value domain — drawing event
    types while fuzzing orders would make every comparison false and
    degenerate the pool to constants (code-review finding, round 14).
    """
    v1, v2 = rng.sample(str_vals, 2)
    k = rng.randint(2, 9)
    picks = [
        (
            F.when(F.col(str_col) == v1, F.lit("A"))
            .when(F.col(str_col) == v2, F.lit("B"))
            .otherwise(F.lit("Z")),
            f"CASE WHEN {str_col} = '{v1}' THEN 'A' "
            f"WHEN {str_col} = '{v2}' THEN 'B' ELSE 'Z' END",
        ),
        (
            F.coalesce(F.nullif(F.col(str_col), F.lit(v1)), F.lit("GONE")),
            f"coalesce(nullif({str_col}, '{v1}'), 'GONE')",
        ),
        (
            F.when(F.col(int_col) % k == 0, F.col(int_col)).otherwise(F.lit(-1)).cast("long"),
            f"CAST(CASE WHEN {int_col} % {k} = 0 THEN {int_col} ELSE -1 END AS BIGINT)",
        ),
        (
            (F.col(int_col) % k == 0).cast("int").cast("long"),
            f"CAST({int_col} % {k} = 0 AS BIGINT)",
        ),
    ]
    return rng.choice(picks)


# per-table column typing: (key, date cols, ts cols, str cols, int cols, dbl cols)
_TABLES = {
    "orders": {
        "key": "o_orderkey",
        "filter_d": "o_orderkey < 4000",
        "date": ["o_orderdate"],
        "ts": [],
        "str": ["o_orderstatus", "o_orderpriority"],
        "str_vals": ["O", "F", "P"],
        "int": ["o_orderkey", "o_custkey"],
        "dbl": ["o_totalprice"],
        "json": [],
    },
    "events": {
        "key": "event_id",
        "filter_d": "event_id < 4000",
        "date": [],
        "ts": ["ts"],
        "str": ["event_type"],
        "str_vals": ["click", "view", "purchase", "error", "signup"],
        "int": ["event_id", "user_id"],
        "dbl": ["value"],
        "json": ["props"],
    },
}


def _build_spec(rng: random.Random, table: str):
    """5 random paired expressions over the chosen table, datetime-weighted."""
    t = _TABLES[table]
    pools = []
    # date/time first and twice-weighted — the VERDICT priority corner
    for col in t["date"]:
        pools += [lambda r, c=col: _date_pool(r, c)] * 2
    for col in t["ts"]:
        pools += [lambda r, c=col: _ts_pool(r, c)] * 2
    for col in t["str"]:
        pools.append(lambda r, c=col: _str_pool(r, c))
    for col in t["int"]:
        pools.append(lambda r, c=col: _int_pool(r, c))
    for col in t["dbl"]:
        pools.append(lambda r, c=col: _dbl_pool(r, c))
    for col in t["json"]:
        pools.append(lambda r, c=col: _json_pool(r, c))
    pools.append(
        lambda r: _cond_pool(r, t["str"][0], t["int"][0], t["str_vals"])
    )

    spark_cols, sql_cols = [F.col(t["key"]).cast("long").alias("k")], [
        f"CAST({t['key']} AS BIGINT) AS k"
    ]
    for i in range(5):
        gen = rng.choice(pools)
        col, sql = gen(rng)
        assert isinstance(col, Column)
        spark_cols.append(col.alias(f"e{i}"))
        sql_cols.append(f"{sql} AS e{i}")
    return spark_cols, sql_cols


def _run_spec(spark, duck, seed: int) -> int:
    rng = random.Random(31_000 + seed)
    table = rng.choice(list(_TABLES))
    t = _TABLES[table]
    spark_cols, sql_cols = _build_spec(rng, table)

    df = load(spark, table, SF_SMOKE).filter(t["filter_d"]).select(*spark_cols)
    got = sorted((tuple(r) for r in df.collect()), key=repr)

    sql = f"SELECT {', '.join(sql_cols)} FROM {table} WHERE {t['filter_d']}"
    want = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=repr)

    assert got == want, (seed, table, sql, got[:3], want[:3])
    return len(got)


@pytest.mark.parametrize("seed", range(30))
def test_random_scalar_function_specs_match_duckdb(spark, duck, seed):
    n = _run_spec(spark, duck, seed)
    assert n >= 1
