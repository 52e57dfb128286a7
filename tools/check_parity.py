"""Local replica of the driver's correctness gate (SURVEY.md §5.2).

Runs every registered graded query at a scale factor against the DuckDB
oracle and compares: row count, column-name set, and order-insensitive
values (rows sorted after stringify).  Use while iterating:

    python tools/check_parity.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(value) -> str:
    """Canonical string form for order-insensitive comparison."""
    if value is None:
        return "\0NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def rows_to_canon(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def check_f18_fixture_precondition(sf_dir: str) -> list[str]:
    """Assert the fixture precondition the f18_incremental_dedup oracle
    rests on (ADVICE r04): its batch-dedup oracle is only equivalent to
    the signature-estimate pipeline while the corpus has NO organic
    non-identical pair with token-3-gram shingle Jaccard >= 0.8 between
    the fresh batch (docs 60-69) and batch 1 (docs < 40), nor within the
    fresh batch itself.  Checked here — at the same time the hash gate
    runs — so a regenerated testdata set trips it immediately, not only
    in pytest.
    """
    import duckdb as _dd

    con = _dd.connect()
    docs = con.execute(
        f"SELECT doc_id, lower(text) AS t FROM "
        f"read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 70"
    ).fetchall()
    sh = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        sh[doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        } or {text}
    texts = dict(docs)
    fresh = [i for i in sh if 60 <= i < 70]
    b1 = [i for i in sh if i < 40]
    problems = []
    for a in fresh:
        for b in b1 + [x for x in fresh if x < a]:
            if texts[a] == texts[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter * 5 >= union * 4:  # jaccard >= 0.8
                problems.append(
                    f"f18 fixture precondition violated: docs {a}/{b} are "
                    f"organic near-dups (shingle jaccard {inter/union:.2f}) "
                    "— the batch-dedup oracle no longer matches the "
                    "signature pipeline semantics"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names to check")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", type=int, default=3)
    args = ap.parse_args()

    import duckdb

    from pulsar_message_filter_spark import registry
    from pulsar_message_filter_spark.io import TABLES
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("parity-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    all_graded = registry.all_graded()
    names = args.names or sorted(all_graded)
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []

    if not args.names or "f18_incremental_dedup" in args.names:
        for p in check_f18_fixture_precondition(args.sf):
            print(f"FAIL  fixture: {p}")
            n_fail += 1
            failures.append("f18_fixture_precondition")

    for name in names:
        g = all_graded[name]
        t0 = time.time()
        try:
            sdf = g.fn(spark, args.sf)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue

        if g.oracle is None:
            print(f"rows- {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue

        try:
            res = con.execute(g.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            failures.append(name)
            continue

        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        else:
            # surface type drift (e.g. DuckDB HUGEINT vs Spark bigint) —
            # the likeliest silent breaker of a stricter driver schema
            # check.  DBAPI description types are coarse ('NUMBER'), so ask
            # DESCRIBE for the real DuckDB column types.
            duck_types = {
                r[0]: r[1].lower()
                for r in con.execute(f"DESCRIBE {g.oracle}").fetchall()
            }
            compat = {
                "bigint": {"bigint"},
                "int": {"integer"},
                "double": {"double"},
                "float": {"float"},
                "string": {"varchar"},
                "boolean": {"boolean"},
            }
            for col, stype in sdf.dtypes:
                dtype = duck_types.get(col, "?")
                expected = compat.get(stype)
                if expected is not None and dtype not in expected:
                    problems.append(f"dtype drift {col}: spark={stype} duck={dtype}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            s = rows_to_canon(spark_cols, spark_rows)
            d = rows_to_canon(duck_cols, duck_rows)
            if s != d:
                diffs = [(a, b) for a, b in zip(s, d) if a != b][: args.show_diff]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed of {len(names)}")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
