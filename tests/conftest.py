from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def _ensure_protobuf() -> None:
    """Make ``google.protobuf`` importable from the container's own Google
    Cloud SDK bundle when no protobuf wheel is installed (E8: Spark 4's
    ``transformWithStateInPandas`` speaks protobuf to its state server).

    The mechanism lives in ``tests/_pb_shim/sitecustomize.py`` (see its
    docstring for the two gaps it closes).  Here we (a) run it for the
    driver process, and (b) export the shim dir on ``PYTHONPATH`` so
    Spark's Python *worker* processes — which never import conftest — pick
    it up via the interpreter's ``sitecustomize`` hook.  Must run before
    any SparkSession exists so the JVM inherits the env var.
    """
    import os

    shim_dir = str(Path(__file__).resolve().parent / "_pb_shim")
    sys.path.append(shim_dir)
    import sitecustomize  # noqa: F401  (runs _install for this process)

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return  # no bundle available: the TWS test keeps its importorskip
    os.environ["PYTHONPATH"] = (
        os.environ["PYTHONPATH"] + os.pathsep + shim_dir
        if os.environ.get("PYTHONPATH")
        else shim_dir
    )


_ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from pulsar_message_filter_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
