from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


#: Sentinel distinguishing "PYTHONPATH was unset" from "we never mutated it".
_PYTHONPATH_UNTOUCHED = object()
_prev_pythonpath: object = _PYTHONPATH_UNTOUCHED


def _ensure_protobuf() -> None:
    """Make ``google.protobuf`` importable from the container's own Google
    Cloud SDK bundle when no protobuf wheel is installed (E8: Spark 4's
    ``transformWithStateInPandas`` speaks protobuf to its state server).

    The mechanism lives in ``tests/_pb_shim/sitecustomize.py`` (see its
    docstring for the two gaps it closes).  Here we (a) run it for the
    driver process, and (b) export the shim dir on ``PYTHONPATH`` so
    Spark's Python *worker* processes — which never import conftest — pick
    it up via the interpreter's ``sitecustomize`` hook.  Must run before
    any SparkSession exists so the JVM inherits the env var; the
    ``_jvm_under_pb_shim`` autouse fixture restores the process env right
    after the JVM launches, so the shim is scoped to the JVM's process
    tree (Spark workers) rather than every subprocess the suite spawns
    (ADVICE r06).
    """
    global _prev_pythonpath
    import os

    shim_dir = str(Path(__file__).resolve().parent / "_pb_shim")
    sys.path.append(shim_dir)
    import sitecustomize  # noqa: F401  (runs _install for this process)

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return  # no bundle available: the TWS test keeps its importorskip
    _prev_pythonpath = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = (
        _prev_pythonpath + os.pathsep + shim_dir if _prev_pythonpath else shim_dir
    )


_ensure_protobuf()


@pytest.fixture(scope="session", autouse=True)
def _jvm_under_pb_shim():
    """Launch the JVM while the shim dir is on ``PYTHONPATH``, then restore.

    The JVM snapshots its environment at launch and hands it to every
    Python worker it forks, so exporting the var only for this window
    scopes the protobuf shim to Spark workers — later subprocesses spawned
    by tests (or by pytest plugins) see a clean ``PYTHONPATH`` again.
    Autouse+session-scoped so it runs before any test body, including the
    ones that build their own session via ``getOrCreate``.
    """
    import os

    from pulsar_message_filter_spark.session import get_spark

    get_spark("pmf-tests", shuffle_partitions=8)
    if _prev_pythonpath is not _PYTHONPATH_UNTOUCHED:
        if _prev_pythonpath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = _prev_pythonpath
    yield


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
