from __future__ import annotations

import glob
import os

import duckdb
import pytest

from kafka_connect_bigquery_storage_write_spark.session import get_spark

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


# Test-session core count (round 15, measured): at sf0.001 fixture scale
# the suite is per-task/per-job OVERHEAD-bound, not compute-bound —
# local[2] ran every probed file faster than local[8] (test_mor_upsert
# 143s->77s, stateful+cc 106s->99s, parity heavies 243s->202s). This is
# the TEST harness only; bench.py keeps $SPARK_GRAFT_CPUS and the engine
# derives nothing from it. Override with SPARK_GRAFT_TEST_CPUS.
TEST_CPUS = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "2"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="kafka_connect_bigquery_storage_write_spark-tests",
        cpus=TEST_CPUS,
        shuffle_partitions=TEST_CPUS,
    )
    yield s


def _fmt_plan(df) -> str:
    """Formatted physical plan; pipeline queries stash their pre-checkpoint
    explain (the _finalize seam) — lint that when present."""
    import contextlib
    import io

    stashed = getattr(df, "_kafka_connect_bigquery_storage_write_spark_plan", None)
    if stashed is not None:
        return stashed
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="session")
def query_surface(spark):
    """ONE build + plan-capture + collect per registered query, shared by
    the oracle-parity tests, the complex-column lint and the global-window
    lint (round 15: those were THREE full registry sweeps — each builds
    every query, running the pipeline queries' sink work, ~190s per sweep
    at the r14 session). Per-query errors are stored, not raised, so one
    broken query fails only its own consumers."""
    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all

    load_all()
    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, SF_TEST_DIR)
            out[name] = {
                "cols": df.columns,
                "schema": df.schema,
                "plan": _fmt_plan(df),
                "rows": df.collect(),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001 — surfaced by each consumer
            out[name] = {"cols": None, "schema": None, "plan": None, "rows": None, "err": e}
    return out


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for path in glob.glob(os.path.join(SF_TEST_DIR, "*.parquet")):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR
