"""Local mirror of the driver's correctness gate: every registered query
with an oracle is run on Spark AND DuckDB over the same parquet files and
compared (row count, column names, order-insensitive values).
"""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_storage_write_spark.harness_canon import rowset as _rowset
from kafka_connect_bigquery_storage_write_spark.queries import ORACLE, QUERIES, load_all

load_all()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(query_surface, duck, name):
    # one shared build+collect per query (conftest.query_surface): this
    # test, the schema lint and the window lint were three full registry
    # sweeps before round 15
    q = query_surface[name]
    if q["err"] is not None:
        raise q["err"]
    spark_rows, spark_cols = q["rows"], q["cols"]

    rel = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s = _rowset([tuple(r) for r in spark_rows], spark_cols)
    d = _rowset(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_without_oracle_runs(query_surface, name):
    q = query_surface[name]
    if q["err"] is not None:
        raise q["err"]
    assert len(q["rows"]) >= 0


def test_canonicalizer_rejects_list_cells():
    """Driver parity: the official canonicalizer's pandas sort raises on
    list-typed cells (how q93/q96 shipped red in round 4). The local
    replica must fail the same way so sim-green predicts driver-green."""
    with pytest.raises(TypeError):
        _rowset([(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["id", "vec"])


def test_no_registered_query_emits_complex_columns(query_surface):
    """Every registered query's result schema must be scalar-only: the
    official driver cannot canonicalize array/map/struct cells, so a
    complex-typed output column is a registry bug by construction.
    (Reads the shared per-query build — was its own full registry sweep.)"""
    import pyspark.sql.types as T

    offenders = {}
    for name, q in query_surface.items():
        if q["err"] is not None:
            continue  # the query's own parity test raises it loudly
        bad = [f.name for f in q["schema"].fields if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed output columns: {offenders}"
