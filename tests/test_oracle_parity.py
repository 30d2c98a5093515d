"""Local mirror of the driver's correctness gate: every registered query
with an oracle is run on Spark AND DuckDB over the same parquet files and
compared (row count, column names, order-insensitive values).
"""

from __future__ import annotations

import math

import pytest

from kafka_connect_bigquery_storage_write_spark.queries import ORACLE, QUERIES, load_all

load_all()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate float32/float64 representation differences at the edge
        return round(v, 6)
    return v


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_normalize(row[i]) for i in order) for row in rows]
    return sorted(normed, key=lambda t: [(x is None, str(x)) for x in t])


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

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
def test_query_without_oracle_runs(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
