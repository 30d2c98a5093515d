"""Property-based checks (hypothesis) for the conversion layer: any
payload either lands intact in the good branch or in the bad branch with
a reason — rows are never dropped silently and never duplicated (the
invariant behind the reference's salvage semantics)."""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.schema.convert import ERROR_COL, convert_and_validate, split_valid

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

payloads = st.fixed_dictionaries(
    {
        "id": st.one_of(st.none(), st.text(min_size=0, max_size=20)),
        "n": st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
        "x": st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        "tags": st.one_of(st.none(), st.lists(st.text(max_size=5), max_size=3)),
    }
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(payloads, min_size=1, max_size=8))
def test_split_partitions_every_row_exactly_once(spark, batch):
    rows = [("t", 0, i, f"k{i}", json.dumps(p)) for i, p in enumerate(batch)]
    df = spark.createDataFrame(rows, "topic string, partition int, offset long, key string, value string")
    parse_schema = T.StructType(list(SCHEMA.fields) + [T.StructField("_corrupt", T.StringType(), True)])
    parsed = df.withColumn("v", F.from_json("value", parse_schema, {"columnNameOfCorruptRecord": "_corrupt"}))
    good, bad = split_valid(convert_and_validate(parsed, "v", SCHEMA, corrupt_field="_corrupt"))
    good_offsets = [r.offset for r in good.select("offset").collect()]
    bad_rows = bad.select("offset", ERROR_COL).collect()
    # partition: every offset exactly once across the two branches
    assert sorted(good_offsets + [r.offset for r in bad_rows]) == list(range(len(batch)))
    # soundness: good rows really satisfy the required-field rules
    expected_good = [i for i, p in enumerate(batch) if p["id"] is not None and p["n"] is not None]
    assert sorted(good_offsets) == expected_good
    # every bad row carries at least one reason
    assert all(len(r[ERROR_COL]) >= 1 for r in bad_rows)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=st.lists(payloads, min_size=1, max_size=5))
def test_good_rows_roundtrip_values(spark, batch):
    rows = [("t", 0, i, f"k{i}", json.dumps(p)) for i, p in enumerate(batch)]
    df = spark.createDataFrame(rows, "topic string, partition int, offset long, key string, value string")
    parse_schema = T.StructType(list(SCHEMA.fields) + [T.StructField("_corrupt", T.StringType(), True)])
    parsed = df.withColumn("v", F.from_json("value", parse_schema, {"columnNameOfCorruptRecord": "_corrupt"}))
    good, _ = split_valid(convert_and_validate(parsed, "v", SCHEMA, corrupt_field="_corrupt"))
    for r in good.select("offset", "v.id", "v.n", "v.x").collect():
        src = batch[r.offset]
        assert r.id == src["id"] and r.n == src["n"]
        if src["x"] is None:
            assert r.x is None
        else:
            assert math.isclose(r.x, src["x"], rel_tol=1e-6, abs_tol=1e-30)
