"""Golden-output tests for the conversion/validation layer (SURVEY.md §5 tier 1).

Mirrors the reference's RecordConverterTest (nested struct + int64 +
double + bool + array + map + inner struct + optional null array ->
golden JSON; negative cases from FIXTURES.md A3).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.schema import (
    ERROR_COL,
    UnsupportedDataTypeError,
    convert_and_validate,
    project_to_sink_schema,
    split_valid,
    validate_sink_schema,
)

NESTED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("int_value", T.LongType(), False),
        T.StructField("double_value", T.DoubleType(), False),
        T.StructField("boolean_value", T.BooleanType(), False),
        T.StructField("array_value", T.ArrayType(T.StringType()), False),
        T.StructField("map_value", T.MapType(T.StringType(), T.IntegerType()), False),
        T.StructField(
            "struct_value",
            T.StructType(
                [
                    T.StructField("inner1", T.StringType(), False),
                    T.StructField("inner2", T.BooleanType(), False),
                ]
            ),
            False,
        ),
        T.StructField("optional_array_value", T.ArrayType(T.StringType()), True),
    ]
)

GOLDEN_ROW = {
    "id": "id",
    "int_value": 12345,
    "double_value": 0.123,
    "boolean_value": True,
    "array_value": ["a", "b", "c"],
    "map_value": {"k1": 1, "k2": 2, "k3": 3},
    "struct_value": {"inner1": "inner_value", "inner2": False},
    "optional_array_value": None,
}


def _envelope(spark, payloads: list[dict]):
    rows = [("t", 0, i, f"key-{i}", json.dumps(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "topic string, partition int, offset long, key string, value string")


def test_golden_conversion(spark):
    df = _envelope(spark, [GOLDEN_ROW])
    parsed = df.withColumn("v", F.from_json("value", NESTED_SCHEMA))
    validated = convert_and_validate(parsed, "v", NESTED_SCHEMA)
    good, bad = split_valid(validated)
    assert bad.count() == 0
    out = json.loads(good.select(F.to_json("v").alias("j")).collect()[0].j)
    assert out["id"] == "id"
    assert out["int_value"] == 12345
    assert out["double_value"] == 0.123
    assert out["boolean_value"] is True
    assert out["array_value"] == ["a", "b", "c"]
    assert out["map_value"] == {"k1": 1, "k2": 2, "k3": 3}
    assert out["struct_value"] == {"inner1": "inner_value", "inner2": False}
    assert "optional_array_value" not in out or out["optional_array_value"] is None


def test_required_null_rejected(spark):
    bad_row = dict(GOLDEN_ROW, int_value=None)
    df = _envelope(spark, [GOLDEN_ROW, bad_row])
    parsed = df.withColumn("v", F.from_json("value", NESTED_SCHEMA))
    good, bad = split_valid(convert_and_validate(parsed, "v", NESTED_SCHEMA))
    assert good.count() == 1
    errs = bad.select(ERROR_COL).collect()
    assert len(errs) == 1
    assert "Not optional field has null value: int_value" in errs[0][0]


def test_nested_required_null_rejected(spark):
    bad_row = dict(GOLDEN_ROW, struct_value={"inner1": None, "inner2": True})
    df = _envelope(spark, [bad_row])
    parsed = df.withColumn("v", F.from_json("value", NESTED_SCHEMA))
    good, bad = split_valid(convert_and_validate(parsed, "v", NESTED_SCHEMA))
    assert good.count() == 0
    assert "struct_value.inner1" in bad.select(ERROR_COL).collect()[0][0][0]


def test_non_struct_value_dropped(spark):
    """Non-struct payloads (bare string) drop with a warning-style reason (R4)."""
    rows = [("t", 0, 0, "k", "not json at all {{{")]
    df = spark.createDataFrame(rows, "topic string, partition int, offset long, key string, value string")
    parse_schema = T.StructType(list(NESTED_SCHEMA.fields) + [T.StructField("_corrupt", T.StringType(), True)])
    parsed = df.withColumn(
        "v", F.from_json("value", parse_schema, {"columnNameOfCorruptRecord": "_corrupt"})
    )
    good, bad = split_valid(convert_and_validate(parsed, "v", NESTED_SCHEMA, corrupt_field="_corrupt"))
    assert good.count() == 0
    assert "not struct record" in bad.select(ERROR_COL).collect()[0][0][0]


def test_bytes_rejected():
    schema = T.StructType([T.StructField("b", T.BinaryType(), True)])
    with pytest.raises(UnsupportedDataTypeError, match="Bytes field is unsupported"):
        validate_sink_schema(schema)
    # extension opt-in for multimodal columns
    validate_sink_schema(schema, allow_binary=True)


def test_non_string_map_key_rejected():
    schema = T.StructType([T.StructField("m", T.MapType(T.IntegerType(), T.StringType()), True)])
    with pytest.raises(UnsupportedDataTypeError, match="non-string key"):
        validate_sink_schema(schema)


def test_unknown_type_rejected():
    schema = T.StructType([T.StructField("d", T.DecimalType(10, 2), True)])
    with pytest.raises(UnsupportedDataTypeError, match="Unknown data type"):
        validate_sink_schema(schema)


def test_ignore_unknown_fields_projection(spark):
    """Source fields not in the sink schema are dropped; missing sink fields null (R5)."""
    src_schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("extra", T.StringType(), True),
        ]
    )
    sink_schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("int_value", T.LongType(), True),
        ]
    )
    df = _envelope(spark, [{"id": "a", "extra": "drop-me"}])
    parsed = df.withColumn("v", F.from_json("value", src_schema))
    out = project_to_sink_schema(parsed, "v", sink_schema)
    assert out.columns == ["id", "int_value"]
    row = out.collect()[0]
    assert row.id == "a" and row.int_value is None
