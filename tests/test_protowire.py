"""Protobuf wire codec: spec pins, property round-trips, framing.

Known-byte pins come from the public encoding docs
(developers.google.com/protocol-buffers/docs/encoding); the codec is the
payload layer of the Storage Write parity surface
(reference BigqueryStreamWriter.java:281)."""

from __future__ import annotations

import decimal
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.sinks import protowire as pw


def _desc(*fields):
    return pw.ProtoMessage("M", list(fields))


# ---------------------------------------------------------------------------
# spec pins
# ---------------------------------------------------------------------------

def test_varint_150_docs_example():
    # The canonical docs example: field 1, varint 150 -> 08 96 01
    d = _desc(pw.ProtoField("a", 1, pw.INT64))
    assert pw.encode_message({"a": 150}, d) == b"\x08\x96\x01"


def test_string_testing_docs_example():
    # field 2, string "testing" -> 12 07 74 65 73 74 69 6e 67
    d = _desc(pw.ProtoField("b", 2, pw.STRING))
    assert pw.encode_message({"b": "testing"}, d) == b"\x12\x07testing"


def test_negative_int64_is_ten_bytes():
    d = _desc(pw.ProtoField("a", 1, pw.INT64))
    enc = pw.encode_message({"a": -2}, d)
    # tag + 10-byte two's-complement varint
    assert enc == b"\x08" + bytes([0xFE] + [0xFF] * 8 + [0x01])
    assert pw.decode_message(enc, d)["a"] == -2


def test_double_fixed64_little_endian():
    d = _desc(pw.ProtoField("x", 1, pw.DOUBLE))
    enc = pw.encode_message({"x": 1.0}, d)
    assert enc == b"\x09" + b"\x00\x00\x00\x00\x00\x00\xf0\x3f"


def test_none_omitted_zero_encoded():
    d = _desc(pw.ProtoField("a", 1, pw.INT64), pw.ProtoField("b", 2, pw.STRING))
    assert pw.encode_message({"a": None, "b": None}, d) == b""
    enc = pw.encode_message({"a": 0, "b": ""}, d)
    assert enc == b"\x08\x00\x12\x00"  # proto2 explicit presence
    dec = pw.decode_message(enc, d)
    assert dec == {"a": 0, "b": ""}


def test_field_number_order_is_canonical():
    d = _desc(pw.ProtoField("z", 2, pw.INT64), pw.ProtoField("a", 1, pw.INT64))
    assert pw.encode_message({"z": 1, "a": 2}, d) == b"\x08\x02\x10\x01"


# ---------------------------------------------------------------------------
# decode robustness
# ---------------------------------------------------------------------------

def test_unknown_fields_skipped_all_wire_types():
    d = _desc(pw.ProtoField("a", 1, pw.INT64))
    extra = (
        b"\x10\x05"                      # field 2 varint
        + b"\x19" + b"\x00" * 8          # field 3 fixed64
        + b"\x22\x03abc"                 # field 4 len-delimited
        + b"\x2d" + b"\x00" * 4          # field 5 fixed32
    )
    enc = pw.encode_message({"a": 7}, d) + extra
    assert pw.decode_message(enc, d)["a"] == 7


def test_packed_repeated_accepted():
    d = _desc(pw.ProtoField("v", 1, pw.INT64, repeated=True))
    unpacked = pw.encode_message({"v": [3, 270, 86942]}, d)
    assert pw.decode_message(unpacked, d)["v"] == [3, 270, 86942]
    # docs example packed body: 08 96 01 for [150]? packed uses len-delimited:
    packed = b"\x0a\x06\x03\x8e\x02\x9e\xa7\x05"
    assert pw.decode_message(packed, d)["v"] == [3, 270, 86942]


def test_truncated_inputs_raise():
    d = _desc(pw.ProtoField("b", 1, pw.STRING))
    with pytest.raises(ValueError):
        pw.decode_message(b"\x0a\x05ab", d)
    with pytest.raises(ValueError):
        pw.decode_uvarint(b"\x80", 0)


# ---------------------------------------------------------------------------
# NUMERIC
# ---------------------------------------------------------------------------

def test_numeric_one_is_1e9_le():
    assert pw.encode_numeric(decimal.Decimal("1")) == b"\x00\xca\x9a\x3b"


@pytest.mark.parametrize(
    "s", ["0", "1", "-1", "123.456789", "-0.000000001", "99999999999.999999999"]
)
def test_numeric_roundtrip(s):
    v = decimal.Decimal(s)
    assert pw.decode_numeric(pw.encode_numeric(v)) == v


# ---------------------------------------------------------------------------
# property round-trips
# ---------------------------------------------------------------------------

_scalars = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.booleans(),
    st.floats(allow_nan=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)


@settings(max_examples=200, deadline=None)
@given(
    a=st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
    b=st.none() | st.text(max_size=60),
    c=st.none() | st.floats(allow_nan=True, width=64),
    d=st.none() | st.binary(max_size=60),
    e=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8),
)
def test_roundtrip_flat(a, b, c, d, e):
    desc = _desc(
        pw.ProtoField("a", 1, pw.INT64),
        pw.ProtoField("b", 2, pw.STRING),
        pw.ProtoField("c", 3, pw.DOUBLE),
        pw.ProtoField("d", 4, pw.BYTES),
        pw.ProtoField("e", 5, pw.INT64, repeated=True),
    )
    vals = {"a": a, "b": b, "c": c, "d": d, "e": e}
    dec = pw.decode_message(pw.encode_message(vals, desc), desc)
    for k in "abd":
        assert dec[k] == vals[k]
    assert dec["e"] == e
    if c is None:
        assert dec["c"] is None
    elif math.isnan(c):
        assert math.isnan(dec["c"])
    else:
        assert dec["c"] == c


@settings(max_examples=100, deadline=None)
@given(
    inner=st.lists(
        st.tuples(st.text(max_size=10), st.integers(min_value=0, max_value=10**12)),
        max_size=5,
    ),
    name=st.text(max_size=20),
)
def test_roundtrip_nested_and_map(inner, name):
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField(
                "sub",
                T.StructType(
                    [
                        T.StructField("k", T.LongType()),
                        T.StructField("tags", T.ArrayType(T.StringType())),
                    ]
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    desc = pw.descriptor_for_spark_schema(schema)
    vals = {
        "name": name,
        "sub": {"k": 42, "tags": ["x", "", "yz"]},
        "m": [{"key": k, "value": v} for k, v in inner],
    }
    dec = pw.decode_message(pw.encode_message(vals, desc), desc)
    assert dec["name"] == name
    assert dec["sub"] == {"k": 42, "tags": ["x", "", "yz"]}
    assert dec["m"] == [{"key": k, "value": v} for k, v in inner]


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

def test_descriptor_numbers_follow_schema_order():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("price", T.DecimalType(18, 2)),
            T.StructField("flags", T.ArrayType(T.BooleanType())),
        ]
    )
    desc = pw.descriptor_for_spark_schema(schema)
    got = [(f.name, f.number, f.kind, f.repeated) for f in desc.fields]
    assert got == [
        ("id", 1, pw.INT64, False),
        ("ts", 2, pw.INT64, False),
        ("price", 3, pw.BYTES, False),
        ("flags", 4, pw.BOOL, True),
    ]


def test_decimal_value_rides_as_numeric_bytes():
    schema = T.StructType([T.StructField("price", T.DecimalType(18, 2))])
    desc = pw.descriptor_for_spark_schema(schema)
    enc = pw.encode_message({"price": decimal.Decimal("12.34")}, desc)
    dec = pw.decode_message(enc, desc)
    assert pw.decode_numeric(dec["price"]) == decimal.Decimal("12.34")


# ---------------------------------------------------------------------------
# AppendRows framing
# ---------------------------------------------------------------------------

def test_append_rows_request_roundtrip():
    desc = _desc(pw.ProtoField("a", 1, pw.INT64))
    rows = [pw.encode_message({"a": i}, desc) for i in range(5)]
    frame = pw.append_rows_request(
        "projects/p/datasets/d/tables/t/streams/s",
        rows,
        offset=1234,
        writer_schema=desc,
    )
    parsed = pw.parse_append_rows_request(frame)
    assert parsed["write_stream"].endswith("/streams/s")
    assert parsed["offset"] == 1234
    assert parsed["rows"] == rows
    assert all(pw.decode_message(r, desc)["a"] == i for i, r in enumerate(rows))


def test_append_rows_offset_absent_means_default_stream():
    frame = pw.append_rows_request("s", [b"\x08\x01"])
    parsed = pw.parse_append_rows_request(frame)
    assert parsed["offset"] is None
    assert parsed["rows"] == [b"\x08\x01"]


def test_descriptor_proto_emits_fields_and_nested():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sub", T.StructType([T.StructField("x", T.StringType())])),
        ]
    )
    desc = pw.descriptor_for_spark_schema(schema)
    dp = pw.descriptor_proto(desc)
    # reparse with the generic decoder shaped as DescriptorProto
    fdp = pw.ProtoMessage(
        "FieldDescriptorProto",
        [
            pw.ProtoField("name", 1, pw.STRING),
            pw.ProtoField("number", 3, pw.INT64),
            pw.ProtoField("label", 4, pw.INT64),
            pw.ProtoField("type", 5, pw.INT64),
            pw.ProtoField("type_name", 6, pw.STRING),
        ],
    )
    dproto = pw.ProtoMessage(
        "DescriptorProto",
        [
            pw.ProtoField("name", 1, pw.STRING),
            pw.ProtoField("field", 2, pw.MESSAGE, repeated=True, message=fdp),
            pw.ProtoField("nested_type", 3, pw.BYTES, repeated=True),
        ],
    )
    parsed = pw.decode_message(dp, dproto)
    assert parsed["name"] == "Row"
    assert [f["name"] for f in parsed["field"]] == ["id", "sub"]
    assert [f["number"] for f in parsed["field"]] == [1, 2]
    assert parsed["field"][0]["type"] == 3   # TYPE_INT64
    assert parsed["field"][1]["type"] == 11  # TYPE_MESSAGE
    assert parsed["field"][1]["type_name"] == "Row_sub"
    assert len(parsed["nested_type"]) == 1


# -- AppendRowsResponse (round 12: the read half of the protocol) ------------


def test_append_rows_response_roundtrip():
    """Every field of the response frame survives encode -> parse:
    Int64Value offset (0 distinguishable from unset), repeated RowError
    triples in order, write_stream."""
    f = pw.append_rows_response(
        offset=0,
        row_errors=[(2, pw.ROW_ERROR_FIELDS, "bad"), (5, pw.ROW_ERROR_FIELDS, "worse")],
        write_stream="projects/p/streams/s",
    )
    p = pw.parse_append_rows_response(f)
    assert p["offset"] == 0 and p["status"] is None
    assert [(e["index"], e["code"], e["message"]) for e in p["row_errors"]] == [
        (2, 1, "bad"), (5, 1, "worse"),
    ]
    assert p["write_stream"] == "projects/p/streams/s"
    # unset offset parses as None (oneof not taken)
    assert pw.parse_append_rows_response(pw.append_rows_response())["offset"] is None


def test_append_rows_response_status_roundtrip():
    p = pw.parse_append_rows_response(
        pw.append_rows_response(status=(pw.GRPC_ALREADY_EXISTS, "offset already exists"))
    )
    assert p["status"] == {"code": 6, "message": "offset already exists"}


def test_classification_matches_reference_truth_table():
    """classify_append_response mirrors AppendContext + the task routing
    (BigqueryStreamWriter.java:120-183, BigqueryStorageWriteSinkTask.java:
    214-241): retriable set verbatim, ALREADY_EXISTS precedence over the
    unretryable branch, row errors salvage instead of rewind."""
    def cls(**kw):
        return pw.classify_append_response(
            pw.parse_append_rows_response(pw.append_rows_response(**kw))
        )

    assert cls(offset=3)["action"] == "ok"
    for code in sorted(pw.RETRIABLE_ERROR_CODES):
        c = cls(status=(code, "x"))
        assert c["action"] == "retry" and c["retriable"] and c["corrupted_indexes"] == []
    ae = cls(status=(pw.GRPC_ALREADY_EXISTS, "x"))
    assert ae["action"] == "skip_success" and ae["already_exists"]
    oor = cls(status=(pw.GRPC_OUT_OF_RANGE, "x"))
    assert oor["action"] == "rewind" and oor["out_of_range"]
    inv = cls(status=(3, "invalid"))
    assert inv["action"] == "dlq_all_rewind" and inv["corrupted_indexes"] == "ALL"
    rows = cls(offset=7, row_errors=[(1, 1, "a"), (4, 1, "b")])
    assert rows["action"] == "dlq_rows" and rows["corrupted_indexes"] == [1, 4]
    assert rows["has_error"] and not rows["retriable"]
