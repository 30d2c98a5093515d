"""Avro envelope decoding for the ingest pipeline (SURVEY.md §1.3).

The reference's schema'd record path is driven by the record's attached
schema (RecordConverter.java:21-22, nested schemas from field.schema());
real Kafka deployments overwhelmingly carry that schema as Avro via the
Confluent Schema Registry wire format (magic 0x00 + 4-byte schema id +
Avro binary body). This module gives the pipeline that input surface.

Spark's own ``from_avro`` lives in the external spark-avro jar, which is
not present in this environment — on a cluster that ships it, swap
``avro_decode_to_json`` for ``from_avro(substring(value, 6, ...))`` and
keep everything downstream identical. Here the decoder is pure Python
implementing the Avro 1.11 binary encoding for exactly the reference's
type lattice (RecordConverter.java:33-83): record, map (string keys by
Avro's own spec), array, int/long (zigzag varint), float/double (LE
IEEE), boolean, string, and unions. ``bytes``/``fixed``/``enum`` are
rejected at schema-parse time, mirroring the reference's
"Bytes field is unsupported" / "Unknown data type" throws
(RecordConverter.java:79-82).

The decoder runs inside mapInPandas over Arrow batches — Python is
unavoidable for byte-level parsing without the jar, but it stays at the
deserialization boundary: each value decodes once into a canonical JSON
string and every downstream step (permissive from_json, validation
lattice, projection, sink) is the same JVM path the JSON envelope uses.
A payload that fails to decode yields a deliberately-invalid JSON marker
string, so the permissive parse dead-letters it with full lineage —
decode failures flow through the same salvage path as corrupt JSON
(BigqueryStreamWriter.java:244-269 semantics).
"""

from __future__ import annotations

import io
import json
import struct as _struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODE_ERROR_PREFIX = "!AVRO_DECODE_ERROR "  # invalid JSON on purpose


class AvroSchemaError(ValueError):
    """Schema uses a type outside the supported lattice."""


class AvroDecodeError(ValueError):
    """Payload does not conform to the schema / wire format."""


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string"}
_REJECTED = {"bytes", "fixed", "enum"}


def parse_schema(schema: str | dict | list) -> dict | str | list:
    """Normalize + validate an Avro schema (JSON string or parsed form).

    Returns the parsed schema tree; raises AvroSchemaError on any type
    outside the reference lattice.
    """
    if isinstance(schema, str):
        s = schema.strip()
        schema = json.loads(s) if s.startswith(("{", "[", '"')) else s
    _validate(schema)
    return schema


def _validate(node) -> None:
    if isinstance(node, str):
        if node in _REJECTED:
            raise AvroSchemaError(f"{node} field is unsupported")
        if node not in _PRIMITIVES:
            raise AvroSchemaError(f"Unknown data type: {node}")
        return
    if isinstance(node, list):  # union
        for branch in node:
            _validate(branch)
        return
    if isinstance(node, dict):
        t = node.get("type")
        if t == "record":
            for f in node["fields"]:
                _validate(f["type"])
        elif t == "array":
            _validate(node["items"])
        elif t == "map":
            _validate(node["values"])  # Avro map keys are always strings
        else:
            _validate(t)
        return
    raise AvroSchemaError(f"Unknown data type: {node!r}")


# -- binary primitives ------------------------------------------------------
def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroDecodeError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            raise AvroDecodeError("varint too long")
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_varint(out: bytearray, value: int) -> None:
    acc = (value << 1) ^ (value >> 63)  # zigzag, arbitrary-precision safe
    acc &= (1 << 64) - 1
    while True:
        byte = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    b = buf.read(n)
    if len(b) != n:
        raise AvroDecodeError(f"truncated: wanted {n} bytes, got {len(b)}")
    return b


# -- decoder ----------------------------------------------------------------
def _decode(buf: io.BytesIO, schema) -> object:
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return _read_exact(buf, 1)[0] != 0
        if schema in ("int", "long"):
            return _read_varint(buf)
        if schema == "float":
            return _struct.unpack("<f", _read_exact(buf, 4))[0]
        if schema == "double":
            return _struct.unpack("<d", _read_exact(buf, 8))[0]
        if schema == "string":
            n = _read_varint(buf)
            if n < 0:
                raise AvroDecodeError("negative string length")
            return _read_exact(buf, n).decode("utf-8")
        raise AvroSchemaError(f"Unknown data type: {schema}")
    if isinstance(schema, list):  # union: varint branch index then value
        idx = _read_varint(buf)
        if not 0 <= idx < len(schema):
            raise AvroDecodeError(f"union index {idx} out of range")
        return _decode(buf, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = _read_varint(buf)
            if count == 0:
                return out
            if count < 0:  # block with byte-size prefix
                count = -count
                _read_varint(buf)
            for _ in range(count):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            count = _read_varint(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                _read_varint(buf)
            for _ in range(count):
                k = _decode(buf, "string")
                out[k] = _decode(buf, schema["values"])
    return _decode(buf, t)


def decode(payload: bytes, schema) -> object:
    """Decode one Avro binary value; raises AvroDecodeError on malformed
    input (including trailing garbage)."""
    buf = io.BytesIO(payload)
    value = _decode(buf, schema)
    if buf.read(1):
        raise AvroDecodeError("trailing bytes after value")
    return value


# -- encoder (tests / fixture generation / q72 roundtrip) -------------------
def _encode(out: bytearray, value, schema) -> None:
    if isinstance(schema, str):
        if schema == "null":
            if value is not None:
                raise AvroDecodeError("non-null for null type")
            return
        if schema == "boolean":
            out.append(1 if value else 0)
        elif schema in ("int", "long"):
            _write_varint(out, int(value))
        elif schema == "float":
            out.extend(_struct.pack("<f", float(value)))
        elif schema == "double":
            out.extend(_struct.pack("<d", float(value)))
        elif schema == "string":
            b = str(value).encode("utf-8")
            _write_varint(out, len(b))
            out.extend(b)
        else:
            raise AvroSchemaError(f"Unknown data type: {schema}")
        return
    if isinstance(schema, list):
        # first matching branch: None -> null branch, else first non-null
        for i, branch in enumerate(schema):
            if (value is None) == (branch == "null"):
                _write_varint(out, i)
                _encode(out, value, branch)
                return
        raise AvroDecodeError(f"no union branch for {value!r}")
    t = schema["type"]
    if t == "record":
        # .get: JSON producers (incl. Spark's to_json) omit null fields
        for f in schema["fields"]:
            _encode(out, value.get(f["name"]), f["type"])
    elif t == "array":
        if value:
            _write_varint(out, len(value))
            for v in value:
                _encode(out, v, schema["items"])
        _write_varint(out, 0)
    elif t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                _encode(out, k, "string")
                _encode(out, v, schema["values"])
        _write_varint(out, 0)
    else:
        _encode(out, value, t)


def encode(value, schema) -> bytes:
    out = bytearray()
    _encode(out, value, schema)
    return bytes(out)


# -- Confluent Schema Registry wire format ----------------------------------
def confluent_frame(payload: bytes, schema_id: int = 1) -> bytes:
    return b"\x00" + _struct.pack(">I", schema_id) + payload


def confluent_unframe(buf: bytes) -> tuple[int, bytes]:
    if len(buf) < 5 or buf[0] != 0:
        raise AvroDecodeError("not Confluent-framed (magic byte != 0)")
    return _struct.unpack(">I", buf[1:5])[0], buf[5:]


# -- Avro schema -> Spark schema --------------------------------------------
def avro_schema_to_spark(schema) -> T.DataType:
    """Map the supported lattice onto Spark types; [null, X] unions become
    nullable X (multi-type unions are outside the reference lattice)."""
    schema = parse_schema(schema)
    return _to_spark(schema)


_SPARK_PRIM = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "null": T.NullType(),
}


def _to_spark(node) -> T.DataType:
    if isinstance(node, str):
        return _SPARK_PRIM[node]
    if isinstance(node, list):
        branches = [b for b in node if b != "null"]
        if len(branches) != 1:
            raise AvroSchemaError("only [null, T] unions are supported")
        return _to_spark(branches[0])
    t = node["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    _to_spark(f["type"]),
                    nullable=isinstance(f["type"], list) and "null" in f["type"],
                )
                for f in node["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(_to_spark(node["items"]))
    if t == "map":
        return T.MapType(T.StringType(), _to_spark(node["values"]))
    return _to_spark(t)


# -- Spark integration ------------------------------------------------------
def avro_decode_to_json(
    df: DataFrame,
    value_col: str,
    schema: str | dict,
    confluent: bool = True,
) -> DataFrame:
    """Replace a binary Avro ``value_col`` with its canonical JSON string.

    mapInPandas over Arrow batches; all other columns pass through. The
    output feeds the exact same permissive from_json + validation path as
    the JSON envelope, so Avro and JSON sources share one conversion
    contract. Decode failures become DECODE_ERROR_PREFIX marker strings
    (invalid JSON by construction) and dead-letter with lineage.
    """
    from collections.abc import Iterator

    import pandas as pd

    parsed_schema = parse_schema(schema)
    out_fields = [
        T.StructField(f.name, T.StringType() if f.name == value_col else f.dataType, True) for f in df.schema.fields
    ]
    out_schema = T.StructType(out_fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw) -> str | None:
            if raw is None:
                return None
            try:
                payload = bytes(raw)
                if confluent:
                    _, payload = confluent_unframe(payload)
                return json.dumps(decode(payload, parsed_schema), ensure_ascii=False)
            except Exception as exc:  # noqa: BLE001 - any failure dead-letters
                return f"{DECODE_ERROR_PREFIX}{exc}"

        for pdf in batches:
            pdf = pdf.copy()
            pdf[value_col] = pdf[value_col].map(one)
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def avro_encode_from_json(
    df: DataFrame,
    value_col: str,
    schema: str | dict,
    confluent: bool = True,
    schema_id: int = 1,
) -> DataFrame:
    """Inverse of avro_decode_to_json (fixture/test producer): a JSON
    string ``value_col`` becomes Confluent-framed Avro binary."""
    from collections.abc import Iterator

    import pandas as pd

    parsed_schema = parse_schema(schema)
    out_fields = [
        T.StructField(f.name, T.BinaryType() if f.name == value_col else f.dataType, True) for f in df.schema.fields
    ]
    out_schema = T.StructType(out_fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw) -> bytes | None:
            if raw is None:
                return None
            body = encode(json.loads(raw), parsed_schema)
            return confluent_frame(body, schema_id) if confluent else body

        for pdf in batches:
            pdf = pdf.copy()
            pdf[value_col] = pdf[value_col].map(one)
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)
