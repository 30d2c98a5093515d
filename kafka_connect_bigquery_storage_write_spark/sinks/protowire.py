"""Protocol-buffers wire codec for the BigQuery Storage Write payload.

The reference connector appends rows over the Storage Write API: every
`StreamWriter.append` (reference `BigqueryStreamWriter.java:281`) ships an
`AppendRowsRequest` whose rows are **proto2 wire-format** messages encoded
against a descriptor derived from the table schema (the reference's
`JsonStreamWriter` does that conversion inside the Google client; the
schema→row mapping it feeds is `RecordConverter.java:15-79`).  This module
re-creates that payload layer from the PUBLIC specs alone:

* proto2 wire format — varint / fixed64 / length-delimited / fixed32,
  two's-complement 10-byte negative varints, unpacked repeated scalars
  (proto2 default), map fields as repeated ``{key=1, value=2}`` entries
  (developers.google.com/protocol-buffers/docs/encoding);
* the Storage Write framing — ``AppendRowsRequest{write_stream=1,
  offset=2 (Int64Value), proto_rows=4 ProtoData{writer_schema=1
  ProtoSchema{proto_descriptor=1 DescriptorProto}, rows=2
  ProtoRows{serialized_rows=1 repeated bytes}}}`` (googleapis
  ``google/cloud/bigquery/storage/v1/storage.proto``);
* BigQuery NUMERIC encoding — scale-9 unscaled value, little-endian
  two's complement (``BigDecimalByteStringEncoder`` semantics, public
  java-bigquerystorage).

Everything here is driver/executor-local pure Python: encoding runs inside
Arrow-batched kernels (see ``queries/pipelines.py:q179``), so rows never
leave the executor un-encoded.  On a real cluster with the spark-protobuf
jar, `F.to_protobuf(struct, messageName, descFilePath)` replaces the
per-row Python encode one-for-one — ``descriptor_file_set`` below emits
the descriptor bytes that path needs; this module remains the jar-less
spec-exact fallback and the decoder both paths share for verification.
"""

from __future__ import annotations

import decimal
import struct as _struct
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5

_U64 = 1 << 64
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def encode_uvarint(value: int) -> bytes:
    """Unsigned base-128 varint (7 bits per byte, MSB = continuation)."""
    if value < 0:
        raise ValueError("uvarint requires a non-negative value")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_varint64(value: int) -> bytes:
    """proto int64: negatives as two's-complement 64-bit (always 10 bytes)."""
    if not (_I64_MIN <= value <= _I64_MAX):
        raise ValueError(f"int64 out of range: {value}")
    return encode_uvarint(value & (_U64 - 1))


def decode_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _to_signed64(value: int) -> int:
    return value - _U64 if value >= (1 << 63) else value


def _tag(number: int, wire_type: int) -> bytes:
    return encode_uvarint((number << 3) | wire_type)


# ---------------------------------------------------------------------------
# descriptors
# ---------------------------------------------------------------------------

# scalar kinds (subset of FieldDescriptorProto.Type we emit)
INT64 = "int64"        # varint, two's complement
BOOL = "bool"          # varint 0/1
DOUBLE = "double"      # fixed64
FLOAT = "float"        # fixed32
STRING = "string"      # length-delimited UTF-8
BYTES = "bytes"        # length-delimited
MESSAGE = "message"    # length-delimited nested

# FieldDescriptorProto.Type enum values (public descriptor.proto)
_TYPE_ENUM = {DOUBLE: 1, FLOAT: 2, INT64: 3, BOOL: 8, STRING: 9, MESSAGE: 11, BYTES: 12}
_LABEL_OPTIONAL, _LABEL_REQUIRED, _LABEL_REPEATED = 1, 2, 3


@dataclass
class ProtoField:
    name: str
    number: int
    kind: str
    repeated: bool = False
    message: "ProtoMessage | None" = None  # set when kind == MESSAGE


@dataclass
class ProtoMessage:
    name: str
    fields: list[ProtoField] = field(default_factory=list)

    def by_number(self) -> dict[int, ProtoField]:
        return {f.number: f for f in self.fields}


def descriptor_for_spark_schema(schema: T.StructType, name: str = "Row") -> ProtoMessage:
    """Map a Spark schema to a proto2 message descriptor, numbering fields
    1..n in schema order — the same stable ordering the reference's table
    descriptor derives from the BigQuery schema."""
    fields: list[ProtoField] = []
    for i, f in enumerate(schema.fields, start=1):
        fields.append(_field_for(f.name, i, f.dataType, name))
    return ProtoMessage(name, fields)


def _field_for(fname: str, number: int, dt: T.DataType, parent: str) -> ProtoField:
    if isinstance(dt, T.ArrayType):
        inner = _field_for(fname, number, dt.elementType, parent)
        if inner.repeated:
            raise ValueError("nested repeated requires an intermediate message")
        inner.repeated = True
        return inner
    if isinstance(dt, T.MapType):
        entry = ProtoMessage(
            f"{parent}_{fname}_entry",
            [
                _field_for("key", 1, dt.keyType, parent),
                _field_for("value", 2, dt.valueType, parent),
            ],
        )
        return ProtoField(fname, number, MESSAGE, repeated=True, message=entry)
    if isinstance(dt, T.StructType):
        return ProtoField(
            fname, number, MESSAGE,
            message=descriptor_for_spark_schema(dt, f"{parent}_{fname}"),
        )
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return ProtoField(fname, number, INT64)
    if isinstance(dt, T.BooleanType):
        return ProtoField(fname, number, BOOL)
    if isinstance(dt, T.DoubleType):
        return ProtoField(fname, number, DOUBLE)
    if isinstance(dt, T.FloatType):
        return ProtoField(fname, number, FLOAT)
    if isinstance(dt, T.StringType):
        return ProtoField(fname, number, STRING)
    if isinstance(dt, T.BinaryType):
        return ProtoField(fname, number, BYTES)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # BigQuery TIMESTAMP rides the wire as int64 epoch micros.
        return ProtoField(fname, number, INT64)
    if isinstance(dt, T.DateType):
        return ProtoField(fname, number, INT64)  # epoch days
    if isinstance(dt, T.DecimalType):
        return ProtoField(fname, number, BYTES)  # NUMERIC scale-9 LE bytes
    raise ValueError(f"unsupported Spark type for proto wire: {dt}")


# ---------------------------------------------------------------------------
# NUMERIC (BigQuery) <-> Decimal
# ---------------------------------------------------------------------------

_NUMERIC_SCALE = 9


def encode_numeric(value: decimal.Decimal) -> bytes:
    """Scale-9 unscaled int, little-endian two's complement, minimal width
    (sign-preserving) — BigQuery NUMERIC wire bytes."""
    unscaled = int(
        (value * (10 ** _NUMERIC_SCALE)).to_integral_value(rounding=decimal.ROUND_HALF_UP)
    )
    if unscaled == 0:
        return b"\x00"
    nbytes = (unscaled.bit_length() + 8) // 8  # +1 sign bit headroom
    return unscaled.to_bytes(nbytes, "little", signed=True)


def decode_numeric(data: bytes) -> decimal.Decimal:
    unscaled = int.from_bytes(data, "little", signed=True)
    return decimal.Decimal(unscaled).scaleb(-_NUMERIC_SCALE)


# ---------------------------------------------------------------------------
# message encode / decode
# ---------------------------------------------------------------------------

def encode_message(values: dict[str, Any], desc: ProtoMessage) -> bytes:
    """Encode ``values`` (plain-Python dict) against ``desc``.

    proto2 semantics: ``None`` / missing → field omitted (explicit
    presence, which is why the Storage Write API mandates proto2);
    present values — including 0, "", b"" — are always emitted.  Fields
    are written in field-number order (canonical form).
    """
    out = bytearray()
    for f in sorted(desc.fields, key=lambda f: f.number):
        v = values.get(f.name)
        if v is None:
            continue
        if f.repeated:
            for item in v:
                if item is None:
                    raise ValueError(f"null element in repeated field {f.name}")
                _encode_single(out, f, item)
        else:
            _encode_single(out, f, v)
    return bytes(out)


def _encode_single(out: bytearray, f: ProtoField, v: Any) -> None:
    if f.kind == INT64:
        out += _tag(f.number, _WT_VARINT)
        out += encode_varint64(int(v))
    elif f.kind == BOOL:
        out += _tag(f.number, _WT_VARINT)
        out += b"\x01" if v else b"\x00"
    elif f.kind == DOUBLE:
        out += _tag(f.number, _WT_FIXED64)
        out += _struct.pack("<d", float(v))
    elif f.kind == FLOAT:
        out += _tag(f.number, _WT_FIXED32)
        out += _struct.pack("<f", float(v))
    elif f.kind == STRING:
        raw = v.encode("utf-8")
        out += _tag(f.number, _WT_LEN) + encode_uvarint(len(raw)) + raw
    elif f.kind == BYTES:
        raw = encode_numeric(v) if isinstance(v, decimal.Decimal) else bytes(v)
        out += _tag(f.number, _WT_LEN) + encode_uvarint(len(raw)) + raw
    elif f.kind == MESSAGE:
        if isinstance(v, tuple) and f.message is not None and len(f.message.fields) == 2:
            v = {"key": v[0], "value": v[1]}  # map entry convenience
        raw = encode_message(v, f.message)  # type: ignore[arg-type]
        out += _tag(f.number, _WT_LEN) + encode_uvarint(len(raw)) + raw
    else:  # pragma: no cover
        raise ValueError(f"unknown kind {f.kind}")


def decode_message(data: bytes, desc: ProtoMessage) -> dict[str, Any]:
    """Decode wire bytes against ``desc``; unknown field numbers are
    skipped by wire type (forward compatibility); packed repeated scalars
    are accepted alongside the unpacked form (spec requirement)."""
    by_num = desc.by_number()
    out: dict[str, Any] = {f.name: [] if f.repeated else None for f in desc.fields}
    pos = 0
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        number, wt = key >> 3, key & 7
        f = by_num.get(number)
        if f is None:
            pos = _skip(data, pos, wt)
            continue
        if wt == _WT_LEN and f.kind in (INT64, BOOL, DOUBLE, FLOAT) and f.repeated:
            ln, pos = decode_uvarint(data, pos)
            end = pos + ln
            while pos < end:  # packed form
                v, pos = _decode_scalar(data, pos, f.kind)
                out[f.name].append(v)
            continue
        v, pos = _decode_value(data, pos, f, wt)
        if f.repeated:
            out[f.name].append(v)
        else:
            out[f.name] = v
    return out


def _decode_scalar(data: bytes, pos: int, kind: str) -> tuple[Any, int]:
    if kind == INT64:
        u, pos = decode_uvarint(data, pos)
        return _to_signed64(u), pos
    if kind == BOOL:
        u, pos = decode_uvarint(data, pos)
        return bool(u), pos
    if kind == DOUBLE:
        return _struct.unpack_from("<d", data, pos)[0], pos + 8
    if kind == FLOAT:
        return _struct.unpack_from("<f", data, pos)[0], pos + 4
    raise ValueError(kind)


def _decode_value(data: bytes, pos: int, f: ProtoField, wt: int) -> tuple[Any, int]:
    if f.kind in (INT64, BOOL):
        if wt != _WT_VARINT:
            raise ValueError(f"field {f.name}: expected varint, got wiretype {wt}")
        return _decode_scalar(data, pos, f.kind)
    if f.kind == DOUBLE:
        if wt != _WT_FIXED64:
            raise ValueError(f"field {f.name}: expected fixed64, got wiretype {wt}")
        return _decode_scalar(data, pos, f.kind)
    if f.kind == FLOAT:
        if wt != _WT_FIXED32:
            raise ValueError(f"field {f.name}: expected fixed32, got wiretype {wt}")
        return _decode_scalar(data, pos, f.kind)
    if wt != _WT_LEN:
        raise ValueError(f"field {f.name}: expected length-delimited, got wiretype {wt}")
    ln, pos = decode_uvarint(data, pos)
    raw = data[pos : pos + ln]
    if len(raw) != ln:
        raise ValueError("truncated length-delimited field")
    pos += ln
    if f.kind == STRING:
        return raw.decode("utf-8"), pos
    if f.kind == BYTES:
        return bytes(raw), pos
    return decode_message(raw, f.message), pos  # type: ignore[arg-type]


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = decode_uvarint(data, pos)
        return pos
    if wt == _WT_FIXED64:
        return pos + 8
    if wt == _WT_FIXED32:
        return pos + 4
    if wt == _WT_LEN:
        ln, pos = decode_uvarint(data, pos)
        return pos + ln
    raise ValueError(f"cannot skip wire type {wt}")


# ---------------------------------------------------------------------------
# DescriptorProto (writer_schema) — descriptor.proto field numbers
# ---------------------------------------------------------------------------

def descriptor_proto(desc: ProtoMessage) -> bytes:
    """Serialize ``desc`` as a ``DescriptorProto`` message
    (``name=1 string, field=2 repeated FieldDescriptorProto,
    nested_type=3 repeated DescriptorProto``) so ``writer_schema`` carries
    real bytes a proto2 runtime can load."""
    out = bytearray()
    raw = desc.name.encode()
    out += _tag(1, _WT_LEN) + encode_uvarint(len(raw)) + raw
    nested: list[ProtoMessage] = []
    for f in desc.fields:
        fd = _field_descriptor_proto(f)
        out += _tag(2, _WT_LEN) + encode_uvarint(len(fd)) + fd
        if f.message is not None:
            nested.append(f.message)
    for m in nested:
        md = descriptor_proto(m)
        out += _tag(3, _WT_LEN) + encode_uvarint(len(md)) + md
    return bytes(out)


def _field_descriptor_proto(f: ProtoField) -> bytes:
    # FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6
    out = bytearray()
    raw = f.name.encode()
    out += _tag(1, _WT_LEN) + encode_uvarint(len(raw)) + raw
    out += _tag(3, _WT_VARINT) + encode_uvarint(f.number)
    label = _LABEL_REPEATED if f.repeated else _LABEL_OPTIONAL
    out += _tag(4, _WT_VARINT) + encode_uvarint(label)
    out += _tag(5, _WT_VARINT) + encode_uvarint(_TYPE_ENUM[f.kind])
    if f.message is not None:
        tn = f.message.name.encode()
        out += _tag(6, _WT_LEN) + encode_uvarint(len(tn)) + tn
    return bytes(out)


# ---------------------------------------------------------------------------
# AppendRowsRequest framing — storage.proto field numbers
# ---------------------------------------------------------------------------

def proto_rows(serialized_rows: Iterable[bytes]) -> bytes:
    """``ProtoRows{serialized_rows = 1 repeated bytes}``"""
    out = bytearray()
    for row in serialized_rows:
        out += _tag(1, _WT_LEN) + encode_uvarint(len(row)) + row
    return bytes(out)


def append_rows_request(
    stream: str,
    rows: Iterable[bytes],
    offset: int | None = None,
    writer_schema: ProtoMessage | None = None,
) -> bytes:
    """One Storage Write append frame (reference sends one per
    `streamWriter.append(jsonArray, currentOffset)` call,
    `BigqueryStreamWriter.java:281`): ``write_stream=1``, ``offset=2``
    as a wrapped ``Int64Value`` (presence = offset-checked append, the
    connector's exactly-once mode), ``proto_rows=4``."""
    out = bytearray()
    raw = stream.encode()
    out += _tag(1, _WT_LEN) + encode_uvarint(len(raw)) + raw
    if offset is not None:
        inner = _tag(1, _WT_VARINT) + encode_varint64(offset)
        out += _tag(2, _WT_LEN) + encode_uvarint(len(inner)) + inner
    # ProtoData{writer_schema=1 ProtoSchema{proto_descriptor=1}, rows=2}
    data = bytearray()
    if writer_schema is not None:
        dp = descriptor_proto(writer_schema)
        schema = _tag(1, _WT_LEN) + encode_uvarint(len(dp)) + dp
        data += _tag(1, _WT_LEN) + encode_uvarint(len(schema)) + schema
    pr = proto_rows(rows)
    data += _tag(2, _WT_LEN) + encode_uvarint(len(pr)) + pr
    out += _tag(4, _WT_LEN) + encode_uvarint(len(data)) + data
    return bytes(out)


def parse_append_rows_request(data: bytes) -> dict[str, Any]:
    """Inverse of :func:`append_rows_request` (tests / verification)."""
    out: dict[str, Any] = {"write_stream": None, "offset": None, "rows": []}
    pos = 0
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        number, wt = key >> 3, key & 7
        if number == 1 and wt == _WT_LEN:
            ln, pos = decode_uvarint(data, pos)
            out["write_stream"] = data[pos : pos + ln].decode()
            pos += ln
        elif number == 2 and wt == _WT_LEN:
            ln, pos = decode_uvarint(data, pos)
            inner = data[pos : pos + ln]
            pos += ln
            ipos = 0
            while ipos < len(inner):
                ik, ipos = decode_uvarint(inner, ipos)
                if ik >> 3 == 1:
                    u, ipos = decode_uvarint(inner, ipos)
                    out["offset"] = _to_signed64(u)
                else:
                    ipos = _skip(inner, ipos, ik & 7)
        elif number == 4 and wt == _WT_LEN:
            ln, pos = decode_uvarint(data, pos)
            pdata = data[pos : pos + ln]
            pos += ln
            ppos = 0
            while ppos < len(pdata):
                pk, ppos = decode_uvarint(pdata, ppos)
                if pk >> 3 == 2 and pk & 7 == _WT_LEN:
                    pl, ppos = decode_uvarint(pdata, ppos)
                    rdata = pdata[ppos : ppos + pl]
                    ppos += pl
                    rpos = 0
                    while rpos < len(rdata):
                        rk, rpos = decode_uvarint(rdata, rpos)
                        rl, rpos = decode_uvarint(rdata, rpos)
                        out["rows"].append(bytes(rdata[rpos : rpos + rl]))
                        rpos += rl
                else:
                    ppos = _skip(pdata, ppos, pk & 7)
        else:
            pos = _skip(data, pos, wt)
    return out


# -- AppendRowsResponse (the read half of the Storage Write protocol) --------
#
# The reference's per-append callback consumes this frame
# (BigqueryStreamWriter.java:354-376 sets it on the AppendContext;
# :148-183 derive hasError / hasUnretryableError / isAlreadyExists /
# isOutOfRange / corruptedRowKafkaOffsets from it). Field numbers from the
# PUBLIC google/cloud/bigquery/storage/v1/storage.proto:
#   oneof response { AppendResult append_result = 1   # { Int64Value offset = 1 }
#                    google.rpc.Status error    = 2 } # { int32 code = 1, string message = 2 }
#   repeated RowError row_errors = 4                  # { int64 index = 1, ErrorCode code = 2,
#                                                     #   string message = 3 }
#   string write_stream = 5
# (updated_schema = 3 is not modeled: the connector never reads it.)

# gRPC status codes (public google.rpc.Code); the retriable set is the
# reference's RETRIABLE_ERROR_CODES (BigqueryStreamWriter.java:120-127)
GRPC_CANCELLED = 1
GRPC_DEADLINE_EXCEEDED = 4
GRPC_ALREADY_EXISTS = 6
GRPC_FAILED_PRECONDITION = 9
GRPC_ABORTED = 10
GRPC_OUT_OF_RANGE = 11
GRPC_INTERNAL = 13
GRPC_UNAVAILABLE = 14
RETRIABLE_ERROR_CODES = frozenset(
    {GRPC_INTERNAL, GRPC_ABORTED, GRPC_CANCELLED, GRPC_FAILED_PRECONDITION,
     GRPC_DEADLINE_EXCEEDED, GRPC_UNAVAILABLE}
)
ROW_ERROR_FIELDS = 1  # RowError.ErrorCode.FIELDS_ERROR


def append_rows_response(
    offset: int | None = None,
    status: tuple[int, str] | None = None,
    row_errors: Iterable[tuple[int, int, str]] = (),
    write_stream: str = "",
) -> bytes:
    """One Storage Write append RESPONSE frame: success carries
    ``append_result.offset`` (Int64Value — presence distinguishes 0 from
    unset, same as the request side); failure carries ``error`` (a
    google.rpc.Status); per-row failures ride ``row_errors`` as
    (index, code, message) with the batch otherwise acknowledged — the
    shape behind the reference's partial-batch salvage (R10/R11)."""
    out = bytearray()
    if offset is not None:
        inner = _tag(1, _WT_VARINT) + encode_varint64(offset)
        ar = _tag(1, _WT_LEN) + encode_uvarint(len(inner)) + inner
        out += _tag(1, _WT_LEN) + encode_uvarint(len(ar)) + ar
    if status is not None:
        code, msg = status
        raw = msg.encode()
        st = _tag(1, _WT_VARINT) + encode_uvarint(code)
        st += _tag(2, _WT_LEN) + encode_uvarint(len(raw)) + raw
        out += _tag(2, _WT_LEN) + encode_uvarint(len(st)) + st
    for index, code, msg in row_errors:
        raw = msg.encode()
        re_ = _tag(1, _WT_VARINT) + encode_varint64(index)
        re_ += _tag(2, _WT_VARINT) + encode_uvarint(code)
        re_ += _tag(3, _WT_LEN) + encode_uvarint(len(raw)) + raw
        out += _tag(4, _WT_LEN) + encode_uvarint(len(re_)) + re_
    if write_stream:
        raw = write_stream.encode()
        out += _tag(5, _WT_LEN) + encode_uvarint(len(raw)) + raw
    return bytes(out)


def parse_append_rows_response(data: bytes) -> dict[str, Any]:
    """Inverse of :func:`append_rows_response` — what a client callback
    reads off the wire."""
    out: dict[str, Any] = {"offset": None, "status": None, "row_errors": [], "write_stream": ""}
    pos = 0
    while pos < len(data):
        key, pos = decode_uvarint(data, pos)
        number, wt = key >> 3, key & 7
        if number == 1 and wt == _WT_LEN:  # AppendResult
            ln, pos = decode_uvarint(data, pos)
            inner = data[pos : pos + ln]
            pos += ln
            ipos = 0
            while ipos < len(inner):
                ik, ipos = decode_uvarint(inner, ipos)
                if ik >> 3 == 1 and ik & 7 == _WT_LEN:  # Int64Value offset
                    il, ipos = decode_uvarint(inner, ipos)
                    wrapped = inner[ipos : ipos + il]
                    ipos += il
                    # Wrapper PRESENCE is what carries "offset is set":
                    # canonical proto3 encoders omit the zero varint inside
                    # Int64Value, so an empty wrapper body means offset=0,
                    # not unset.
                    out["offset"] = 0
                    wpos = 0
                    while wpos < len(wrapped):
                        wk, wpos = decode_uvarint(wrapped, wpos)
                        if wk >> 3 == 1:
                            u, wpos = decode_uvarint(wrapped, wpos)
                            out["offset"] = _to_signed64(u)
                        else:
                            wpos = _skip(wrapped, wpos, wk & 7)
                else:
                    ipos = _skip(inner, ipos, ik & 7)
        elif number == 2 and wt == _WT_LEN:  # google.rpc.Status
            ln, pos = decode_uvarint(data, pos)
            inner = data[pos : pos + ln]
            pos += ln
            st = {"code": 0, "message": ""}
            ipos = 0
            while ipos < len(inner):
                ik, ipos = decode_uvarint(inner, ipos)
                if ik >> 3 == 1 and ik & 7 == _WT_VARINT:
                    st["code"], ipos = decode_uvarint(inner, ipos)
                elif ik >> 3 == 2 and ik & 7 == _WT_LEN:
                    il, ipos = decode_uvarint(inner, ipos)
                    st["message"] = inner[ipos : ipos + il].decode()
                    ipos += il
                else:
                    ipos = _skip(inner, ipos, ik & 7)
            out["status"] = st
        elif number == 4 and wt == _WT_LEN:  # RowError
            ln, pos = decode_uvarint(data, pos)
            inner = data[pos : pos + ln]
            pos += ln
            re_ = {"index": 0, "code": 0, "message": ""}
            ipos = 0
            while ipos < len(inner):
                ik, ipos = decode_uvarint(inner, ipos)
                if ik >> 3 == 1 and ik & 7 == _WT_VARINT:
                    u, ipos = decode_uvarint(inner, ipos)
                    re_["index"] = _to_signed64(u)
                elif ik >> 3 == 2 and ik & 7 == _WT_VARINT:
                    re_["code"], ipos = decode_uvarint(inner, ipos)
                elif ik >> 3 == 3 and ik & 7 == _WT_LEN:
                    il, ipos = decode_uvarint(inner, ipos)
                    re_["message"] = inner[ipos : ipos + il].decode()
                    ipos += il
                else:
                    ipos = _skip(inner, ipos, ik & 7)
            out["row_errors"].append(re_)
        elif number == 5 and wt == _WT_LEN:
            ln, pos = decode_uvarint(data, pos)
            out["write_stream"] = data[pos : pos + ln].decode()
            pos += ln
        else:
            pos = _skip(data, pos, wt)
    return out


def classify_append_response(parsed: dict[str, Any]) -> dict[str, Any]:
    """The reference's AppendContext routing over a parsed response frame
    (BigqueryStreamWriter.java:148-183, exact semantics):

      has_error          status present OR any row_errors
      retriable          status code in RETRIABLE_ERROR_CODES (retry the
                         whole append; row errors alone are NOT retried)
      already_exists     ALREADY_EXISTS -> the offset-checked append was
                         a replay: treat as success, advance past it (R14)
      out_of_range       OUT_OF_RANGE -> offset gap: rewind (R15)
      corrupted_indexes  row indexes to dead-letter (R11/R12): ALL rows
                         for an unretryable status, else exactly the
                         row_errors' indexes, else none
      action             the TASK's routing with the reference's exact
                         precedence (BigqueryStorageWriteSinkTask.java:
                         214-241 — isAlreadyExists FIRST, then
                         isOutOfRange, then hasError):
                           skip_success    replayed offset: committed as-is (R14)
                           rewind          offset gap: re-consume from first (R15)
                           retry           whole append retried (R13)
                           dlq_all_rewind  unretryable: every row dead-letters
                           dlq_rows        row errors only: salvage the rest (R10)
                           ok              clean append
    """
    st = parsed.get("status")
    code = st["code"] if st else None
    row_errors = parsed.get("row_errors", [])
    has_error = st is not None or bool(row_errors)
    retriable = st is not None and code in RETRIABLE_ERROR_CODES
    unretryable = st is not None and code not in RETRIABLE_ERROR_CODES
    already = code == GRPC_ALREADY_EXISTS
    oor = code == GRPC_OUT_OF_RANGE
    if already:
        action = "skip_success"
    elif oor:
        action = "rewind"
    elif retriable:
        action = "retry"
    elif unretryable:
        action = "dlq_all_rewind"
    elif row_errors:
        action = "dlq_rows"
    else:
        action = "ok"
    return {
        "has_error": has_error,
        "retriable": retriable,
        "already_exists": already,
        "out_of_range": oor,
        "corrupted_indexes": (
            "ALL" if unretryable else [e["index"] for e in row_errors]
        ),
        "action": action,
    }
