"""Pure-Python stand-in for ``pyspark.sql.streaming.proto.StateMessage_pb2``.

WHY THIS EXISTS: Spark 4's transformWithStateInPandas talks to the JVM
state server over a protobuf-encoded socket protocol. Every piece of
that protocol ships inside pyspark itself EXCEPT the ``google.protobuf``
runtime the generated ``StateMessage_pb2.py`` needs — and this sandbox
cannot pip-install it (the same environment class as the
spark-sql-kafka jar). Without it the 5th Python stateful API crashes in
the worker at first state access.

This module closes that gap the way the engine already closes the
spark-protobuf gap (sinks/protowire.py, q179/q230): a hand-rolled,
spec-exact proto3 wire codec for the ~40 StateMessage message types,
installed as a drop-in ``sys.modules`` replacement ONLY when the real
runtime is absent. ``install()`` is a no-op wherever ``google.protobuf``
exists, so a real cluster keeps the generated classes — the one-line
swap is automatic.

Message schemas are transcribed from the serialized FileDescriptorProto
embedded in pyspark 4.1.2's generated ``StateMessage_pb2.py`` (decoded
with this repo's own varint machinery; the .proto source is public
Apache Spark: ``org/apache/spark/sql/execution/streaming/
StateMessage.proto``). Wire rules implemented: proto3 varint/zigzag-free
scalars (int32/int64 sign-extended to 64-bit two's-complement varints),
LEN-framed strings/bytes/submessages, repeated fields as one LEN frame
per element, unknown-field skip on parse, absent-field defaults on read.
Oneof semantics reduce to "serialize whatever was explicitly set" —
exactly how the pyspark client uses the classes (one member per oneof,
set via constructor kwarg).

Reference provenance: the reference connector's wire surface is the
same protobuf family (BigqueryStreamWriter.java builds AppendRows
protos); this shim is the TWS analogue of that jar-less trade,
documented at sinks/protowire.py:1-40.
"""

from __future__ import annotations

import sys
from typing import Any

from kafka_connect_bigquery_storage_write_spark.sinks.protowire import decode_uvarint, encode_uvarint

# wire types
_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5

# field kinds
_INT = "int"  # int32 / int64 / sint-free signed varint (sign-extended)
_ENUM = "enum"
_BOOL = "bool"
_STR = "str"
_BYTES = "bytes"
_MSG = "msg"
_RBYTES = "rbytes"
_RMSG = "rmsg"

_SCALAR_DEFAULTS = {_INT: 0, _ENUM: 0, _BOOL: False, _STR: "", _BYTES: b""}


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = decode_uvarint(data, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_LEN:
        ln, pos = decode_uvarint(data, pos)
        return pos + ln
    if wt == _WT_I32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wt}")


class _Message:
    """Base for all shim messages. Subclasses carry ``_FIELDS``:
    ``{name: (number, kind, nested_class_name_or_None)}``. Values set via
    constructor kwargs or attribute assignment serialize; auto-vivified
    submessages (``cmd.ttl.durationMs = 5``) serialize only once they
    carry a set field, mirroring protobuf's assignment-marks-presence."""

    _FIELDS: dict[str, tuple[int, str, str | None]] = {}

    def __init__(self, **kwargs: Any) -> None:
        object.__setattr__(self, "_vals", {})
        object.__setattr__(self, "_lazy", set())
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setattr__(self, name: str, value: Any) -> None:
        if name not in self._FIELDS:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        self._vals[name] = value
        self._lazy.discard(name)

    def __getattr__(self, name: str) -> Any:
        # only called when normal lookup fails -> field reads
        fields = type(self)._FIELDS
        if name not in fields:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        vals = self.__dict__["_vals"]
        if name in vals:
            return vals[name]
        _num, kind, nested = fields[name]
        if kind == _MSG:
            sub = _CLASSES[nested]()  # type: ignore[index]
            vals[name] = sub
            self.__dict__["_lazy"].add(name)
            return sub
        if kind in (_RBYTES, _RMSG):
            lst: list[Any] = []
            vals[name] = lst
            return lst
        return _SCALAR_DEFAULTS[kind]

    # -- wire ---------------------------------------------------------------
    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API)
        out = bytearray()
        for name, (num, kind, _nested) in sorted(
            type(self)._FIELDS.items(), key=lambda kv: kv[1][0]
        ):
            if name not in self._vals:
                continue
            v = self._vals[name]
            if kind == _MSG and name in self._lazy and not v._vals:
                continue  # auto-vivified, never assigned: not present
            tag_v = encode_uvarint(num << 3 | _WT_VARINT)
            tag_l = encode_uvarint(num << 3 | _WT_LEN)
            if kind in (_INT, _ENUM):
                out += tag_v + encode_uvarint(int(v) & 0xFFFFFFFFFFFFFFFF)
            elif kind == _BOOL:
                out += tag_v + encode_uvarint(1 if v else 0)
            elif kind == _STR:
                raw = v.encode("utf-8")
                out += tag_l + encode_uvarint(len(raw)) + raw
            elif kind == _BYTES:
                raw = bytes(v)
                out += tag_l + encode_uvarint(len(raw)) + raw
            elif kind == _MSG:
                raw = v.SerializeToString()
                out += tag_l + encode_uvarint(len(raw)) + raw
            elif kind == _RBYTES:
                for item in v:
                    raw = bytes(item)
                    out += tag_l + encode_uvarint(len(raw)) + raw
            elif kind == _RMSG:
                for item in v:
                    raw = item.SerializeToString()
                    out += tag_l + encode_uvarint(len(raw)) + raw
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:  # noqa: N802 (protobuf API)
        self._vals.clear()
        self._lazy.clear()
        by_num = {f[0]: (n, f[1], f[2]) for n, f in type(self)._FIELDS.items()}
        pos = 0
        while pos < len(data):
            key, pos = decode_uvarint(data, pos)
            num, wt = key >> 3, key & 7
            if num not in by_num:
                pos = _skip(data, pos, wt)
                continue
            name, kind, nested = by_num[num]
            if kind in (_INT, _ENUM, _BOOL):
                u, pos = decode_uvarint(data, pos)
                if kind == _BOOL:
                    self._vals[name] = bool(u)
                else:
                    self._vals[name] = u - (1 << 64) if u >= 1 << 63 else u
            else:
                ln, pos = decode_uvarint(data, pos)
                raw = data[pos : pos + ln]
                pos += ln
                if kind == _STR:
                    self._vals[name] = raw.decode("utf-8")
                elif kind == _BYTES:
                    self._vals[name] = raw
                elif kind == _MSG:
                    sub = _CLASSES[nested]()  # type: ignore[index]
                    sub.ParseFromString(raw)
                    self._vals[name] = sub
                elif kind == _RBYTES:
                    self._vals.setdefault(name, []).append(raw)
                elif kind == _RMSG:
                    sub = _CLASSES[nested]()  # type: ignore[index]
                    sub.ParseFromString(raw)
                    self._vals.setdefault(name, []).append(sub)
        return len(data)

    def __repr__(self) -> str:  # debugging aid only
        body = ", ".join(f"{k}={v!r}" for k, v in self._vals.items())
        return f"{type(self).__name__}({body})"


# -- schema (field numbers transcribed from the embedded descriptor) --------
# {message: {field: (number, kind, nested_message_or_None)}}
_SCHEMA: dict[str, dict[str, tuple[int, str, str | None]]] = {
    "StateRequest": {
        "version": (1, _INT, None),
        "statefulProcessorCall": (2, _MSG, "StatefulProcessorCall"),
        "stateVariableRequest": (3, _MSG, "StateVariableRequest"),
        "implicitGroupingKeyRequest": (4, _MSG, "ImplicitGroupingKeyRequest"),
        "timerRequest": (5, _MSG, "TimerRequest"),
        "utilsRequest": (6, _MSG, "UtilsRequest"),
    },
    "StateResponse": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "value": (3, _BYTES, None),
    },
    "StateResponseWithLongTypeVal": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "value": (3, _INT, None),
    },
    "StateResponseWithStringTypeVal": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "value": (3, _STR, None),
    },
    "StateResponseWithListGet": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "value": (3, _RBYTES, None),
        "requireNextFetch": (4, _BOOL, None),
    },
    "StateResponseWithMapKeysOrValues": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "value": (3, _RBYTES, None),
        "requireNextFetch": (4, _BOOL, None),
    },
    "KeyAndValuePair": {"key": (1, _BYTES, None), "value": (2, _BYTES, None)},
    "StateResponseWithMapIterator": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "kvPair": (3, _RMSG, "KeyAndValuePair"),
        "requireNextFetch": (4, _BOOL, None),
    },
    "TimerInfo": {"key": (1, _BYTES, None), "timestampMs": (2, _INT, None)},
    "StateResponseWithTimer": {
        "statusCode": (1, _INT, None),
        "errorMessage": (2, _STR, None),
        "timer": (3, _RMSG, "TimerInfo"),
        "requireNextFetch": (4, _BOOL, None),
    },
    "StatefulProcessorCall": {
        "setHandleState": (1, _MSG, "SetHandleState"),
        "getValueState": (2, _MSG, "StateCallCommand"),
        "getListState": (3, _MSG, "StateCallCommand"),
        "getMapState": (4, _MSG, "StateCallCommand"),
        "timerStateCall": (5, _MSG, "TimerStateCallCommand"),
        "deleteIfExists": (6, _MSG, "StateCallCommand"),
    },
    "StateVariableRequest": {
        "valueStateCall": (1, _MSG, "ValueStateCall"),
        "listStateCall": (2, _MSG, "ListStateCall"),
        "mapStateCall": (3, _MSG, "MapStateCall"),
    },
    "ImplicitGroupingKeyRequest": {
        "setImplicitKey": (1, _MSG, "SetImplicitKey"),
        "removeImplicitKey": (2, _MSG, "RemoveImplicitKey"),
    },
    "TimerRequest": {
        "timerValueRequest": (1, _MSG, "TimerValueRequest"),
        "expiryTimerRequest": (2, _MSG, "ExpiryTimerRequest"),
    },
    "TimerValueRequest": {
        "getProcessingTimer": (1, _MSG, "GetProcessingTime"),
        "getWatermark": (2, _MSG, "GetWatermark"),
    },
    "ExpiryTimerRequest": {
        "iteratorId": (1, _STR, None),
        "expiryTimestampMs": (2, _INT, None),
    },
    "GetProcessingTime": {},
    "GetWatermark": {},
    "UtilsRequest": {"parseStringSchema": (1, _MSG, "ParseStringSchema")},
    "ParseStringSchema": {"schema": (1, _STR, None)},
    "StateCallCommand": {
        "stateName": (1, _STR, None),
        "schema": (2, _STR, None),
        "mapStateValueSchema": (3, _STR, None),
        "ttl": (4, _MSG, "TTLConfig"),
    },
    "TimerStateCallCommand": {
        "register": (1, _MSG, "RegisterTimer"),
        "delete": (2, _MSG, "DeleteTimer"),
        "list": (3, _MSG, "ListTimers"),
    },
    "ValueStateCall": {
        "stateName": (1, _STR, None),
        "exists": (2, _MSG, "Exists"),
        "get": (3, _MSG, "Get"),
        "valueStateUpdate": (4, _MSG, "ValueStateUpdate"),
        "clear": (5, _MSG, "Clear"),
    },
    "ListStateCall": {
        "stateName": (1, _STR, None),
        "exists": (2, _MSG, "Exists"),
        "listStateGet": (3, _MSG, "ListStateGet"),
        "listStatePut": (4, _MSG, "ListStatePut"),
        "appendValue": (5, _MSG, "AppendValue"),
        "appendList": (6, _MSG, "AppendList"),
        "clear": (7, _MSG, "Clear"),
    },
    "MapStateCall": {
        "stateName": (1, _STR, None),
        "exists": (2, _MSG, "Exists"),
        "getValue": (3, _MSG, "GetValue"),
        "containsKey": (4, _MSG, "ContainsKey"),
        "updateValue": (5, _MSG, "UpdateValue"),
        "iterator": (6, _MSG, "Iterator"),
        "keys": (7, _MSG, "Keys"),
        "values": (8, _MSG, "Values"),
        "removeKey": (9, _MSG, "RemoveKey"),
        "clear": (10, _MSG, "Clear"),
    },
    "SetImplicitKey": {"key": (1, _BYTES, None)},
    "RemoveImplicitKey": {},
    "Exists": {},
    "Get": {},
    "RegisterTimer": {"expiryTimestampMs": (1, _INT, None)},
    "DeleteTimer": {"expiryTimestampMs": (1, _INT, None)},
    "ListTimers": {"iteratorId": (1, _STR, None)},
    "ValueStateUpdate": {"value": (1, _BYTES, None)},
    "Clear": {},
    "ListStateGet": {"iteratorId": (1, _STR, None)},
    "ListStatePut": {"value": (1, _RBYTES, None), "fetchWithArrow": (2, _BOOL, None)},
    "AppendValue": {"value": (1, _BYTES, None)},
    "AppendList": {"value": (1, _RBYTES, None), "fetchWithArrow": (2, _BOOL, None)},
    "GetValue": {"userKey": (1, _BYTES, None)},
    "ContainsKey": {"userKey": (1, _BYTES, None)},
    "UpdateValue": {"userKey": (1, _BYTES, None), "value": (2, _BYTES, None)},
    "Iterator": {"iteratorId": (1, _STR, None)},
    "Keys": {"iteratorId": (1, _STR, None)},
    "Values": {"iteratorId": (1, _STR, None)},
    "RemoveKey": {"userKey": (1, _BYTES, None)},
    "SetHandleState": {"state": (1, _ENUM, None)},
    "TTLConfig": {"durationMs": (1, _INT, None)},
}

_CLASSES: dict[str, type] = {
    name: type(name, (_Message,), {"_FIELDS": fields}) for name, fields in _SCHEMA.items()
}
globals().update(_CLASSES)

# HandleState enum values (module-level, like generated pb2 code)
PRE_INIT = 0
CREATED = 1
INITIALIZED = 2
DATA_PROCESSED = 3
TIMER_PROCESSED = 4
CLOSED = 5

_TARGET = "pyspark.sql.streaming.proto.StateMessage_pb2"


def install() -> bool:
    """Register this module as ``StateMessage_pb2`` iff the real protobuf
    runtime is absent. Returns True when the shim is (now) active.

    Idempotent and worker-safe: called at import of
    ``streaming.stateful``, so unpickling any stateful processor in a
    Spark worker installs the shim there before the first state call.
    On a cluster with ``google.protobuf`` installed this is a no-op and
    the generated classes are used — no behavioral fork.
    """
    try:
        # probe a concrete submodule, not the package: an empty namespace
        # package named `google` on sys.path (observed inside Spark's
        # worker PYTHONPATH) makes `import google.protobuf` "succeed" with
        # no runtime behind it ("unknown location"), and the generated pb2
        # would then crash on `from google.protobuf import descriptor`
        from google.protobuf import descriptor  # noqa: F401

        return False  # real runtime present: generated pb2 wins
    except Exception:
        pass
    mod = sys.modules[__name__]
    if sys.modules.get(_TARGET) is mod:
        return True
    sys.modules[_TARGET] = mod
    try:  # keep `from pyspark.sql.streaming.proto import StateMessage_pb2` working
        import pyspark.sql.streaming.proto as _pkg

        _pkg.StateMessage_pb2 = mod  # type: ignore[attr-defined]
    except Exception:
        pass
    return True
