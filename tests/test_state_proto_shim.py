"""Wire-level pins for the StateMessage proto shim (streaming/state_proto_shim).

The shim must be byte-compatible with what the real protobuf runtime
would produce for the request shapes pyspark's state clients build, and
must parse canonical proto3 responses (defaults omitted) the way the
clients read them. Golden bytes below are hand-assembled from the proto3
wire spec (tag = field<<3|wiretype, LEN-framed submessages)."""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_storage_write_spark.streaming import state_proto_shim as sm


def test_set_handle_state_golden_bytes():
    # StateRequest{statefulProcessorCall{setHandleState{state: CREATED}}}
    # field2 LEN 4 { field1 LEN 2 { field1 varint 1 } }
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020801")


def test_value_state_call_golden_bytes():
    # ValueStateCall{stateName:"s", get:{}} inside StateVariableRequest
    # inside StateRequest: 1a 07 0a 05 0a 01 73 1a 00
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="s", get=sm.Get())
        )
    )
    assert req.SerializeToString() == bytes.fromhex("1a070a050a01731a00")


def test_empty_oneof_member_serializes_as_empty_frame():
    # RemoveImplicitKey carries no fields but MUST appear on the wire
    # (the JVM dispatches on which oneof member is present)
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert req.SerializeToString() == bytes.fromhex("22021200")


def test_lazy_ttl_submessage_not_serialized_until_assigned():
    cmd = sm.StateCallCommand()
    cmd.stateName = "totals"
    _ = cmd.ttl  # read-only access must NOT mark ttl present
    on_wire = cmd.SerializeToString()
    assert b"totals" in on_wire and bytes.fromhex("2200") not in on_wire
    cmd.ttl.durationMs = 7  # assignment marks presence
    assert cmd.SerializeToString().endswith(bytes.fromhex("22020807"))


def test_negative_int64_sign_extension_roundtrip():
    t = sm.RegisterTimer(expiryTimestampMs=-5)
    wire = t.SerializeToString()
    # proto3: negative varints are 10-byte two's-complement
    assert len(wire) == 1 + 10
    back = sm.RegisterTimer()
    back.ParseFromString(wire)
    assert back.expiryTimestampMs == -5


def test_parse_canonical_response_with_omitted_defaults():
    # a canonical encoder omits statusCode=0 / errorMessage="" / value=b""
    r = sm.StateResponse()
    r.ParseFromString(b"")
    assert (r.statusCode, r.errorMessage, r.value) == (0, "", b"")
    r2 = sm.StateResponseWithLongTypeVal()
    r2.ParseFromString(bytes.fromhex("1805"))  # value=5 only
    assert (r2.statusCode, r2.errorMessage, r2.value) == (0, "", 5)


def test_parse_repeated_messages_and_unknown_field_skip():
    pair = sm.KeyAndValuePair(key=b"k1", value=b"v1")
    resp = sm.StateResponseWithMapIterator(
        statusCode=0, kvPair=[pair, sm.KeyAndValuePair(key=b"k2", value=b"v2")],
        requireNextFetch=True,
    )
    wire = resp.SerializeToString()
    # splice an unknown field (number 15, varint) in front — parser must skip
    wire = bytes.fromhex("782a") + wire
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(wire)
    assert [(p.key, p.value) for p in back.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]
    assert back.requireNextFetch is True


def test_repeated_bytes_list_get_roundtrip():
    resp = sm.StateResponseWithListGet(value=[b"a", b"bb"], requireNextFetch=False)
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"bb"]
    assert back.requireNextFetch is False  # explicit False serialized, parsed back


def test_timer_info_roundtrip():
    resp = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(key=b"u1", timestampMs=123456789012345)]
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert back.timer[0].key == b"u1"
    assert back.timer[0].timestampMs == 123456789012345


def test_unknown_field_name_raises():
    with pytest.raises(AttributeError):
        sm.StateRequest(bogus=1)
    with pytest.raises(AttributeError):
        _ = sm.StateResponse().bogus


def test_install_is_idempotent_and_targets_pyspark_module_path():
    import sys

    assert sm.install()  # google.protobuf absent in this sandbox
    assert sm.install()  # second call: already active
    import pyspark.sql.streaming.proto.StateMessage_pb2 as stateMessage

    assert stateMessage is sys.modules["kafka_connect_bigquery_storage_write_spark.streaming.state_proto_shim"]
    # the clients' enum constants resolve through the module
    assert (stateMessage.PRE_INIT, stateMessage.CLOSED) == (0, 5)
