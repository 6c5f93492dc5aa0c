"""From-spec protobuf runtime shim: wire-format golden bytes, proto3
semantics, descriptor parsing, and loading pyspark's real generated
StateMessage_pb2 module. Unconditional — the shim is pure stdlib."""

from __future__ import annotations

import pytest

from aind_exaspim_data_transformation_spark.protoshim import (
    install,
    iter_wire_fields,
    parse_file_descriptor,
    read_varint,
    write_varint,
)


def _sm():
    assert install() or True  # idempotent; True when shim is provider
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_varint_golden():
    out = bytearray()
    write_varint(out, 300)
    assert bytes(out) == b"\xac\x02"  # the spec's worked example
    assert read_varint(b"\xac\x02", 0) == (300, 2)
    out = bytearray()
    write_varint(out, -2)  # two's complement 64-bit -> 10 bytes
    assert len(out) == 10
    v, _ = read_varint(bytes(out), 0)
    assert v - (1 << 64) == -2


def test_wire_golden_nested_request():
    """StateRequest(version=2, statefulProcessorCall=...) must produce
    the canonical bytes: field1 varint 2; field2 len-delim {field1
    len-delim {field1 varint 3}}."""
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020803")
    rt = sm.StateRequest()
    rt.ParseFromString(bytes.fromhex("080212040a020803"))
    assert rt == req
    assert rt.statefulProcessorCall.setHandleState.state == 3


def test_proto3_zero_values_not_wired():
    sm = _sm()
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    assert (
        sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"
    )


def test_oneof_exclusivity():
    sm = _sm()
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.getListState = sm.StateCallCommand(stateName="b")
    assert not call.HasField("getValueState")
    assert call.HasField("getListState")


def test_assignment_through_vivified_submessage():
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = "stats"
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert (rt.stateName, rt.ttl.durationMs) == ("stats", 5000)


def test_repeated_fields_roundtrip():
    sm = _sm()
    msg = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    rt = sm.StateResponseWithMapIterator()
    rt.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in rt.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert rt.requireNextFetch is True
    # repeated bytes
    put = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=True)
    rt2 = sm.ListStatePut()
    rt2.ParseFromString(put.SerializeToString())
    assert list(rt2.value) == [b"a", b"bb"]


def test_negative_int64_roundtrip():
    sm = _sm()
    t = sm.TimerInfo(timestampMs=-12345)
    rt = sm.TimerInfo()
    rt.ParseFromString(t.SerializeToString())
    assert rt.timestampMs == -12345


def test_unknown_fields_skipped():
    sm = _sm()
    # unused field number 15 (varint) + a real statusCode
    extra = bytes([15 << 3 | 0]) + b"\x07" + b"\x08\x05"
    r = sm.StateResponse()
    r.ParseFromString(extra)
    assert r.statusCode == 5


def test_descriptor_parser_on_real_file():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as _  # noqa: F401
    import importlib.util
    import re

    spec = importlib.util.find_spec(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )
    src = open(spec.origin, "rb").read().decode("utf-8")
    m = re.search(r"AddSerializedFile\(\s*(b['\"].*?)\n\)", src, re.S)
    data = eval(m.group(1))  # the generated module's own literal
    fd = parse_file_descriptor(data)
    names = {d.name for d in fd.messages}
    assert {"StateRequest", "StateResponse", "MapStateCall"} <= names
    assert fd.package == "org.apache.spark.sql.execution.streaming.state"
    hs = {e.name: e.values for e in fd.enums}
    assert ("PRE_INIT", 0) in hs["HandleState"]
    assert ("CLOSED", 5) in hs["HandleState"]


def test_wire_iter_rejects_unsupported():
    with pytest.raises(ValueError, match="wire type"):
        list(iter_wire_fields(b"\x0d\x00\x00\x00\x00"))  # fixed32


def test_read_of_unset_oneof_member_is_side_effect_free():
    """Reading call.getValueState after getListState was set must NOT
    clear the set sibling (real protobuf reads are side-effect-free);
    round 6 vivified-on-read and silently dropped the set member."""
    sm = _sm()
    call = sm.StatefulProcessorCall(
        getListState=sm.StateCallCommand(stateName="b")
    )
    before = call.SerializeToString()
    _ = call.getValueState  # read only
    _ = call.getValueState.stateName  # nested scalar read only
    assert call.HasField("getListState")
    assert not call.HasField("getValueState")
    assert call.SerializeToString() == before


def test_read_of_unset_fields_registers_nothing():
    sm = _sm()
    cmd = sm.StateCallCommand()
    _ = cmd.ttl  # unset submessage read
    _ = cmd.ttl.durationMs  # nested default read
    assert not cmd.HasField("ttl")
    resp = sm.StateResponseWithMapIterator()
    _ = list(resp.kvPair)  # unset repeated read
    assert resp.SerializeToString() == b""


def test_writeback_registers_on_first_mutation():
    sm = _sm()
    # nested scalar assignment through two default hops
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    # repeated append through a default hop
    resp = sm.StateResponseWithMapIterator()
    resp.kvPair.append(sm.KeyAndValuePair(key=b"k", value=b"v"))
    rt = sm.StateResponseWithMapIterator()
    rt.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in rt.kvPair] == [(b"k", b"v")]
    # CopyFrom of an EMPTY message still registers presence
    call = sm.StatefulProcessorCall()
    call.getValueState.CopyFrom(sm.StateCallCommand())
    assert call.HasField("getValueState")


def test_which_oneof():
    sm = _sm()
    call = sm.StatefulProcessorCall()
    oneofs = call.DESCRIPTOR.oneofs
    assert len(oneofs) >= 1
    name = oneofs[0]
    assert call.WhichOneof(name) is None
    call.getListState = sm.StateCallCommand(stateName="x")
    assert call.WhichOneof(name) == "getListState"
    call.getValueState = sm.StateCallCommand(stateName="y")
    assert call.WhichOneof(name) == "getValueState"
    with pytest.raises(ValueError, match="no oneof"):
        call.WhichOneof("nope")


def test_golden_bytes_rich_fixture():
    """Spec-derived golden fixture covering negative int64 (10-byte
    two's-complement varint), multibyte UTF-8 string, repeated nested
    messages, and bool — field-number-ordered serialization is
    deterministic, so these bytes are exactly what genuine protobuf
    emits for the same message (encoding spec, protobuf.dev).

    ExpiryTimerRequest{expiryTimestampMs: -1} ->
      field 2 varint 0xFF..FF (18446744073709551615)
    StateResponseWithMapIterator{kvPair:[{key:"é"(bytes)}, {value:"v"}],
      requireNextFetch: true} ->
      field3{field1 "é"=C3 A9} field3{field2 "v"} field4 true
    """
    sm = _sm()
    exp = sm.ExpiryTimerRequest(expiryTimestampMs=-1)
    assert exp.SerializeToString() == bytes.fromhex(
        "10ffffffffffffffffff01"
    )
    rt = sm.ExpiryTimerRequest()
    rt.ParseFromString(bytes.fromhex("10ffffffffffffffffff01"))
    assert rt.expiryTimestampMs == -1

    msg = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key="é".encode("utf-8")),
            sm.KeyAndValuePair(value=b"v"),
        ],
        requireNextFetch=True,
    )
    golden = bytes.fromhex("1a040a02c3a91a03120176" "2001")
    assert msg.SerializeToString() == golden
    rt2 = sm.StateResponseWithMapIterator()
    rt2.ParseFromString(golden)
    assert rt2 == msg


def test_canary_statemessage_descriptor_within_shim_support():
    """Fails loudly if a pyspark upgrade adds a field the shim cannot
    wire: packed repeated numeric scalars (proto3 packs these by
    default, and the shim's varint decoder rejects wire type 2),
    zigzag sint*/uint32 types, floats, or fixed32/64."""
    import importlib.util
    import re

    spec = importlib.util.find_spec(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )
    src = open(spec.origin, "rb").read().decode("utf-8")
    m = re.search(r"AddSerializedFile\(\s*(b['\"].*?)\n\)", src, re.S)
    data = eval(m.group(1))
    fd = parse_file_descriptor(data)
    SUPPORTED = {3, 5, 8, 9, 11, 12, 14}  # int64 int32 bool str msg bytes enum

    def walk(msgs):
        for d in msgs:
            for f in d.fields:
                assert f.type in SUPPORTED, (
                    f"{d.full_name}.{f.name} has type {f.type}, which "
                    "this shim does not implement — extend protoshim "
                    "before upgrading pyspark"
                )
                assert not (f.repeated and f.type != 11 and f.type != 12 and f.type != 9), (
                    f"{d.full_name}.{f.name} is a repeated numeric "
                    "scalar: proto3 serializes these PACKED (wire type "
                    "2), which protoshim rejects — add packed support"
                )
            walk(d.nested)

    walk(fd.messages)
