"""Unit tests for the vendored minimal protobuf runtime (protoshim).

The shim exists to unlock pyspark's transformWithState state-server
protocol (StateMessage_pb2); its wire format must match the public
protobuf encoding spec exactly — the JVM side parses these bytes with
real protobuf.  Expected byte strings below are hand-derived from
https://protobuf.dev/programming-guides/encoding/.

The end-to-end proof is tests/test_event_store_stream.py /
test_continuity.py ``tws`` cases: a live streaming query whose Python
worker speaks the protocol to the JVM state server through this shim.
"""

from __future__ import annotations

import pytest

sm = pytest.importorskip(
    "pyspark.sql.streaming.proto.StateMessage_pb2",
    reason="pyspark has no transformWithState proto module",
)

from hypothesis import given, settings, strategies as st  # noqa: E402


def shim_active() -> bool:
    import google.protobuf

    return getattr(google.protobuf, "PROTOSHIM", False)


# ------------------------------------------------------------ wire bytes


def test_varint_and_submessage_bytes_match_spec():
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.CREATED))
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    # field 1 varint 2 = 08 02; field 2 len-delim(4) = 12 04;
    # inner field 1 len-delim(2) = 0a 02; SetHandleState.state=1 = 08 01
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_empty_marker_message_selects_oneof_case():
    vsc = sm.ValueStateCall(stateName="s", get=sm.Get())
    # stateName "s" = 0a 01 73; get (field 3, empty message) = 1a 00 —
    # the zero-length submessage is what tells the peer which case is set
    assert vsc.SerializeToString() == bytes.fromhex("0a01731a00")


def test_proto3_default_scalars_are_omitted():
    resp = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert resp.SerializeToString() == b""


def test_negative_int64_is_ten_byte_twos_complement():
    ti = sm.TimerInfo(timestampMs=-5)
    assert ti.SerializeToString() == bytes.fromhex("10fbffffffffffffffff01")


# ------------------------------------------------------- proto3 presence


def test_proto3_optional_explicit_default_serializes():
    implicit = sm.TimerInfo(timestampMs=1)
    explicit = sm.TimerInfo(timestampMs=1, key=b"")
    assert implicit.SerializeToString() != explicit.SerializeToString()
    back = sm.TimerInfo()
    back.ParseFromString(explicit.SerializeToString())
    assert back.HasField("key") and back.key == b""


def test_oneof_set_clears_previous_case():
    if not shim_active():
        # real protobuf forbids direct assignment to message-typed fields
        # (CopyFrom is its idiom); the shim allows it, and the pyspark tws
        # client only uses keyword construction, so this is shim-only
        pytest.skip("direct message-field assignment is a shim extension")
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    req.stateVariableRequest = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="x", get=sm.Get())
    )
    assert req.WhichOneof("method") == "stateVariableRequest"
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "stateVariableRequest"
    assert back.stateVariableRequest.valueStateCall.stateName == "x"


def test_unset_fields_read_proto3_defaults():
    r = sm.StateResponseWithListGet()
    assert r.statusCode == 0
    assert r.errorMessage == ""
    assert list(r.value) == []
    assert r.requireNextFetch is False


# ---------------------------------------------------------- round-trips


@settings(max_examples=200, deadline=None)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    msg=st.text(max_size=40),
    values=st.lists(st.binary(max_size=20), max_size=8),
    more=st.booleans(),
)
def test_listget_roundtrip_property(status, msg, values, more):
    r = sm.StateResponseWithListGet(
        statusCode=status, errorMessage=msg, value=values, requireNextFetch=more
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(r.SerializeToString())
    assert back.statusCode == status
    assert back.errorMessage == msg
    assert list(back.value) == values
    assert back.requireNextFetch == more


def test_nested_repeated_message_roundtrip():
    mi = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b""),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(mi.SerializeToString())
    assert [(kv.key, kv.value) for kv in back.kvPair] == [(b"k1", b"v1"), (b"k2", b"")]
    assert back.requireNextFetch is True


def test_unknown_fields_are_skipped():
    if not shim_active():
        pytest.skip("exercises the shim's decode loop")
    from google.protobuf.internal import wire

    # splice an unknown field (number 15, varint) between known ones
    known = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = wire.encode_tag(15, wire.WT_VARINT) + wire.encode_varint(99)
    back = sm.StateResponse()
    back.ParseFromString(unknown + known)
    assert back.statusCode == 7


def test_packed_repeated_varints_decode():
    if not shim_active():
        pytest.skip("exercises the shim's decode loop")
    # no repeated-varint field exists in StateMessage.proto; drive the
    # decoder directly through a synthetic descriptor
    from google.protobuf.internal import descriptors as d, wire
    from google.protobuf.message import build_message_class

    desc = d.MessageDesc(
        name="Packed",
        fields=[
            d.FieldDesc(
                name="xs", number=1, label=d.LABEL_REPEATED, type=d.TYPE_INT64
            )
        ],
    )
    cls = build_message_class(desc, {}, ".t.Packed")
    payload = b"".join(wire.encode_signed_varint(v) for v in (1, -2, 300))
    data = wire.encode_len_delimited(1, payload)
    m = cls()
    m.ParseFromString(data)
    assert list(m.xs) == [1, -2, 300]


def test_lazy_attachment_on_submessage_mutation():
    # the real-protobuf auto-vivification idiom pyspark's tws client uses:
    # reading an unset message field then mutating the returned instance
    # must attach it to the parent (state_call_command.ttl.durationMs = v)
    cmd = sm.StateCallCommand(stateName="s")
    cmd.ttl.durationMs = 1234
    data = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(data)
    assert back.ttl.durationMs == 1234
    assert back.HasField("ttl")


def test_lazy_attachment_cascades_and_selects_oneof():
    req = sm.StateRequest()
    # two levels of unset parents: mutation at the leaf attaches the chain
    req.statefulProcessorCall.getValueState.stateName = "v"
    assert req.WhichOneof("method") == "statefulProcessorCall"
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.getValueState.stateName == "v"


def test_unmutated_default_instance_leaves_parent_unset():
    r = sm.StateRequest()
    _ = r.statefulProcessorCall.setHandleState.state  # reads only
    assert r.SerializeToString() == b""
    assert not r.HasField("statefulProcessorCall")


def test_truncated_fixed_width_unknown_field_raises():
    if not shim_active():
        pytest.skip("exercises the shim's decode loop")
    from google.protobuf.internal import wire
    from google.protobuf.message import DecodeError

    # unknown field 15 declared fixed64 but only 3 payload bytes present
    data = wire.encode_tag(15, wire.WT_FIXED64) + b"\x01\x02\x03"
    m = sm.StateResponse()
    with pytest.raises(DecodeError):
        m.ParseFromString(data)


def test_repeated_reads_return_live_submessage_view():
    # `t = m.sub; m.sub.x = 1; t.y = 2` keeps BOTH fields — repeated reads
    # of an unset message field must hand out the same live instance
    cmd = sm.StateCallCommand(stateName="s")
    t = cmd.ttl
    cmd.ttl.durationMs = 5
    assert t.durationMs == 5  # same instance
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 5


def test_explicit_assignment_detaches_stale_default():
    cmd = sm.StateCallCommand()
    stale = cmd.ttl  # default instance from a read
    cmd.ttl = sm.TTLConfig(durationMs=7)  # explicit assignment supersedes
    stale.durationMs = 99  # stale handle must NOT clobber the real value
    assert cmd.ttl.durationMs == 7


def test_copyfrom_empty_source_attaches_and_selects_oneof():
    # CopyFrom is a MUTATING method: even with an EMPTY source it must
    # attach a lazily-read submessage — mark presence on the parent and
    # select the oneof arm — exactly like real protobuf (ADVICE r06)
    vsc = sm.ValueStateCall(stateName="s")
    vsc.get.CopyFrom(sm.Get())
    assert vsc.HasField("get")
    assert vsc.SerializeToString() == bytes.fromhex("0a01731a00")
    req = sm.StateRequest()
    req.statefulProcessorCall.CopyFrom(sm.StatefulProcessorCall())
    assert req.WhichOneof("method") == "statefulProcessorCall"


def test_setinparent_marks_presence():
    cmd = sm.StateCallCommand()
    cmd.ttl.SetInParent()
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.HasField("ttl")


def test_copyfrom_nonempty_source_replaces_state():
    a = sm.TTLConfig(durationMs=5)
    b = sm.TTLConfig(durationMs=9)
    a.CopyFrom(b)
    assert a.durationMs == 9
    a.CopyFrom(a)  # self-copy is a no-op, not a clear
    assert a.durationMs == 9


def test_mergefrom_attaches_lazy_chain():
    cmd = sm.StateCallCommand()
    cmd.ttl.MergeFrom(sm.TTLConfig(durationMs=3))
    assert cmd.HasField("ttl")
    assert cmd.ttl.durationMs == 3


def test_duplicate_singular_message_occurrences_merge():
    # spec: a parser must MERGE duplicate occurrences of a singular
    # embedded-message field (recursive merge), never wholesale-replace
    m1 = sm.StateCallCommand(stateName="a", ttl=sm.TTLConfig(durationMs=7))
    m2 = sm.StateCallCommand(mapStateValueSchema="v")
    data = m1.SerializeToString() + m2.SerializeToString()
    # wrap each as a duplicate occurrence of the same singular field
    outer1 = sm.StatefulProcessorCall(getValueState=m1).SerializeToString()
    outer2 = sm.StatefulProcessorCall(getValueState=m2).SerializeToString()
    back = sm.StatefulProcessorCall()
    back.ParseFromString(outer1 + outer2)
    got = back.getValueState
    assert got.stateName == "a"  # kept from the first occurrence
    assert got.mapStateValueSchema == "v"  # merged in from the second
    assert got.ttl.durationMs == 7
    del data
