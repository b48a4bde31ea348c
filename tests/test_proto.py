"""X5 protobuf wire-format codec: property-tested round-trip + Spark UDF
path over a checkpoint stream."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.core.proto import (
    decode_checkpoint,
    decode_checkpoint_udf,
    decode_message,
    decode_segment_event,
    encode_checkpoint,
    encode_checkpoint_udf,
    encode_message,
    encode_segment_event,
)

names = st.text(min_size=0, max_size=40)
u32 = st.integers(min_value=0, max_value=2**31 - 1)
u63 = st.integers(min_value=0, max_value=2**62)


@given(region=names, topic=names, partition_id=u32, msg_offset=u63, ts_ns=u63)
@settings(max_examples=200, deadline=None)
def test_checkpoint_roundtrip(region, topic, partition_id, msg_offset, ts_ns):
    buf = encode_checkpoint(region, topic, partition_id, msg_offset, ts_ns)
    assert decode_checkpoint(buf) == {
        "region": region,
        "topic": topic,
        "partition_id": partition_id,
        "msg_offset": msg_offset,
        "ts_ns": ts_ns,
    }


@given(event_type=st.sampled_from(["CREATED", "REMOVED"]), region=names,
       topic=names, partition_id=u32, level=u32, start=u63, end=u63,
       size=u63, ts=u63)
@settings(max_examples=100, deadline=None)
def test_segment_event_roundtrip(event_type, region, topic, partition_id, level, start, end, size, ts):
    buf = encode_segment_event(event_type, region, topic, partition_id, level, start, end, size, ts)
    got = decode_segment_event(buf)
    assert got["event_type"] == event_type and got["start_offset"] == start
    assert got["end_offset"] == end and got["event_ts_ns"] == ts


def test_checkpoint_golden_bytes():
    """Wire bytes hand-derived from the protobuf spec for messages.proto:49-55:
    field tags (n<<3|wt), varints, and the nested Timestamp{seconds,nanos}
    submessage at field 5 — byte-for-byte what a proto3 marshaller emits."""
    buf = encode_checkpoint("us", "t", 3, 100, 5_000_000_001)
    expected = (
        b"\x0a\x02us"          # 1: "us"
        b"\x12\x01t"           # 2: "t"
        b"\x18\x03"            # 3: 3
        b"\x20\x64"            # 4: 100
        b"\x2a\x04\x08\x05\x10\x01"  # 5: Timestamp{seconds=5, nanos=1}
    )
    assert buf == expected


def test_segment_event_golden_bytes():
    """messages.proto:37-47: enum varint at 1, Timestamp at 2, nested
    Segment at 3, segmentSize at 4."""
    buf = encode_segment_event("REMOVED", "r", "t", 1, 2, 3, 4, 5, 1_000_000_000)
    segment = b"\x0a\x01r\x12\x01t\x18\x01\x20\x02\x28\x03\x30\x04"
    expected = (
        b"\x08\x01"                    # 1: Type.REMOVED = 1
        b"\x12\x02\x08\x01"            # 2: Timestamp{seconds=1}
        + b"\x1a" + bytes([len(segment)]) + segment  # 3: Segment
        + b"\x20\x05"                  # 4: segmentSize = 5
    )
    assert buf == expected


def test_proto3_zero_scalars_omitted():
    """Canonical proto3 encoding omits zero-valued scalars — CREATED (enum 0)
    must not appear on the wire, so bytes match the reference marshaller."""
    buf = encode_segment_event("CREATED", "r", "t", 0, 0, 0, 0, 0, 0)
    assert buf[0:1] == b"\x12"  # starts at field 2 (timestamp); no 1: tag
    got = decode_segment_event(buf)
    assert got["event_type"] == "CREATED" and got["partition_id"] == 0


@given(
    key=st.binary(max_size=64), value=st.binary(max_size=256), off=u63, ts=u63,
    headers=st.lists(
        st.tuples(st.text(min_size=1, max_size=16), st.binary(max_size=32)),
        max_size=4,
    ),
)
@settings(max_examples=100, deadline=None)
def test_message_roundtrip(key, value, off, ts, headers):
    """Message{key,value,offset,Timestamp,repeated Header} roundtrip
    (messages.proto:68-79)."""
    buf = encode_message(key, value, off, ts, headers)
    got = decode_message(buf)
    assert got["key"] == key and got["value"] == value
    assert got["msg_offset"] == off and got["ts_ns"] == ts
    assert got["headers"] == headers


def test_udf_roundtrip_over_stream(spark, messages):
    from pyspark.sql import functions as F

    cps = messages.limit(50).select(
        F.lit("src").alias("region"), "topic", "partition_id", "msg_offset", "ts_ns"
    )
    encoded = cps.select(
        encode_checkpoint_udf("region", "topic", "partition_id", "msg_offset", "ts_ns").alias("buf")
    )
    decoded = encoded.select(decode_checkpoint_udf("buf").alias("cp")).select("cp.*")
    orig = sorted(tuple(r) for r in cps.collect())
    back = sorted(tuple(r) for r in decoded.collect())
    assert orig == back
