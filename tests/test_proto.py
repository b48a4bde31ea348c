"""X5 protobuf wire-format codec: property-tested round-trip + Spark UDF
path over a checkpoint stream."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.core.proto import (
    decode_checkpoint,
    decode_checkpoint_udf,
    decode_segment_event,
    encode_checkpoint,
    encode_checkpoint_udf,
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
