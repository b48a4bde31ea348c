"""P1 Kafka-record projection (broker-free: the connector's record schema
is fixed, so a hand-built frame exercises the projection) + multi-topic
isolation through the segment lifecycle."""

from datetime import datetime

from pyspark.sql import functions as F

from kafka_replicator_spark.operators.compaction import compact
from kafka_replicator_spark.operators.egress import assign_segments_by_count, write_segments
from kafka_replicator_spark.sources.segments import list_segments, read_segment_files
from kafka_replicator_spark.streaming.egress_stream import project_kafka_records

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)


def test_p1_projection_shape_and_nulls(spark):
    rows = [
        (b"k1", b"v1", "t1", 0, 7, datetime(2024, 1, 1, 0, 0, 0), 0,
         [("h", b"hv")]),
        (None, b"v2", "t1", 1, 8, None, 0, None),  # no key, no timestamp
    ]
    raw = spark.createDataFrame(rows, schema=KAFKA_SCHEMA)
    out = project_kafka_records(raw).orderBy("msg_offset").collect()
    assert out[0]["topic"] == "t1" and out[0]["partition_id"] == 0
    assert out[0]["msg_offset"] == 7 and out[0]["payload"] == bytearray(b"v1")
    assert out[0]["ts_ns"] == 1704067200000000000
    assert out[0]["headers"][0]["key"] == "h"
    assert out[1]["msg_key"] is None and out[1]["ts_ns"] is None


def test_multi_topic_lifecycle_isolation(spark, tmp_path):
    """Two topics through write → compact → replay: no cross-topic rows,
    independent offset spaces."""
    root = str(tmp_path)
    rows = []
    for topic, n in (("alpha", 25), ("beta", 37)):
        for o in range(n):
            rows.append((topic, 0, o, f"{topic}-k{o}".encode(), f"{topic}-v{o}".encode(), o))
    df = spark.createDataFrame(
        rows,
        schema="topic string, partition_id int, msg_offset long, msg_key binary, "
        "payload binary, ts_ns long",
    ).withColumn("msg_size", F.lit(32).cast("long"))
    tagged = assign_segments_by_count(df, max_messages=10)
    write_segments(tagged, root=root, region="r", level=0).collect()
    assert list_segments(spark, root).select("topic").distinct().count() == 2

    out = compact(spark, root, region="r", min_count=2, min_bytes=1).collect()
    by_topic = {r["topic"]: r for r in out}
    assert (by_topic["alpha"]["start_offset"], by_topic["alpha"]["end_offset"]) == (0, 24)
    assert (by_topic["beta"]["start_offset"], by_topic["beta"]["end_offset"]) == (0, 36)

    back = read_segment_files(spark, [r["path"] for r in out])
    per_topic = {
        r["topic"]: r["n"]
        for r in back.groupBy("topic").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_topic == {"alpha": 25, "beta": 37}
    # payloads stayed with their topic
    crossed = back.filter(
        ~F.startswith(F.col("payload").cast("string"), F.col("topic"))
    ).count()
    assert crossed == 0
