"""S1/K2 live-connector smoke (reference pkg/kafka/consumer.go:165-185,
producer.go:156-218): drives the real ``format("kafka")`` source/sink through
the engine's projection contract when a broker is reachable.

This container ships no broker and no spark-sql-kafka jar, so the whole
module is gated on ``KAFKA_BOOTSTRAP_SERVERS`` — present-but-skipped is the
point: the moment an environment provides a broker (and launches Spark with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``), this
round-trips the P1 record projection against real Kafka records instead of
the hand-built connector-schema frames in test_kafka_projection.py.
"""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.egress_stream import project_kafka_records
from kafka_replicator_spark.streaming.ingress_stream import (
    kafka_producer_sink,
    kafka_sink_frame,
    kafka_sink_options,
)

BROKERS = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

pytestmark = pytest.mark.skipif(
    BROKERS is None,
    reason="no Kafka broker: set KAFKA_BOOTSTRAP_SERVERS (and launch Spark "
    "with the spark-sql-kafka connector package) to run the live smoke",
)


@pytest.fixture()
def topic() -> str:
    return f"krs-smoke-{uuid.uuid4().hex[:12]}"


def _message_frame(spark, topic: str, n: int = 50):
    """A small per-partition-dense message frame in the engine's canonical
    message schema (core/schema.py), destined for ``topic``."""
    rows = [
        (topic, o % 2, o // 2, f"k{o}".encode(), f"v{o}".encode(), 1_700_000_000_000_000_000 + o)
        for o in range(n)
    ]
    return spark.createDataFrame(
        rows,
        schema="topic string, partition_id int, msg_offset long, msg_key binary, "
        "payload binary, ts_ns long",
    )


def test_produce_consume_roundtrip(spark, topic):
    """K2 → S1: produce through the engine's sink projection, batch-read the
    topic back, recover messages through the P1 projection, compare."""
    msgs = _message_frame(spark, topic)
    kafka_producer_sink(msgs, BROKERS, topic).save()

    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    back = project_kafka_records(raw)
    assert back.count() == msgs.count()
    # key/value bytes and explicit partition survive the broker round-trip
    got = {
        (r["partition_id"], bytes(r["msg_key"]), bytes(r["payload"]))
        for r in back.collect()
    }
    want = {
        (o % 2, f"k{o}".encode(), f"v{o}".encode()) for o in range(msgs.count())
    }
    assert got == want
    # producer restored the source timestamp (non-zero path) at ms precision
    ts_ms = {r["ts_ns"] // 1_000_000 for r in back.collect()}
    assert min(ts_ms) >= 1_700_000_000_000


def test_streaming_source_smoke(spark, topic, tmp_path):
    """S1 as a Structured Streaming source: readStream → P1 projection →
    availableNow file sink terminates and lands every record."""
    msgs = _message_frame(spark, topic)
    kafka_producer_sink(msgs, BROKERS, topic).save()

    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    sink = str(tmp_path / "sink")
    (
        project_kafka_records(stream)
        .writeStream.option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start(sink)
        .awaitTermination()
    )
    assert spark.read.parquet(sink).count() == msgs.count()


def test_sink_options_reach_writer(spark, topic):
    """The idempotent-produce option contract (producer.go:107-111) is what
    the writer actually carries — catches option-name drift against the
    connector."""
    msgs = _message_frame(spark, topic, n=4)
    writer = kafka_producer_sink(msgs, BROKERS, topic)
    opts = kafka_sink_options(BROKERS, topic)
    assert opts["kafka.enable.idempotence"] == "true"
    assert opts["kafka.acks"] == "all"
    # the projection exposes exactly the connector's writable columns
    cols = set(kafka_sink_frame(msgs).columns)
    assert cols == {"key", "value", "partition", "timestamp"}
    writer.save()
