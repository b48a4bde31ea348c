"""Checkpoint store semantics beyond the oracle queries: monotonic merge,
compacted-log publish/replay round-trip (K3/S5), backoff schedule (X7),
URL decode (X4), UUID (X9)."""

from pyspark.sql import functions as F

from kafka_replicator_spark.core.retry import backoff_ms, backoff_with_jitter_ms
from kafka_replicator_spark.operators.checkpoints import (
    apply_checkpoint_updates,
    load_checkpoint_log,
    publish_checkpoints,
)

CP_SCHEMA = "region string, topic string, partition_id int, msg_offset long, ts_ns long"


def test_monotonic_merge_ignores_lower_offsets(spark):
    current = spark.createDataFrame([("r", "t", 0, 100, 1)], schema=CP_SCHEMA)
    updates = spark.createDataFrame(
        [("r", "t", 0, 50, 2), ("r", "t", 0, 100, 3), ("r", "t", 1, 10, 4)],
        schema=CP_SCHEMA,
    )
    merged = {
        (r["partition_id"]): r["msg_offset"]
        for r in apply_checkpoint_updates(current, updates).collect()
    }
    assert merged == {0: 100, 1: 10}  # lower/equal ignored (checkpoint_store.go:253-313)


def test_checkpoint_log_roundtrip(spark, tmp_path):
    log_dir = str(tmp_path / "cplog")
    u1 = spark.createDataFrame([("r", "t", 0, 10, 1), ("r", "t", 1, 5, 1)], schema=CP_SCHEMA)
    u2 = spark.createDataFrame([("r", "t", 0, 25, 2)], schema=CP_SCHEMA)
    publish_checkpoints(u1, log_dir)
    publish_checkpoints(u2, log_dir)
    state = {r["partition_id"]: r["msg_offset"] for r in load_checkpoint_log(spark, log_dir).collect()}
    assert state == {0: 25, 1: 5}


def test_backoff_schedule():
    # reference S3 retrier: 200ms -> 5s cap (retrier.go:30-31)
    assert [backoff_ms(i) for i in range(6)] == [200, 400, 800, 1600, 3200, 5000]
    # deterministic jitter within +/-25%
    vals = {backoff_with_jitter_ms(3, seed="k") for _ in range(3)}
    assert len(vals) == 1
    assert 1200 <= vals.pop() <= 2000


def test_url_decode_x4(spark):
    # X4: object-key URL decode (reference sqs_segment_event_source.go:334-339)
    df = spark.createDataFrame([("data%2Fregion%2Ftopic%2F0%2F0%2Fseg%20file",)], "k string")
    assert df.select(F.url_decode("k").alias("d")).collect()[0]["d"] == (
        "data/region/topic/0/0/seg file"
    )


def test_uuid_x9(spark):
    # X9: temp-key UUIDs (reference utils/utils.go:57-59)
    rows = spark.range(100).select(F.expr("uuid()").alias("u")).collect()
    assert len({r["u"] for r in rows}) == 100
