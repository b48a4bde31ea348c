"""Incrementally-maintained aggregate: multi-batch fold equals the batch
aggregate over the full input; state survives across stream runs."""

from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.incremental_agg import (
    IncrementalAggState,
    run_incremental_agg_stream,
)

SCHEMA = "topic string, partition_id int, msg_offset long, msg_key binary, payload binary, ts_ns long"
AGGS = [("msg_offset", "count", "n"), ("msg_offset", "max", "max_offset"),
        ("ts_ns", "min", "first_ts")]


def test_incremental_equals_batch(spark, messages, tmp_path):
    src = str(tmp_path / "drops")
    data = messages.select(
        "topic", "partition_id", "msg_offset",
        F.col("msg_key").cast("binary").alias("msg_key"),
        F.col("payload").cast("binary").alias("payload"), "ts_ns",
    )
    for lo, hi in [(0, 100), (101, 200), (201, 10**9)]:
        data.filter(F.col("msg_offset").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    run_incremental_agg_stream(
        spark, src, SCHEMA, str(tmp_path / "state"), str(tmp_path / "cp"),
        keys=["topic", "partition_id"], aggs=AGGS,
    )
    state = IncrementalAggState(spark, str(tmp_path / "state"), ["topic", "partition_id"])
    got = {
        (r["topic"], r["partition_id"]): (r["n"], r["max_offset"], r["first_ts"])
        for r in state.read().collect()
    }
    exp = {
        (r["topic"], r["partition_id"]): (r["n"], r["max_offset"], r["first_ts"])
        for r in data.groupBy("topic", "partition_id")
        .agg(
            F.count("msg_offset").alias("n"),
            F.max("msg_offset").alias("max_offset"),
            F.min("ts_ns").alias("first_ts"),
        )
        .collect()
    }
    assert got == exp

    # new data arrives; a second stream run folds only the delta
    extra = data.limit(0)  # no-op run: state unchanged
    run_incremental_agg_stream(
        spark, src, SCHEMA, str(tmp_path / "state"), str(tmp_path / "cp"),
        keys=["topic", "partition_id"], aggs=AGGS,
    )
    again = {
        (r["topic"], r["partition_id"]): (r["n"], r["max_offset"], r["first_ts"])
        for r in state.read().collect()
    }
    assert again == exp  # no double counting on restart with same checkpoint
