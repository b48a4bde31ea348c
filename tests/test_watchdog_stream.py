"""Processing-time timer watchdog on the transformWithState engine.

Drives the TIMER slice of the state-server protocol end-to-end —
registerTimer / deleteTimer / listTimers plus the handleExpiredTimer
callback — the last protocol family the other tws operators don't touch.
"""

from __future__ import annotations

import pytest


def _tws_ready():
    from pyspark.sql import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return "Spark < 4.0: no transformWithState"
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return "protobuf not installed: transformWithState unavailable"
    return None


def test_watchdog_fires_for_silent_partition(spark, tmp_path):
    reason = _tws_ready()
    if reason:
        pytest.skip(reason)

    from kafka_replicator_spark.streaming.watchdog_stream import (
        INPUT_SCHEMA,
        watchdog_stream,
    )

    src = str(tmp_path / "wd_src")
    # batch 1: both partitions active
    spark.createDataFrame(
        [("t", 0, 5), ("t", 0, 7), ("t", 1, 3)], schema=INPUT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: only partition 0 speaks — partition 1 goes silent, so its
    # batch-1 watchdog (armed 1 ms out) fires during this batch
    spark.createDataFrame([("t", 0, 9)], schema=INPUT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(INPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = watchdog_stream(stream, silence_ms=1)
        q = (
            out.writeStream.format("memory")
            .queryName("watchdog_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM watchdog_out").collect()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    seen = [(r["partition_id"], r["n_rows"], r["last_offset"]) for r in rows if r["kind"] == "SEEN"]
    alarms = [(r["partition_id"], r["last_offset"]) for r in rows if r["kind"] == "WATCHDOG"]
    # batch 1: p0 sees 2 rows (last 7), p1 sees 1 (last 3); batch 2: p0
    # sees 1 more (last 9), re-arming its timer
    assert (0, 2, 7) in seen and (1, 1, 3) in seen and (0, 1, 9) in seen
    # the silent partition's watchdog fired carrying its last-known offset
    assert (1, 3) in alarms, rows
    # availableNow runs a final timer-flush batch before terminating (the
    # tws contrast to the classic engine, which HANGS on a pending
    # ProcessingTimeTimeout under availableNow — see event_store.py), so
    # p0's re-armed timer also fires at drain end — with its POST-batch-2
    # state (last_offset 9), proving re-arm ordered before the flush
    assert (0, 9) in alarms, rows
