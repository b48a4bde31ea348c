"""Map/List-state segment registry on the transformWithState engine.

This test drives the map and list slices of the state-server protocol
(getValue / updateValue / containsKey / keys iteration / appendValue /
list get) end-to-end against the JVM — the protocol surface the event
store's value state does not touch.  Through the vendored protoshim this
is the wire-format proof for MapStateCall / ListStateCall messages.
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


def test_segment_registry_map_and_list_state(spark, tmp_path):
    reason = _tws_ready()
    if reason:
        pytest.skip(reason)

    from kafka_replicator_spark.streaming.segment_registry import (
        INPUT_SCHEMA,
        segment_registry_stream,
    )

    src = str(tmp_path / "reg_src")
    # batch 1: two segments on p0, one on p1
    spark.createDataFrame(
        [("t", 0, 0, 99), ("t", 0, 1, 199), ("t", 1, 0, 49)], schema=INPUT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: p0 seg 1 grows (monotonic update), p0 seg 2 is new, p1 seg 0
    # shrinks (must be IGNORED by the monotonic rule)
    spark.createDataFrame(
        [("t", 0, 1, 250), ("t", 0, 2, 299), ("t", 1, 0, 10)], schema=INPUT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

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
        out = segment_registry_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("seg_registry_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT * FROM seg_registry_out ORDER BY partition_id, n_rounds"
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition_id"], []).append(r)

    # p0: batch1 tracked {0:99, 1:199}; batch2 updates 1->250, adds 2:299
    p0 = by_part[0]
    assert [(r["n_tracked"], r["max_end_offset"], r["n_new_this_batch"]) for r in p0] == [
        (2, 199, 2),
        (3, 299, 1),
    ]
    # cross-batch LIST state: round counter grows 1 -> 2
    assert [r["n_rounds"] for r in p0] == [1, 2]
    # p1: the shrinking end offset is rejected by the monotonic rule
    p1 = by_part[1]
    assert [(r["n_tracked"], r["max_end_offset"], r["n_new_this_batch"]) for r in p1] == [
        (1, 49, 1),
        (1, 49, 0),
    ]
    assert [r["n_rounds"] for r in p1] == [1, 2]
