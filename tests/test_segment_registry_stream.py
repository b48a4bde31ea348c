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


def test_segment_registry_state_survives_restart(spark, tmp_path):
    """Map/List state RECOVERY on the transformWithState engine: run 1
    registers p0's first two segments and stops; run 2 (same
    checkpoint) sees only the new file, so its output can report
    n_tracked=3 / n_rounds=2 ONLY if the MapState registry and the
    ListState round log were restored from the checkpoint — the
    restart half of the state-server protocol proof."""
    reason = _tws_ready()
    if reason:
        pytest.skip(reason)

    from kafka_replicator_spark.streaming.segment_registry import (
        INPUT_SCHEMA,
        segment_registry_stream,
    )

    src = str(tmp_path / "reg_src_r")
    cpdir = str(tmp_path / "reg_cp_r")
    outdir = str(tmp_path / "reg_out_r")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def run_once():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = spark.readStream.schema(INPUT_SCHEMA).parquet(src)
        q = (
            segment_registry_stream(stream)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        spark.createDataFrame(
            [("t", 0, 0, 99), ("t", 0, 1, 199)], schema=INPUT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()
        spark.createDataFrame(
            [("t", 0, 1, 250), ("t", 0, 2, 299)], schema=INPUT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()
        rows = sorted(
            spark.read.parquet(outdir).collect(), key=lambda r: r["n_rounds"]
        )
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    # run 2's row proves the recovered state: 3 tracked segments
    # (2 restored + 1 new), round log grown to 2, and only segment 2
    # counted as new this batch
    assert [
        (r["n_tracked"], r["max_end_offset"], r["n_new_this_batch"], r["n_rounds"])
        for r in rows
    ] == [(2, 199, 2, 1), (3, 299, 1, 2)]
