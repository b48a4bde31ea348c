"""Processing-time timer watchdog on the transformWithState engine.

Drives the TIMER slice of the state-server protocol end-to-end —
registerTimer / deleteTimer / listTimers plus the handleExpiredTimer
callback — the last protocol family the other tws operators don't touch.
"""

from __future__ import annotations

import time

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
        # availableNow + tws ProcessingTime NEVER terminates once a timer
        # has been registered — after the input batches and the timer-flush
        # batch it loops empty microbatches forever (measured batch 80+ in
        # 3 minutes; same engine trap as the value-state TTL case, and the
        # r06 'timers self-terminate' observation does not hold).  Poll the
        # sink for the full expected row set, then stop explicitly.
        deadline = time.time() + 180
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM watchdog_out").collect()
            if len(rows) >= 5 or not q.isActive:
                break
            time.sleep(1)
        if q.isActive:
            q.stop()
        else:
            q.awaitTermination(10)
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
    # availableNow runs a final timer-flush batch after the data batches
    # (though the query never self-terminates — see the poll-stop above),
    # so p0's re-armed timer also fires at drain end — with its
    # POST-batch-2 state (last_offset 9), proving re-arm ordered before
    # the flush
    assert (0, 9) in alarms, rows


def test_watchdog_timer_survives_restart(spark, tmp_path):
    """TIMER state across a kill-and-restart — completes the restart matrix
    over all four tws state families (Value/Map/List landed in round 6).

    Run 1 feeds key A with silence_ms=30s (wide margin so a contended
    machine cannot expire it between arming and the drain-end flush): the drain-end timer-flush batch
    sees an UNEXPIRED timer, so no WATCHDOG fires and the armed timer (plus
    A's last-offset ValueState) persists into the checkpoint.  After
    sleeping past expiry, run 2 feeds ONLY key B — a WATCHDOG row for A,
    carrying A's run-1 last_offset, can come only from the RECOVERED timer
    firing against the RECOVERED value state."""
    import time

    reason = _tws_ready()
    if reason:
        pytest.skip(reason)

    from kafka_replicator_spark.streaming.watchdog_stream import (
        INPUT_SCHEMA,
        watchdog_stream,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    shuffle_key = "spark.sql.shuffle.partitions"
    prev_shuffle = spark.conf.get(shuffle_key)
    spark.conf.set(shuffle_key, "4")

    src = str(tmp_path / "wdr_src")
    outdir = str(tmp_path / "wdr_out")
    cpdir = str(tmp_path / "wdr_cp")

    def run_once(want):
        """Drain until the sink holds ``want`` rows (or the query
        terminates on its own), then stop — defensive against a pending
        unexpired timer blocking availableNow termination."""
        stream = spark.readStream.schema(INPUT_SCHEMA).parquet(src)
        q = (
            watchdog_stream(stream, silence_ms=30_000)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 180
        while time.time() < deadline and q.isActive:
            try:
                if spark.read.parquet(outdir).count() >= want:
                    break
            except Exception:
                pass  # sink not created yet
            time.sleep(1)
        if q.isActive:
            q.stop()
        else:
            q.awaitTermination(10)

    try:
        spark.createDataFrame(
            [("t", 0, 5), ("t", 0, 9)], schema=INPUT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once(want=1)  # SEEN(A)
        rows1 = {
            (r["kind"], r["partition_id"], r["last_offset"])
            for r in spark.read.parquet(outdir).collect()
        }
        # the 30 s timer was NOT expired at drain end: no WATCHDOG in run 1
        assert rows1 == {("SEEN", 0, 9)}, rows1

        time.sleep(31)  # run past A's armed fire time

        spark.createDataFrame(
            [("t", 1, 3)], schema=INPUT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once(want=3)  # + SEEN(B) + WATCHDOG(A)
    finally:
        spark.conf.set(shuffle_key, prev_shuffle)
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    rows = {
        (r["kind"], r["partition_id"], r["last_offset"])
        for r in spark.read.parquet(outdir).collect()
    }
    # WATCHDOG for the silent key A with A's RECOVERED last offset — only a
    # recovered timer + recovered value state can produce this row
    assert ("WATCHDOG", 0, 9) in rows, rows
    assert ("SEEN", 1, 3) in rows, rows
    # B's own timer was fresh (unexpired) — no WATCHDOG for B
    assert ("WATCHDOG", 1, 3) not in rows, rows
