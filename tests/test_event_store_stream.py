"""Stateful streaming event store (T10): state carries across microbatches,
resolution follows A7, only changes are emitted."""

from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.event_store import streaming_event_store

EVENT_SCHEMA = (
    "region string, topic string, partition_id int, level int, "
    "start_offset long, end_offset long, event_type string, event_ts long"
)

SEG_A = ("r", "t", 0, 0, 0, 9)
SEG_B = ("r", "t", 0, 0, 10, 19)


def test_event_store_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "events_src")
    # batch 1: CREATED for both segments
    spark.createDataFrame(
        [(*SEG_A, "CREATED", 5), (*SEG_B, "CREATED", 6)], schema=EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2 (same drop dir, second file): stale REMOVED for A (loses),
    # fresh REMOVED for B (wins), duplicate CREATED for A (no change)
    spark.createDataFrame(
        [(*SEG_A, "REMOVED", 3), (*SEG_A, "CREATED", 5), (*SEG_B, "REMOVED", 9)],
        schema=EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one file per microbatch
        .parquet(src)
    )
    out = streaming_event_store(stream)  # no TTL: availableNow must terminate
    q = (
        out.writeStream.format("memory")
        .queryName("event_store_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM event_store_out").collect()
    # emitted changes: batch1 CREATED A + CREATED B; batch2 REMOVED B only
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["start_offset"], []).append((r["event_type"], r["event_ts"]))
    assert ("CREATED", 5) in by_seg[0]
    assert by_seg[10][-1] == ("REMOVED", 9)
    # A's stale REMOVED and duplicate CREATED emitted no extra change row
    assert len(by_seg[0]) == 1


def test_event_store_tws_engine_matches_classic(spark, tmp_path):
    """transformWithStateInPandas path (engine='tws', RocksDB provider):
    identical change-stream semantics across microbatches.  retention_ms
    (native value-state TTL) forces ProcessingTime timeMode, and under
    availableNow the query then NEVER self-terminates (empty batches loop
    after the drain) — the test polls the memory sink for the expected
    rows and stops explicitly."""
    import pytest
    from pyspark.sql import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        pytest.skip("Spark < 4.0: no transformWithState")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed: transformWithState state protocol unavailable")

    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        [(*SEG_A, "CREATED", 5), (*SEG_B, "CREATED", 6)], schema=EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(*SEG_A, "REMOVED", 3), (*SEG_A, "CREATED", 5), (*SEG_B, "REMOVED", 9)],
        schema=EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # retention_ms forces ProcessingTime timeMode: under availableNow
        # tws then NEVER terminates (it keeps scheduling empty batches
        # after the drain) — poll for the 3 expected change rows, then
        # stop() explicitly.  awaitTermination here would burn its full
        # timeout AND leak a running query into the rest of the suite.
        import time

        out = streaming_event_store(stream, retention_ms=3_600_000, engine="tws")
        q = (
            out.writeStream.format("memory")
            .queryName("event_store_tws_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 180
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM event_store_tws_out").collect()
            if len(rows) >= 3:
                break
            time.sleep(1)
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["start_offset"], []).append((r["event_type"], r["event_ts"]))
    assert ("CREATED", 5) in by_seg[0]
    assert by_seg[10][-1] == ("REMOVED", 9)
    assert len(by_seg[0]) == 1


def test_event_store_state_survives_restart(spark, tmp_path):
    """A7 last-writer state RECOVERY: run 1 stores CREATED for both
    segments and stops; run 2 (same checkpoint) delivers a STALE
    REMOVED for A and a fresh REMOVED for B.  Rejecting the stale
    event requires A's stored (event_ts=5) to have been recovered —
    append-mode restart needs a file sink (the memory sink refuses
    checkpoint recovery)."""
    src = str(tmp_path / "events_src_r")
    outdir = str(tmp_path / "events_out_r")
    cpdir = str(tmp_path / "events_cp_r")

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            streaming_event_store(stream)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [(*SEG_A, "CREATED", 5), (*SEG_B, "CREATED", 6)], schema=EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame(
        [(*SEG_A, "REMOVED", 3), (*SEG_B, "REMOVED", 9)], schema=EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    rows = spark.read.parquet(outdir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["start_offset"], []).append(
            (r["event_type"], r["event_ts"])
        )
    # A: CREATED emitted in run 1; the stale REMOVED (ts=3 < stored 5)
    # was rejected in run 2 — no second emission
    assert sorted(by_seg[SEG_A[4]]) == [("CREATED", 5)]
    # B: CREATED in run 1, then the fresh REMOVED won in run 2
    assert sorted(by_seg[SEG_B[4]]) == [("CREATED", 6), ("REMOVED", 9)]


def test_event_store_tws_ttl_expiry_survives_restart(spark, tmp_path):
    """tws ValueState WITH TTL across a kill-and-restart (VERDICT r06 #6):
    the reference's retention sweep (consistent_segment_store.go:323-397)
    must hold across recovery — the exact protocol path the protoshim's
    cascading-lazy-attachment fix protects (state_call_command.ttl.durationMs).

    Scenario EXPIRED (ttl=2s, sleep 6s between runs): run 1 stores
    CREATED(ts=5) for A; by run 2 the recovered state has EXPIRED, so a
    STALE REMOVED(ts=3) now WINS and emits — an emission only possible if
    recovery + TTL eviction both happened.

    Scenario RETAINED (ttl=1h, same cadence): the stale REMOVED is
    REJECTED — proving tws value state does recover (the expiry above is
    TTL, not lost state)."""
    import time

    import pytest
    from pyspark.sql import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        pytest.skip("Spark < 4.0: no transformWithState")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not installed")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # 4 streaming runs × N state partitions × RocksDB instances dominate
    # wall time — 1-key scenarios need few shuffle partitions (the width is
    # baked into each checkpoint at query start, so set it BEFORE run 1)
    shuffle_key = "spark.sql.shuffle.partitions"
    prev_shuffle = spark.conf.get(shuffle_key)
    spark.conf.set(shuffle_key, "4")

    def run_once(src, outdir, cpdir, ttl_ms):
        # TTL → ProcessingTime timeMode → availableNow never terminates
        # (empty batches loop after the drain): wait for the run's INPUT
        # batch to COMMIT (first new file in the checkpoint commits/ log —
        # availableNow puts all new input in the run's first batch), then
        # stop.  awaitTermination would hang until its timeout.
        import os
        import time

        def n_commits():
            d = os.path.join(cpdir, "commits")
            if not os.path.isdir(d):
                return 0
            return len([f for f in os.listdir(d) if f.isdigit()])

        before = n_commits()
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            streaming_event_store(stream, retention_ms=ttl_ms, engine="tws")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", cpdir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # Wait for TWO new commits, not one: stop() usually lands with a
        # PENDING empty batch (offsets written, commit missing), and the
        # restart replays that empty batch FIRST — its commit would satisfy
        # a `> before` check before the input file ever ran.  Whichever
        # order (replayed-empty then input, or input then trailing empty),
        # by before+2 the input batch has committed.
        deadline = time.time() + 180
        while time.time() < deadline and n_commits() < before + 2:
            time.sleep(1)
        assert n_commits() >= before + 2, "input batch never committed"
        q.stop()

    def scenario(tag, ttl_ms, sleep_s):
        src = str(tmp_path / f"src_{tag}")
        outdir = str(tmp_path / f"out_{tag}")
        cpdir = str(tmp_path / f"cp_{tag}")
        spark.createDataFrame(
            [(*SEG_A, "CREATED", 5)], schema=EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once(src, outdir, cpdir, ttl_ms)
        time.sleep(sleep_s)
        spark.createDataFrame(
            [(*SEG_A, "REMOVED", 3)], schema=EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        run_once(src, outdir, cpdir, ttl_ms)
        return sorted(
            (r["event_type"], r["event_ts"])
            for r in spark.read.parquet(outdir).collect()
        )

    try:
        expired = scenario("expired", ttl_ms=2_000, sleep_s=6)
        retained = scenario("retained", ttl_ms=3_600_000, sleep_s=6)
    finally:
        spark.conf.set(shuffle_key, prev_shuffle)
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

    # EXPIRED: state recovered then TTL-evicted → the stale REMOVED wins
    assert expired == [("CREATED", 5), ("REMOVED", 3)], expired
    # RETAINED: recovered state (ts=5) rejects the stale REMOVED (ts=3)
    assert retained == [("CREATED", 5)], retained
