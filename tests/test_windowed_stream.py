"""T16 event-time windowed aggregation: the streaming result (with
watermark) must equal the batch result over the same complete input."""

from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.windowed import windowed_event_counts


def test_streaming_windows_match_batch(spark, messages, tmp_path):
    src = str(tmp_path / "drops")
    data = messages.select("topic", "partition_id", "msg_offset", "ts_ns", "msg_size")
    # two drops, split by offset — arrive "in order enough" for the watermark
    data.filter(F.col("msg_offset") < 120).coalesce(1).write.mode("append").parquet(src)
    data.filter(F.col("msg_offset") >= 120).coalesce(1).write.mode("append").parquet(src)

    batch = windowed_event_counts(data).collect()

    stream = (
        spark.readStream.schema("topic string, partition_id int, msg_offset long, ts_ns long, msg_size long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream, watermark_delay="10 seconds")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")  # complete mode: no rows withheld at stream end
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_out").collect()

    def key(r):
        return (r["window_start"], r["topic"], r["partition_id"])

    batch_map = {key(r): (r["n_messages"], r["sum_bytes"]) for r in batch}
    got_map = {key(r): (r["n_messages"], r["sum_bytes"]) for r in got}
    assert got_map == batch_map
    assert len(batch_map) > 10


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window through a real stream (watermark + append mode,
    state-store-backed) must equal the same aggregation run in batch over
    the complete input."""
    from pyspark.sql import functions as F

    rows = []
    # 6 users x 3 sessions x 3 events, 10-min intra-session spacing,
    # 2-hour inter-session gaps; event times increase with offset so the
    # single-file stream is "in order" for the watermark
    base = 1_700_000_000_000_000
    for u in range(6):
        for s in range(3):
            for i in range(3):
                ts_us = base + u * 1_000_000 + s * 7_200_000_000 + i * 600_000_000
                rows.append((u, ts_us))
    df = spark.createDataFrame(rows, "user_id long, ts_us long").withColumn(
        "event_time", F.timestamp_micros("ts_us")
    )
    src = str(tmp_path / "sess")
    df.orderBy("ts_us").coalesce(1).write.parquet(src)

    def sessions(frame):
        f = frame
        if f.isStreaming:
            f = f.withWatermark("event_time", "1 minute")
        return f.groupBy(
            F.session_window("event_time", "30 minutes").alias("sw"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_events"), F.min("ts_us").alias("start_us"))

    batch = {
        (r["user_id"], r["start_us"]): r["n_events"] for r in sessions(df).collect()
    }
    assert len(batch) == 18 and all(v == 3 for v in batch.values())

    stream = spark.readStream.schema("user_id long, ts_us long, event_time timestamp").parquet(src)
    q = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == batch
