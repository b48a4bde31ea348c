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
