"""Stream-static join — the standard streaming enrichment pattern (a
micro-batch stream joined to a broadcast dimension).  At scale this is THE
way a stream picks up dimension attributes: the static side is re-resolved
per micro-batch, never shuffles the stream, and needs no state store (no
watermark required, unlike stream-stream joins).

The batch run of the same plan is the oracle, exactly like the
stream-stream tests in test_stream_join.py.
"""

from pyspark.sql import functions as F

from kafka_replicator_spark.sources.messages import events_as_messages


def _dim(spark, msgs):
    # deterministic owner assignment per partition, typed off the stream's
    # own partition_id column so the join key dtypes can't drift
    parts = [r["partition_id"] for r in msgs.select("partition_id").distinct().collect()]
    return spark.createDataFrame(
        [(p, f"owner{p % 3}") for p in sorted(parts)],
        schema=msgs.select("partition_id").schema.add("owner", "string"),
    )


def _enriched_counts(stream, dim):
    return (
        stream.join(F.broadcast(dim), "partition_id")
        .groupBy("owner")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("msg_size").alias("bytes"))
    )


def test_stream_static_broadcast_enrichment(spark, sf_dir, tmp_path):
    msgs = events_as_messages(spark, sf_dir).select(
        "partition_id", "msg_offset", "msg_size"
    )
    dim = _dim(spark, msgs)
    expected = {tuple(r) for r in _enriched_counts(msgs, dim).collect()}
    assert expected, "fixture produced no groups — vacuous test"

    src = str(tmp_path / "msgs")
    msgs.write.parquet(src)
    stream = spark.readStream.schema(msgs.schema).parquet(src)
    out = _enriched_counts(stream, dim)
    assert out.isStreaming

    q = (
        out.writeStream.format("memory")
        .queryName("ss_enrich")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    # stop a timed-out drain BEFORE asserting — else the leak fixture
    # double-fails and masks the timeout (CLAUDE.md round-9 rule)
    if not q.awaitTermination(120):
        q.stop()
        raise AssertionError("availableNow drain did not finish in 120s")
    got = {tuple(r) for r in spark.table("ss_enrich").collect()}
    assert got == expected


def test_stream_static_join_needs_no_watermark(spark, sf_dir, tmp_path):
    """Unlike stream-stream joins, the static side is stateless: the plan
    must not demand a watermark, and an inner stream-static join in append
    mode is legal (every micro-batch emits its joined rows immediately)."""
    msgs = events_as_messages(spark, sf_dir).select(
        "partition_id", "msg_offset", "msg_key"
    )
    dim = _dim(spark, msgs)
    src = str(tmp_path / "m2")
    msgs.write.parquet(src)
    stream = spark.readStream.schema(msgs.schema).parquet(src)
    out = stream.join(F.broadcast(dim), "partition_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise AssertionError("availableNow drain did not finish in 120s")
    n_stream = spark.table("ss_append").count()
    assert n_stream == msgs.count()  # inner join loses nothing: dim covers all partitions
