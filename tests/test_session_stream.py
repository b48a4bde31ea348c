"""Session-window MERGE across microbatches (streaming/sessions.py): a
later event that lands between two already-open sessions and within the
gap of both must merge them into one — the state behavior unique to
session windows (tumbling windows never merge state; the batch islands
idiom recomputes from scratch).  The existing session test
(test_windowed_stream.py) drives one single-file stream and never
exercises a merge."""

from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.sessions import session_message_stats

_SCHEMA = "topic string, partition_id int, ts_ns long, msg_size long"
_BASE_NS = 1_700_000_000_000_000_000
_MIN_NS = 60_000_000_000


def _rows(spec):
    """spec: [(topic, partition, minute, size), ...] -> rows at BASE+minute."""
    return [(t, p, _BASE_NS + m * _MIN_NS, sz) for (t, p, m, sz) in spec]


def test_batch_short_circuit_session_stats(spark):
    df = spark.createDataFrame(
        _rows([("a", 0, 0, 10), ("a", 0, 5, 20), ("a", 0, 40, 30)]), _SCHEMA
    )
    out = session_message_stats(df, gap="10 minutes")
    assert not out.isStreaming
    got = {(r["n_messages"], r["sum_bytes"]) for r in out.collect()}
    assert got == {(2, 30), (1, 30)}  # [0,5] one session, 40 alone


def test_session_merge_across_microbatches(spark, tmp_path):
    """Batch 1 opens sessions at minute 0 and minute 16 (gap 10 -> two
    sessions [0,10) and [16,26)); batch 2's minute-8 event ([8,18))
    overlaps BOTH -> all three merge into one [0,26) session.  A control
    partition gets no bridge and must stay two sessions.  The streaming
    result (complete mode, separate microbatches via maxFilesPerTrigger)
    must equal the batch run over the full input."""
    spec1 = [
        ("t", 0, 0, 1), ("t", 0, 16, 2),   # bridged partition, batch 1
        ("t", 1, 0, 4), ("t", 1, 16, 8),   # control partition (no bridge)
    ]
    spec2 = [("t", 0, 8, 16)]              # the bridge, later microbatch
    src = str(tmp_path / "in")
    spark.createDataFrame(_rows(spec1), _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(_rows(spec2), _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    full = spark.read.schema(_SCHEMA).parquet(src)
    batch = session_message_stats(full, gap="10 minutes").collect()

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_message_stats(stream, gap="10 minutes", watermark_delay="1 hour")
        .writeStream.format("memory")
        .queryName("sess_merge_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM sess_merge_out").collect()

    def as_map(rows):
        return {
            (r["partition_id"], r["session_start"]): (
                r["session_end"],
                r["n_messages"],
                r["sum_bytes"],
            )
            for r in rows
        }

    bm, gm = as_map(batch), as_map(got)
    assert gm == bm
    # the bridged partition collapsed to ONE session holding all 3 events
    p0 = [v for (pid, _), v in gm.items() if pid == 0]
    assert len(p0) == 1 and p0[0][1] == 3 and p0[0][2] == 19
    # the control partition kept its two separate sessions
    p1 = [v for (pid, _), v in gm.items() if pid == 1]
    assert len(p1) == 2 and {v[1] for v in p1} == {1}
