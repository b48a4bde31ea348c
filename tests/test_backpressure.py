"""T15 backpressure: ``maxFilesPerTrigger`` bounds every micro-batch's
intake while ``availableNow`` still drains the full backlog exactly once
(reference pkg/ingress/worker.go poll-batch cap — the consumer never pulls
more than one poll batch per loop; Spark's file-source analog is the
per-trigger file cap, streaming/egress_stream.py:98-99).

The batch count is read from the stream's own commit log
(``checkpoint/offsets`` — one HDFSMetadataLog entry per micro-batch), so
the assertion sees exactly what the engine committed, not a side channel.
"""

import os

from pyspark.sql import functions as F

from kafka_replicator_spark.sources.segments import list_segments, read_segment_files
from kafka_replicator_spark.streaming.egress_stream import run_egress_stream

REGION = "bp-region"
N_DROPS = 6


def _stage_drops(spark, messages, src_dir, n_drops=N_DROPS):
    """Stage the message stream as ``n_drops`` single-file parquet drops."""
    hi = messages.agg(F.max("msg_offset")).collect()[0][0]
    step = (hi + n_drops) // n_drops
    for i in range(n_drops):
        lo, up = i * step, (i + 1) * step - 1
        (
            messages.filter(F.col("msg_offset").between(lo, up))
            .select("topic", "partition_id", "msg_offset", "msg_key", "payload", "ts_ns")
            .withColumn("msg_key", F.col("msg_key").cast("binary"))
            .withColumn("payload", F.col("payload").cast("binary"))
            .withColumn(
                "headers",
                F.lit(None).cast("array<struct<key:string,value:binary>>"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )


def _committed_batches(checkpoint_dir: str) -> int:
    """Number of micro-batches the engine committed (offsets log entries)."""
    offsets = os.path.join(checkpoint_dir, "offsets")
    return len([f for f in os.listdir(offsets) if f.isdigit()])


def test_max_files_per_trigger_paces_the_drain(spark, messages, tmp_path):
    src = str(tmp_path / "drops")
    _stage_drops(spark, messages, src)

    # capped: one file per trigger → one batch per staged drop
    seg_root = str(tmp_path / "segments")
    cp = str(tmp_path / "cp")
    run_egress_stream(
        spark,
        src,
        seg_root,
        cp,
        region=REGION,
        max_bytes=1 << 20,
        max_messages=10_000,
        max_files_per_trigger=1,
    )
    assert _committed_batches(cp) == N_DROPS

    # despite the pacing, the drain is complete and exactly-once
    listed = list_segments(spark, seg_root, read_footers=True)
    rows = listed.collect()
    total = sum(r["message_count"] for r in rows)
    assert total == messages.count()
    back = read_segment_files(spark, [r["path"] for r in rows])
    stats = back.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("msg_offset").alias("n_distinct"),
        F.min("msg_offset").alias("lo"),
        F.max("msg_offset").alias("hi"),
    )
    for r in stats.collect():
        assert r["lo"] == 0 and r["n"] == r["n_distinct"] == r["hi"] + 1

    # uncapped baseline: availableNow slurps the same backlog in ONE batch,
    # proving the cap above (not drop layout) produced the pacing
    cp2 = str(tmp_path / "cp2")
    run_egress_stream(
        spark,
        src,
        str(tmp_path / "segments2"),
        cp2,
        region=REGION,
        max_bytes=1 << 20,
        max_messages=10_000,
    )
    assert _committed_batches(cp2) == 1
