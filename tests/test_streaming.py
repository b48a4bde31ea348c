"""Streaming egress/ingress tests — the reference's failure-injection
matrix translated to kill-and-restart against the same checkpointLocation
(FIXTURES.md invariants 2 and 3).
"""

import os

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.sources.segments import list_segments, read_segment_files
from kafka_replicator_spark.streaming.egress_stream import run_egress_stream
from kafka_replicator_spark.streaming.ingress_stream import IngressState, run_ingress_stream

REGION = "stream-region"


def _stage_message_drops(spark, messages, src_dir, n_drops=3):
    """Stage the message stream as n parquet 'drops' (poll batches)."""
    bounds = [(0, 80), (81, 170), (171, 10**9)]
    for i, (lo, hi) in enumerate(bounds[:n_drops]):
        (
            messages.filter(F.col("msg_offset").between(lo, hi))
            .select("topic", "partition_id", "msg_offset", "msg_key", "payload", "ts_ns")
            .withColumn("msg_key", F.col("msg_key").cast("binary"))
            .withColumn("payload", F.col("payload").cast("binary"))
            .withColumn("headers", F.lit(None).cast(
                "array<struct<key:string,value:binary>>"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )


@pytest.fixture(scope="module")
def staged(spark, messages, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("drops"))
    _stage_message_drops(spark, messages, src)
    return src


def test_egress_stream_writes_all_segments(spark, messages, staged, tmp_path):
    seg_root = str(tmp_path / "segments")
    cp = str(tmp_path / "cp")
    run_egress_stream(
        spark, staged, seg_root, cp, region=REGION, max_bytes=4096, max_messages=100
    )
    listed = list_segments(spark, seg_root, read_footers=True)
    total = listed.agg(F.sum("message_count")).collect()[0][0]
    assert total == messages.count()
    # offsets gap-free per partition across all segments
    back = read_segment_files(spark, [r["path"] for r in listed.collect()])
    stats = back.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("msg_offset").alias("lo"), F.max("msg_offset").alias("hi")
    )
    for r in stats.collect():
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_egress_stream_restart_is_idempotent(spark, messages, staged, tmp_path):
    """Invariant 2: restart from the same checkpoint neither loses nor
    duplicates (exactly-once-per-file via deterministic naming)."""
    seg_root = str(tmp_path / "segments")
    cp = str(tmp_path / "cp")
    run_egress_stream(spark, staged, seg_root, cp, region=REGION, max_bytes=4096, max_messages=100)
    first = sorted(r["path"] for r in list_segments(spark, seg_root).collect())
    # "restart": same checkpoint — no new input, no new files
    run_egress_stream(spark, staged, seg_root, cp, region=REGION, max_bytes=4096, max_messages=100)
    second = sorted(r["path"] for r in list_segments(spark, seg_root).collect())
    assert first == second
    # crash simulation: wipe the engine checkpoint (full replay) — files are
    # rewritten in place, still no duplicates in the read-back stream
    import shutil

    shutil.rmtree(cp)
    run_egress_stream(spark, staged, seg_root, cp, region=REGION, max_bytes=4096, max_messages=100)
    back = read_segment_files(spark, [r["path"] for r in list_segments(spark, seg_root).collect()])
    assert back.count() == messages.count()


def test_ingress_stream_delivers_in_order(spark, messages, staged, tmp_path):
    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2"), state_path
    )
    delivered = spark.read.parquet(sink)
    assert delivered.count() == messages.count()
    # invariant 1: per-partition delivered offsets dense from 0
    stats = delivered.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("msg_offset").alias("hi")
    )
    for r in stats.collect():
        assert r["n"] == r["hi"] + 1
    state = IngressState.load(state_path)
    assert state.messages_lost == 0
    assert all(v >= 0 for v in state.checkpoints.values())


def test_ingress_resume_delivers_only_above_checkpoint(spark, messages, staged, tmp_path):
    """Invariant 3: replay from checkpoint k delivers exactly offsets >= k+1."""
    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    # pre-seed delivery state: partition 0 already delivered through 150
    state = IngressState(path=state_path, checkpoints={"events/0": 150})
    state.save()
    run_ingress_stream(spark, seg_root, sink, str(tmp_path / "cp2"), state_path)
    delivered = spark.read.parquet(sink)
    p0_min = (
        delivered.filter(F.col("partition_id") == 0).agg(F.min("msg_offset")).collect()[0][0]
    )
    assert p0_min == 151


def test_ingress_lost_segment_policy(spark, messages, staged, tmp_path):
    """T6/T7: a leading gap (missing segment file) holds delivery back for
    max_gap_retries batches, then skips with messages_lost accounting."""
    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    # destroy the first segment of partition 0 → offsets [0..k] missing
    segs = list_segments(spark, seg_root, partition_id=None).collect()
    first_p0 = min(
        (r for r in segs if r["partition_id"] == 0), key=lambda r: r["start_offset"]
    )
    os.remove(first_p0["path"])
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2"), state_path, max_gap_retries=0
    )
    state = IngressState.load(state_path)
    assert state.messages_lost == first_p0["end_offset"] - first_p0["start_offset"] + 1
    delivered = spark.read.parquet(sink)
    p0_min = (
        delivered.filter(F.col("partition_id") == 0).agg(F.min("msg_offset")).collect()[0][0]
    )
    assert p0_min == first_p0["end_offset"] + 1


def test_first_segment_delay_gate(spark, messages, staged, tmp_path):
    """T5: a partition first seen at batch b is not delivered before
    batch b + delay (reference FirstSegmentDelay, ingress worker.go:98-108)."""
    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    # first run: everything is newly seen -> gated, nothing delivered
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2a"), state_path,
        first_segment_delay_batches=1,
    )
    assert not os.path.exists(sink) or spark.read.parquet(sink).count() == 0
    state = IngressState.load(state_path)
    assert state.batches_run >= 1 and state.first_seen_batch
    # second run (fresh engine checkpoint replays the files; delivery state
    # carries the first-seen batch): now past the delay -> delivered
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2b"), state_path,
        first_segment_delay_batches=1,
    )
    assert spark.read.parquet(sink).count() == messages.count()


def test_out_of_order_file_arrival_within_run(spark, messages, tmp_path):
    """Internal-gap correctness: a segment arriving before its predecessor
    (separate microbatches in ONE run) is held as pending and delivered once
    the gap closes — nothing lost, nothing out of order."""
    import shutil

    seg_root = str(tmp_path / "segs")
    stash = str(tmp_path / "stash")
    os.makedirs(stash)
    # build segments then hide the FIRST one of partition 0
    src = str(tmp_path / "drops")
    _stage_message_drops(spark, messages, src)
    run_egress_stream(
        spark, src, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    segs = sorted(
        (r for r in list_segments(spark, seg_root).collect() if r["partition_id"] == 0),
        key=lambda r: r["start_offset"],
    )
    first = segs[0]
    hidden = os.path.join(stash, os.path.basename(first["path"]))
    shutil.move(first["path"], hidden)

    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    # run 1: later segments of p0 arrive without the first -> held pending
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2"), state_path, max_gap_retries=99
    )
    state = IngressState.load(state_path)
    assert any(k.endswith("/0") for k in state.pending_paths), state.pending_paths
    if os.path.exists(sink):
        assert spark.read.parquet(sink).filter(F.col("partition_id") == 0).count() == 0
    # the missing segment appears; SAME engine stream continues (new files
    # only) and must merge pending with the new arrival
    shutil.move(hidden, first["path"])
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2"), state_path, max_gap_retries=99
    )
    delivered = spark.read.parquet(sink).filter(F.col("partition_id") == 0)
    n = delivered.count()
    hi = delivered.agg(F.max("msg_offset")).collect()[0][0]
    # the held-back (later) segments must actually land, not just the
    # gap-filling first segment — compare against the partition's full count
    expected = messages.filter(F.col("partition_id") == 0).count()
    assert n == expected, (n, expected)
    assert n == hi + 1  # dense from 0: pending segments all delivered
    state = IngressState.load(state_path)
    assert state.messages_lost == 0 and not state.pending_paths


def test_full_pipeline_egress_compact_ingress(spark, messages, staged, tmp_path):
    """Capstone: the reference's deployment end-to-end — streaming egress
    into level-0 segments, background compaction to level 1, streaming
    ingress delivering the compacted stream densely and in order."""
    from kafka_replicator_spark.operators.compaction import compact

    seg_root = str(tmp_path / "segs")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    n_level0 = list_segments(spark, seg_root).count()
    compacted = compact(spark, seg_root, region=REGION, min_count=2, min_bytes=1).collect()
    assert len(compacted) > 0
    levels = [r["level"] for r in list_segments(spark, seg_root).collect()]
    assert set(levels) == {1} and len(levels) < n_level0

    sink = str(tmp_path / "sink")
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2"), str(tmp_path / "state.json")
    )
    delivered = spark.read.parquet(sink)
    assert delivered.count() == messages.count()
    stats = delivered.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("msg_offset").alias("hi")
    )
    for r in stats.collect():
        assert r["n"] == r["hi"] + 1  # dense from 0 through the whole pipeline
    state = IngressState.load(str(tmp_path / "state.json"))
    assert state.messages_lost == 0


def test_ingress_sink_failure_then_retry_no_loss_no_dup(spark, messages, staged, tmp_path):
    """Failure-retry matrix analog (reference ingress_test.go:518-685): the
    delivery batch crashes mid-write; a restart against the same
    checkpoints replays the epoch and delivers exactly once."""
    import kafka_replicator_spark.streaming.ingress_stream as ing

    seg_root = str(tmp_path / "segs")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")

    # poison the first delivery attempt: fail after the trim join is built
    original = ing.parse_segment_path_cols
    calls = {"n": 0}

    def poisoned(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected sink failure")
        return original(*a, **k)

    ing.parse_segment_path_cols = poisoned
    try:
        import pytest as _pytest

        with _pytest.raises(Exception, match="injected sink failure"):
            run_ingress_stream(
                spark, seg_root, sink, str(tmp_path / "cp2"), state_path
            )
    finally:
        ing.parse_segment_path_cols = original

    # nothing was delivered, no checkpoint advanced
    state = ing.IngressState.load(state_path)
    assert state.checkpoints == {}
    # retry with the SAME engine checkpoint: epoch replays, delivers all
    run_ingress_stream(spark, seg_root, sink, str(tmp_path / "cp2"), state_path)
    delivered = spark.read.parquet(sink)
    assert delivered.count() == messages.count()
    assert delivered.select("partition_id", "msg_offset").distinct().count() == messages.count()


def test_first_segment_delay_wall_clock(spark, messages, staged, tmp_path):
    """T5 duration semantics (reference pkg/ingress/config.go:32-36 — the
    30-minute FirstSegmentDelay is a wall-clock duration): a partition first
    seen at wall time t is gated until t + delay, independent of how many
    batches run in between."""
    from datetime import timedelta

    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    fake_now = [1_000_000.0]
    delay = timedelta(minutes=30)
    # run 1 at t0: everything newly seen -> gated, nothing delivered
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2a"), state_path,
        first_segment_delay=delay, clock=lambda: fake_now[0],
    )
    assert not os.path.exists(sink) or spark.read.parquet(sink).count() == 0
    # run 2 at t0 + 1s (fresh engine checkpoint replays the files): still
    # inside the delay window -> still gated, even though batches advanced
    fake_now[0] += 1.0
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2b"), state_path,
        first_segment_delay=delay, clock=lambda: fake_now[0],
    )
    assert not os.path.exists(sink) or spark.read.parquet(sink).count() == 0
    # run 3 past the delay -> delivered in full
    fake_now[0] += delay.total_seconds()
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2c"), state_path,
        first_segment_delay=delay, clock=lambda: fake_now[0],
    )
    assert spark.read.parquet(sink).count() == messages.count()


def test_lost_segment_timeout_wall_clock(spark, messages, staged, tmp_path):
    """T6/T7 duration semantics (reference pkg/ingress/config.go:37-40 — the
    24 h LostSegmentTimeout): a gap held since wall time g escalates
    late → lost only once now - g exceeds the timeout, overriding the
    batch-count escalation (max_gap_retries=0 must NOT skip while the
    wall-clock timeout is configured and unexpired)."""
    from datetime import timedelta

    seg_root = str(tmp_path / "segments")
    run_egress_stream(
        spark, staged, seg_root, str(tmp_path / "cp1"), region=REGION,
        max_bytes=4096, max_messages=100,
    )
    segs = list_segments(spark, seg_root).collect()
    first_p0 = min(
        (r for r in segs if r["partition_id"] == 0), key=lambda r: r["start_offset"]
    )
    os.remove(first_p0["path"])
    sink = str(tmp_path / "sink")
    state_path = str(tmp_path / "state.json")
    fake_now = [2_000_000.0]
    timeout = timedelta(hours=24)
    # run 1: gap is fresh -> held back (despite max_gap_retries=0), 0 lost
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2a"), state_path,
        max_gap_retries=0, lost_segment_timeout=timeout,
        clock=lambda: fake_now[0],
    )
    state = IngressState.load(state_path)
    assert state.messages_lost == 0
    assert any(k.endswith("/0") for k in state.pending_paths), state.pending_paths
    if os.path.exists(sink):
        assert spark.read.parquet(sink).filter(F.col("partition_id") == 0).count() == 0
    # run 2 past the timeout: escalates to lost, skips the missing range
    fake_now[0] += timeout.total_seconds() + 1.0
    run_ingress_stream(
        spark, seg_root, sink, str(tmp_path / "cp2b"), state_path,
        max_gap_retries=0, lost_segment_timeout=timeout,
        clock=lambda: fake_now[0],
    )
    state = IngressState.load(state_path)
    expected_lost = first_p0["end_offset"] - first_p0["start_offset"] + 1
    assert state.messages_lost == expected_lost
    delivered = spark.read.parquet(sink).filter(F.col("partition_id") == 0)
    assert delivered.agg(F.min("msg_offset")).collect()[0][0] == first_p0["end_offset"] + 1
