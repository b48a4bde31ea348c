"""Property test of the greedy rollover (reference isFull semantics,
pkg/egress/worker.go:51-56) over randomized message sizes."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.operators.egress import assign_segments_greedy, segment_bounds


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=120),
    max_bytes=st.integers(min_value=100, max_value=20000),
    max_messages=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=25, deadline=None)
def test_greedy_invariants(spark_global, sizes, max_bytes, max_messages):
    spark = spark_global
    rows = [("t", 0, i, b"k", b"v", 0, int(s)) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(
        rows,
        schema="topic string, partition_id int, msg_offset long, msg_key binary, "
        "payload binary, ts_ns long, msg_size long",
    )
    tagged = assign_segments_greedy(df, max_bytes=max_bytes, max_messages=max_messages)
    segs = sorted(
        segment_bounds(tagged, region="r").collect(), key=lambda r: r["start_offset"]
    )
    # invariants (worker.go:51-56): every non-final segment crossed a
    # threshold; no segment exceeds max_messages; removing its last message
    # would put it back under max_bytes; contiguity.
    for seg in segs:
        assert seg["message_count"] <= max_messages
    for seg in segs[:-1]:
        assert seg["size_bytes"] >= max_bytes or seg["message_count"] == max_messages
    for seg in segs:
        if seg["size_bytes"] >= max_bytes and seg["message_count"] > 1:
            last_size = sizes[seg["end_offset"]]
            assert seg["size_bytes"] - last_size < max_bytes
    for a, b in zip(segs, segs[1:]):
        assert b["start_offset"] == a["end_offset"] + 1
    assert segs[0]["start_offset"] == 0
    assert segs[-1]["end_offset"] == len(sizes) - 1


@given(
    starts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200),
    probes=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50),
)
@settings(max_examples=25, deadline=None)
def test_bsearch_matches_linear_scan(spark_global, starts, probes):
    """The fixed-depth binary-search fold must agree with the linear
    greatest-boundary-≤-offset definition for any sorted boundary array."""
    from kafka_replicator_spark.operators.egress import _bsearch_segment_seq

    spark = spark_global
    seg_starts = sorted(set(starts))
    lo = seg_starts[0]
    probes = [max(p, lo) for p in probes]  # offsets never precede boundary 0
    df = spark.createDataFrame(
        [(p, seg_starts) for p in probes], "msg_offset long, seg_starts array<bigint>"
    )
    got = {r["msg_offset"]: r["seq"] for r in df.select(
        "msg_offset", _bsearch_segment_seq().alias("seq")
    ).collect()}
    import bisect

    for p in probes:
        assert got[p] == bisect.bisect_right(seg_starts, p) - 1


def test_greedy_assignment_caps_per_row_cost(spark, messages):
    """Plan pin: the assignment is hybrid — a bounded linear scan for small
    boundary arrays, the binary-search fold past _LINEAR_SCAN_MAX — so
    per-row cost is capped at O(log K), never unbounded O(K)."""
    tagged = assign_segments_greedy(messages, max_bytes=4096, max_messages=100)
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    # the binary-search fold must be present as the large-K branch
    # (its sequence(1,N) literal is constant-folded into an array literal)
    assert "aggregate(" in plan and "seg_starts" in plan

    # and the hybrid must actually dispatch on array size: a probe against a
    # >_LINEAR_SCAN_MAX boundary array agrees with bisect
    import bisect

    from kafka_replicator_spark.operators.egress import _segment_seq_expr

    starts = [i * 10 for i in range(100)]
    df = spark.createDataFrame(
        [(995, starts), (5, starts)], "msg_offset long, seg_starts array<bigint>"
    )
    got = {r["msg_offset"]: r["seq"] for r in df.select(
        "msg_offset", _segment_seq_expr().alias("seq")
    ).collect()}
    assert got[995] == bisect.bisect_right(starts, 995) - 1
    assert got[5] == 0


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
