"""Property tests for the segment path codec (FIXTURES.md invariant 5)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.core.codec import (
    SegmentId,
    format_segment_path,
    parse_segment_path,
)

names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_-."),
    min_size=1,
    max_size=30,
).filter(lambda s: "/" not in s)


@given(
    region=names,
    topic=names,
    partition_id=st.integers(min_value=0, max_value=2**31 - 1),
    level=st.integers(min_value=0, max_value=100),
    start=st.integers(min_value=0, max_value=2**62),
    length=st.integers(min_value=0, max_value=10**9),
    prefix=st.sampled_from(["/data", "s3://bucket/prefix", "root", "/a/b/c"]),
)
@settings(max_examples=200, deadline=None)
def test_roundtrip(region, topic, partition_id, level, start, length, prefix):
    seg = SegmentId(region, topic, partition_id, level, start, start + length)
    assert parse_segment_path(format_segment_path(prefix, seg)) == seg


def test_lexicographic_order_matches_numeric():
    seg_a = SegmentId("r", "t", 0, 0, 9, 99)
    seg_b = SegmentId("r", "t", 0, 0, 10, 100)
    seg_c = SegmentId("r", "t", 0, 0, 100, 1000)
    paths = [format_segment_path("/x", s) for s in (seg_c, seg_a, seg_b)]
    assert sorted(paths) == [format_segment_path("/x", s) for s in (seg_a, seg_b, seg_c)]


def test_parse_rejects_garbage():
    import pytest

    for bad in ["/x/region/topic/0/0/123-456", "/x/a/b/c/d/e", "plain.parquet"]:
        with pytest.raises(ValueError):
            parse_segment_path(bad)
