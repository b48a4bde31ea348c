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


def test_column_codec_agrees_with_python_codec(spark):
    """segment_path_col / parse_segment_path_cols are independent
    implementations of format_segment_path / parse_segment_path — they must
    agree on every value (FIXTURES invariant 5, both forms)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from kafka_replicator_spark.core.codec import (
        parse_segment_path_cols,
        segment_path_col,
    )

    rows = [
        ("us-east-1", "events", 0, 0, 0, 99),
        ("eu", "topic.with.dots", 107, 3, 12345, 10**15),
        ("r", "t", 2**31 - 1, 100, 2**62, 2**62 + 10**9),
    ]
    df = spark.createDataFrame(
        rows,
        schema="region string, topic string, partition_id int, level int, "
        "start_offset long, end_offset long",
    ).withColumn("path", segment_path_col("/data"))
    got = df.collect()
    for r, seg_tuple in zip(got, rows):
        seg = SegmentId(*seg_tuple)
        assert r["path"] == format_segment_path("/data", seg)
        assert parse_segment_path(r["path"]) == seg
    # column-side parse of column-side format
    parsed = df.select(F.col("path"), *[c for c in parse_segment_path_cols("path")])
    for r, seg_tuple in zip(parsed.collect(), rows):
        assert (
            r["region"], r["topic"], r["partition_id"], r["level"],
            r["start_offset"], r["end_offset"],
        ) == seg_tuple


def test_lpad_filename_equals_codec_format(spark):
    """r_path_sort_equivalence derives segment filenames via lpad — pin
    that form byte-equal to the codec's %020d format_string output."""
    from pyspark.sql import functions as F

    from kafka_replicator_spark.core.codec import segment_path_col

    df = spark.createDataFrame(
        [(0, 99), (100, 10**18), (9 * 10**18, 9 * 10**18 + 5)],
        schema="start_offset long, end_offset long",
    ).select(
        F.element_at(
            F.split(
                segment_path_col(
                    "/d",
                    region=F.lit("r"),
                    topic=F.lit("t"),
                    partition_id=F.lit(0),
                    level=F.lit(0),
                ),
                "/",
            ),
            -1,
        ).alias("codec_name"),
        F.concat(
            F.lpad(F.col("start_offset").cast("string"), 20, "0"),
            F.lit("-"),
            F.lpad(F.col("end_offset").cast("string"), 20, "0"),
        ).alias("lpad_name"),
    )
    for r in df.collect():
        assert r["codec_name"].split(".")[0] == r["lpad_name"], r
