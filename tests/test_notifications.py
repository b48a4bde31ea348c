"""S4 notification parsing (sources/notifications.py) — the reference's
SQS S3-event handling matrix (sqs_segment_event_source.go:297-371): valid
created/removed, unknown source/name, bad time, bad key, %-encoding, the
poison-message receive cap, and the hand-off into the J1 overlay."""

import json

from pyspark.sql import functions as F

from kafka_replicator_spark.operators.consistent import consistent_listing
from kafka_replicator_spark.sources.notifications import parse_s3_notification_events


def _body(records):
    return json.dumps({"Records": records})


def _record(name="ObjectCreated:Put", key=None, time="2024-03-19T17:44:04.772Z",
            source="aws:s3", size=1024):
    if key is None:
        key = "prefix/us-east-1/topic-a/3/0/" + "0" * 20 + "-" + "0" * 19 + "9.parquet"
    return {
        "eventSource": source,
        "eventName": name,
        "eventTime": time,
        "s3": {"object": {"key": key, "size": size}},
    }


def _parse(spark, bodies, **kw):
    df = spark.createDataFrame([(b,) for b in bodies], "body string")
    return parse_s3_notification_events(df, **kw)


def test_created_and_removed_parse(spark):
    out = _parse(
        spark,
        [_body([_record(), _record(name="ObjectRemoved:Delete", size=0)])],
    ).collect()
    assert {r["event_type"] for r in out} == {"CREATED", "REMOVED"}
    r = next(r for r in out if r["event_type"] == "CREATED")
    assert (r["region"], r["topic"], r["partition_id"], r["level"]) == ("us-east-1", "topic-a", 3, 0)
    assert (r["start_offset"], r["end_offset"]) == (0, 9)
    assert r["size_bytes"] == 1024
    assert r["event_ts"].year == 2024


def test_invalid_records_skip_not_fail(spark):
    """One body with five records: only the valid one survives; each invalid
    record is reason-tagged (the reference's per-record invalid meter)."""
    body = _body([
        _record(),
        _record(source="aws:sns"),
        _record(name="ObjectRestore:Completed"),
        _record(time="not-a-time"),
        _record(key="not/a/segment/key.txt"),
    ])
    valid = _parse(spark, [body]).collect()
    assert len(valid) == 1 and valid[0]["event_type"] == "CREATED"
    flagged = _parse(spark, [body], keep_invalid=True).collect()
    reasons = sorted(r["invalid_reason"] for r in flagged if not r["valid"])
    assert reasons == [
        "invalid_event_time", "invalid_segment_key",
        "unknown_event_name", "unknown_event_source",
    ]


def test_non_notification_body_is_invalid_row(spark):
    """An s3:TestEvent (or any non-notification JSON) yields one invalid
    row, not a crash."""
    out = _parse(spark, ['{"Service":"Amazon S3","Event":"s3:TestEvent"}'],
                 keep_invalid=True).collect()
    assert len(out) == 1 and not out[0]["valid"]
    assert out[0]["invalid_reason"] == "not_s3_event_json"


def test_url_encoded_key_decodes(spark):
    key = "p/us-east-1/topic%2Da/0/0/" + "0" * 20 + "-" + "0" * 19 + "5.parquet"
    out = _parse(spark, [_body([_record(key=key)])]).collect()
    assert out[0]["topic"] == "topic-a"


def test_receive_count_poison_guard(spark):
    df = spark.createDataFrame(
        [(_body([_record()]), 1), (_body([_record()]), 4)],
        "body string, receives int",
    )
    out = parse_s3_notification_events(
        df, receive_count_col="receives", max_receives=3
    ).collect()
    assert len(out) == 1  # the 4th receive is dropped (default cap 3)


def test_events_feed_consistency_overlay(spark):
    """Parsed CREATED events add unlisted segments; REMOVED hides listed
    ones — end-to-end into operators/consistent.py (J1)."""
    listed_key = "p/r1/t/0/0/" + "0" * 20 + "-" + "0" * 19 + "9.parquet"
    new_key = "p/r1/t/0/0/" + "0" * 18 + "10-" + "0" * 18 + "19.parquet"
    events = _parse(spark, [_body([
        _record(name="ObjectRemoved:Delete", key=listed_key),
        _record(name="ObjectCreated:Put", key=new_key),
    ])])
    from datetime import datetime

    listing = spark.createDataFrame(
        [("r1", "t", 0, 0, 0, 9, "/seg/a.parquet", 10, 4096,
          datetime(2024, 3, 19, 12, 0, 0))],
        "region string, topic string, partition_id int, level int, "
        "start_offset long, end_offset long, path string, "
        "message_count long, size_bytes long, modified_ts timestamp",
    )
    out = consistent_listing(listing, events).collect()
    assert [(r["start_offset"], r["end_offset"]) for r in out] == [(10, 19)]
    assert out[0]["size_bytes"] == 1024  # size carried from the CREATED event


def test_streaming_mode_parse(spark, tmp_path):
    """The parser is pure column expressions, so the same call works on a
    readStream frame (the docstring's streaming claim, proven)."""
    import os

    src = tmp_path / "bodies"
    os.makedirs(src)
    (src / "b1.txt").write_text(_body([_record()]))
    stream = spark.readStream.format("text").schema("value string").load(str(src))
    parsed = parse_s3_notification_events(stream, body_col="value")
    assert parsed.isStreaming
    sink = str(tmp_path / "sink")
    (
        parsed.writeStream.option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start(sink)
        .awaitTermination()
    )
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "CREATED"
    assert rows[0]["topic"] == "topic-a"
