"""Consistent listing scenario corpus — mirrors the reference's
tests/consistent_segment_store_test.go: overlay add/remove/recreate,
event ordering, stale-event skip, retention expiry.
"""

from pyspark.sql import functions as F

from kafka_replicator_spark.operators.consistent import (
    consistent_listing,
    expire_events,
    last_event_per_segment,
)

LISTING_SCHEMA = (
    "region string, topic string, partition_id int, level int, "
    "start_offset long, end_offset long, message_count long, size_bytes long, "
    "modified_ts long, path string"
)
EVENT_SCHEMA = (
    "event_type string, event_ts long, region string, topic string, "
    "partition_id int, level int, start_offset long, end_offset long, size_bytes long"
)


def _listing(spark, rows):
    return spark.createDataFrame(rows, schema=LISTING_SCHEMA)


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=EVENT_SCHEMA)


SEG_A = ("r", "t", 0, 0, 0, 9)
SEG_B = ("r", "t", 0, 0, 10, 19)


def _lrow(seg, path):
    return (*seg, 10, 100, 1000, path)


def test_created_event_adds_unlisted_segment(spark):
    """consistent_segment_store_test.go:139-232: a CREATED event surfaces a
    segment the listing doesn't show yet."""
    listing = _listing(spark, [_lrow(SEG_A, "a")])
    events = _events(spark, [("CREATED", 5, *SEG_B, 100)])
    got = {r["start_offset"]: r for r in consistent_listing(listing, events).collect()}
    assert set(got) == {0, 10}
    assert got[10]["path"] is None and got[10]["size_bytes"] == 100


def test_removed_event_hides_listed_segment(spark):
    listing = _listing(spark, [_lrow(SEG_A, "a"), _lrow(SEG_B, "b")])
    events = _events(spark, [("REMOVED", 5, *SEG_B, 100)])
    got = [r["start_offset"] for r in consistent_listing(listing, events).collect()]
    assert got == [0]


def test_recreate_after_remove_keeps_segment(spark):
    """removed-then-recreated: a newer CREATED wins over an older REMOVED."""
    listing = _listing(spark, [_lrow(SEG_A, "a")])
    events = _events(
        spark,
        [("REMOVED", 5, *SEG_A, 100), ("CREATED", 7, *SEG_A, 100)],
    )
    got = [r["start_offset"] for r in consistent_listing(listing, events).collect()]
    assert got == [0]


def test_stale_event_ordering_removed_wins_tie(spark):
    """event ordering (:233-408): on an equal timestamp REMOVED beats
    CREATED; an older REMOVED loses to a newer CREATED."""
    events = _events(
        spark,
        [
            ("CREATED", 5, *SEG_A, 100),
            ("REMOVED", 5, *SEG_A, 100),  # tie → REMOVED
            ("REMOVED", 3, *SEG_B, 100),
            ("CREATED", 6, *SEG_B, 100),  # newer → CREATED
        ],
    )
    last = {r["start_offset"]: r["event_type"] for r in last_event_per_segment(events).collect()}
    assert last == {0: "REMOVED", 10: "CREATED"}


def test_retention_expiry(spark):
    """retention expiry (:409-457): events older than the window drop out
    of the overlay, so the raw listing wins again."""
    listing = _listing(spark, [_lrow(SEG_A, "a")])
    events = _events(spark, [("REMOVED", 5, *SEG_A, 100)])
    fresh = expire_events(events, now=10, retention=3)  # cutoff 7 → expired
    got = [r["start_offset"] for r in consistent_listing(listing, fresh).collect()]
    assert got == [0]
    kept = expire_events(events, now=6, retention=3)  # cutoff 3 → retained
    assert consistent_listing(listing, kept).count() == 0


def test_duplicate_created_events_idempotent(spark):
    listing = _listing(spark, [_lrow(SEG_A, "a")])
    events = _events(
        spark,
        [("CREATED", 5, *SEG_B, 100), ("CREATED", 5, *SEG_B, 100), ("CREATED", 6, *SEG_B, 100)],
    )
    got = consistent_listing(listing, events)
    assert got.count() == 2  # T13: duplicates collapse
