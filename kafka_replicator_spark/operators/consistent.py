"""Consistent segment listing — listing ∪ events overlay (J1/A7/T10).

The reference's ConsistentSegmentStore decorates the S3 listing with a
recent-events overlay to beat S3 eventual consistency
(pkg/stores/consistent_segment_store.go:178-217): CREATED events add
segments the listing hasn't shown yet; REMOVED events hide segments the
listing still shows.  This is the reference's only real join, and it is
metadata-scale → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.core.schema import EVENT_CREATED, EVENT_REMOVED

SEG_KEY = ["region", "topic", "partition_id", "level", "start_offset", "end_offset"]


def last_event_per_segment(events: DataFrame) -> DataFrame:
    """A7: last-write-wins event per segment identity; on an event-time tie
    REMOVED beats CREATED (reference consistent_segment_store.go:361-380).
    """
    w = Window.partitionBy(*SEG_KEY).orderBy(
        F.desc("event_ts"),
        F.desc(F.col("event_type") == EVENT_REMOVED),
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def expire_events(events: DataFrame, now, retention) -> DataFrame:
    """T10: drop overlay events older than the retention window (the
    reference expires entries on a 1-minute background sweep,
    consistent_segment_store.go:323-397).  ``now``/``retention`` are
    driver-supplied (processing-time policy, like the reference).
    """
    cutoff = now - retention
    return events.filter(F.col("event_ts") > F.lit(cutoff))


def consistent_listing(listing: DataFrame, events: DataFrame) -> DataFrame:
    """J1: reconcile the (possibly stale) listing with the events overlay.

    full-outer-join on the 6-column segment identity; resolution:
      * listed + no event            → keep (steady state)
      * listed + last event REMOVED  → drop (deletion not yet visible)
      * listed + last event CREATED  → keep
      * unlisted + last event CREATED→ add (creation not yet visible),
        size from the event
    Both sides are metadata-scale; Spark will broadcast the smaller.
    """
    last = last_event_per_segment(events).select(
        *[F.col(c).alias(f"_ev_{c}") for c in SEG_KEY],
        F.col("event_type").alias("_ev_type"),
        F.col("size_bytes").alias("_ev_size"),
        F.col("event_ts").alias("_ev_ts"),
    )
    cond = None
    for c in SEG_KEY:
        eq = listing[c] == last[f"_ev_{c}"]
        cond = eq if cond is None else (cond & eq)
    joined = listing.join(F.broadcast(last), cond, "full_outer")

    listed = F.col("path").isNotNull()
    resolved = joined.filter(
        (listed & (F.col("_ev_type").isNull() | (F.col("_ev_type") != EVENT_REMOVED)))
        | (~listed & (F.col("_ev_type") == EVENT_CREATED))
    )
    return resolved.select(
        *[
            F.coalesce(F.col(c), F.col(f"_ev_{c}")).alias(c)
            for c in SEG_KEY
        ],
        F.col("message_count"),
        F.coalesce(F.col("size_bytes"), F.col("_ev_size")).alias("size_bytes"),
        F.coalesce(F.col("modified_ts"), F.col("_ev_ts")).alias("modified_ts"),
        F.col("path"),
    )
