"""Event-time SESSION windows with watermark — the gap-based sibling of
streaming/windowed.py's tumbling windows (T16 family).

The reference has no session concept (its groupings are fixed segment /
retention boundaries); sessionization exists in this repo batch-side as
the lag-gap islands idiom (a_sessionization).  Structured Streaming's
native form is ``F.session_window(event_time, gap)``: a session extends
while consecutive events arrive within ``gap``, closes when the watermark
passes its end, and MERGES sessions that late events bridge — state the
islands idiom cannot express incrementally.

Scale: session state is per (key, open session), evicted at watermark —
bounded by active keys within the horizon, not stream length; the operator
shuffles by the session keys, so key skew behaves like any keyed
aggregation.  Batch frames run the identical plan minus the watermark —
the batch run is the oracle for the streaming one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_message_stats(
    messages: DataFrame,
    gap: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Per (topic, partition, session) message stats under a ``gap``
    session window: one row per burst of traffic separated by ≥ ``gap``
    of event-time silence — the burst profile behind rollover tuning
    (a segment that outlives a burst ships mostly-empty tail time).

    Works on both batch and streaming frames; in streaming, append-mode
    emission needs the watermark to pass a session's end + gap (drive a
    far-future flush row through availableNow drains — the r09 engine
    note).
    """
    with_ts = messages.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    return (
        with_ts.groupBy(
            F.session_window("event_time", gap).alias("sess"),
            "topic",
            "partition_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum("msg_size").alias("sum_bytes"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "topic",
            "partition_id",
            "n_messages",
            "sum_bytes",
        )
    )
