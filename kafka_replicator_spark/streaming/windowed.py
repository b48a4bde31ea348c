"""Event-time windowed aggregation with watermark (T16).

The reference gates everything on processing time (age timers, delays,
retention) — SURVEY.md §2.9 T16 flags true event-time watermarks as the
Spark-native upgrade.  This operator provides it: tumbling-window counts/
sums over the message stream's event time with bounded lateness, the
streaming form of the engine's windowed aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    messages: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts_ns",
) -> DataFrame:
    """Tumbling event-time windows over the stream: per (window, topic,
    partition) row count + value stats; late rows beyond the watermark are
    dropped by the engine (the reference's analog T6/T7 policy is
    processing-time, see streaming/ingress_stream.py).

    Works on both batch and streaming frames — the batch run is the oracle
    for the streaming one (same plan minus the watermark).
    """
    # integer `div` — double division loses precision on epoch-nano longs
    with_ts = messages.withColumn(
        "event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("event_time", watermark_delay)
    return (
        with_ts.groupBy(
            F.window("event_time", window_duration).alias("win"),
            "topic",
            "partition_id",
        )
        .agg(F.count(F.lit(1)).alias("n_messages"), F.sum("msg_size").alias("sum_bytes"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "topic",
            "partition_id",
            "n_messages",
            "sum_bytes",
        )
    )
