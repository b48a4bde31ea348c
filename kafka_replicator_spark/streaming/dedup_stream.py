"""Streaming duplicate-message tolerance with watermark-bounded state.

The reference tolerates duplicated segment deliveries by offset-overlap
trimming at read time (pkg/ingress/worker.go — T13, covered batch-side by
streaming/ingress_stream.py:182).  The streaming-native generalization is
``dropDuplicatesWithinWatermark``: exactly-once output per key across
microbatches while holding state ONLY for the watermark horizon — the
property that matters on an unbounded stream, where a plain
``dropDuplicates`` would accrete a key set forever.

Scale: state size is bounded by (keys arriving within the watermark
window), not stream length; the operator shuffles by the dedup key, so key
skew behaves like any keyed aggregation (salting upstream if one key
dominates).  Batch frames short-circuit to ``dropDuplicates`` — the same
semantics when the whole input is one "batch".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def watermarked_dedup(
    df: DataFrame,
    keys: list[str],
    event_time_col: str,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Drop duplicate rows per ``keys`` with state bounded by the event-time
    watermark.

    * streaming input — ``withWatermark`` + ``dropDuplicatesWithinWatermark``:
      a duplicate arriving within ``watermark_delay`` of the original's
      event time is suppressed; state for older keys is evicted.  Late
      duplicates beyond the horizon would re-emit — choose the delay to
      cover the real redelivery window (the reference's segment redelivery
      is minutes, not days).
    * batch input — plain ``dropDuplicates(keys)`` (whole-input horizon).

    ``event_time_col`` must be a TIMESTAMP column (build one with
    ``timestamp_micros(ts_us)`` from the canonical message frame).
    """
    if df.isStreaming:
        return df.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
