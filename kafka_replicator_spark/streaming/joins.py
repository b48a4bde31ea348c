"""Watermarked stream-stream interval join (§2.9 upgrade path).

The reference never joins two live streams — its only stream correlation is
the listing ∪ events overlay (J1), computed batch-side.  Structured
Streaming makes the general form first-class: two watermarked streams,
an equi-key plus an event-time interval predicate, state bounded by the
watermark.  This module provides the engine's canonical shape — correlate
each left event with right events that follow it within ``max_delay`` —
used e.g. to attribute a purchase to the view that preceded it, or a
checkpoint publish to the segment event that triggered it.

Works identically on batch frames (no watermark), which is the oracle for
the streaming run — the parity test drives both and compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    max_delay: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` when they share ``on``
    keys and ``right_ts`` falls in ``(left_ts, left_ts + max_delay]``.

    On streaming inputs both sides get a watermark — REQUIRED for the state
    store to evict: without the interval bound + watermarks the join state
    grows forever (the classic unbounded stream-join failure).  At scale
    the state per key is bounded by ``watermark_delay + max_delay`` of
    traffic, independent of stream length.

    ``how="leftOuter"`` additionally emits a null-padded row for each left
    row that found no partner — but ONLY once the combined watermark
    passes the end of that row's join window (``left_ts + max_delay``),
    because until then a partner could still arrive.  Consequence under
    ``availableNow`` drains: Spark's trailing no-data batch advances the
    watermark to ``min(max left ts, max right ts) − watermark_delay`` and
    flushes expired state, so unmatched rows CLOSER than
    ``watermark_delay + max_delay`` to the stream head keep their state
    and never emit their null row in that run — they would on the next
    incremental run.  The batch form of the same plan (the oracle) has no
    watermark and emits every null row.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark_delay)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark_delay)
    cond = (lt < rt) & (rt <= lt + F.expr(f"INTERVAL {max_delay}"))
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return left.alias("l").join(right.alias("r"), cond, how)
