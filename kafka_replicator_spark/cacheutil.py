"""Session-scoped registry for operator-internal cached frames.

A few operators pin a ``.cache()`` on an intermediate frame whose content
must stay stable across two jobs of the same plan build (e.g. the
range-placement frame in ``functions.textstats.curriculum_buckets`` — the
rank offsets collected in job 1 are only valid against the exact partition
placement job 2 reuses, so the frame must NOT be recomputed with fresh
range-boundary samples).  Those frames cannot be unpersisted inside the
operator — the returned plan is lazy and still references them — but a
long-lived session (bench best-of-2 loops, correctness reruns) would
otherwise accumulate one pinned frame per invocation.

``track_cached`` registers such frames; callers release them with
``release_cached()`` after the output action completes (bench.py does this
between queries).  Releasing is always safe for *results*: it only costs
recomputation — and for placement-sensitive frames, only if the caller
re-executes a previously returned lazy plan afterwards, which the operators
document as unsupported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_cached(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for later bulk release."""
    df.cache()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
