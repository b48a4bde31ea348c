"""Retry/backoff schedule (reference pkg/core/retrier.go, pkg/utils/time.go).

Spark's task retry subsumes most of the reference's retry machinery
(SURVEY.md §4); what remains useful driver-side is the deterministic
exponential schedule — used by the ingress late-segment policy (T6) and any
object-store listing loops.

Reference defaults: Kafka ops 100ms→1s, S3 ops 200ms→5s, 25% jitter,
retry forever (retrier.go:26-32).
"""

from __future__ import annotations

import hashlib

KAFKA_BASE_MS, KAFKA_CAP_MS = 100, 1_000
S3_BASE_MS, S3_CAP_MS = 200, 5_000
JITTER_FRACTION = 0.25


def backoff_ms(attempt: int, base_ms: int = S3_BASE_MS, cap_ms: int = S3_CAP_MS) -> int:
    """Exponential backoff with cap: ``min(base * 2^attempt, cap)``
    (reference utils/time.go:23-40).  attempt is 0-based.
    """
    from kafka_replicator_spark.core.validation import validate_backoff

    if attempt < 0:
        raise ValueError("attempt must be >= 0")
    validate_backoff(base_ms, cap_ms)
    # shift-safe: cap the exponent before computing the power
    exp = min(attempt, 63)
    return min(base_ms << exp, cap_ms)


def backoff_with_jitter_ms(
    attempt: int,
    seed: str,
    base_ms: int = S3_BASE_MS,
    cap_ms: int = S3_CAP_MS,
    jitter: float = JITTER_FRACTION,
) -> int:
    """Backoff with ±jitter, deterministic per (attempt, seed) — the
    reference jitters with math/rand (retrier.go:91-98); a seeded hash keeps
    replayability for tests and resumable drivers.
    """
    b = backoff_ms(attempt, base_ms, cap_ms)
    h = int(hashlib.md5(f"{seed}:{attempt}".encode()).hexdigest()[:8], 16)
    frac = (h % 2001 - 1000) / 1000.0  # [-1, 1]
    return max(0, int(b * (1 + jitter * frac)))
