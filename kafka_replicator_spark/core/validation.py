"""Plan-time config validation (reference pkg/utils/validation.go:53-60 —
tag-driven required/min/max checks run once at replicator construction,
replicator.go:48-83).

The reference rejects a bad config before any worker starts; the Spark
analog is validating operator kwargs when the plan is declared, so a bad
``min_count/max_bytes`` combination fails with an actionable message
instead of surfacing as a wrong plan or a late executor error.
"""

from __future__ import annotations

from datetime import timedelta


def require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(f"invalid config: {msg}")


def validate_segment_limits(max_bytes: int, max_messages: int) -> None:
    """Egress rollover thresholds (reference pkg/egress/config.go:28-34)."""
    require(max_bytes > 0, f"max_bytes must be > 0, got {max_bytes}")
    require(max_messages > 0, f"max_messages must be > 0, got {max_messages}")


def validate_compaction_config(
    min_level: int,
    max_level: int,
    min_count: int,
    max_count: int,
    min_bytes: int,
    max_bytes: int,
    min_age: timedelta | None = None,
) -> None:
    """Compaction planner envelope (reference pkg/compaction/config.go:29-39
    + validation tags)."""
    require(min_level >= 0, f"min_level must be >= 0, got {min_level}")
    require(
        min_level <= max_level,
        f"min_level ({min_level}) must be <= max_level ({max_level})",
    )
    require(min_count >= 1, f"min_count must be >= 1, got {min_count}")
    require(
        min_count <= max_count,
        f"min_count ({min_count}) must be <= max_count ({max_count})",
    )
    require(min_bytes >= 1, f"min_bytes must be >= 1, got {min_bytes}")
    require(
        min_bytes <= max_bytes,
        f"min_bytes ({min_bytes}) must be <= max_bytes ({max_bytes})",
    )
    if min_age is not None:
        require(
            min_age >= timedelta(0), f"min_age must be >= 0, got {min_age}"
        )


def validate_ingress_config(
    max_gap_retries: int,
    first_segment_delay_batches: int,
    first_segment_delay: timedelta | None = None,
    lost_segment_timeout: timedelta | None = None,
) -> None:
    """Ingress late/lost + T5 gate knobs (reference pkg/ingress/config.go:32-40
    — durations: FirstSegmentDelay 30 min, LostSegmentTimeout 24 h — plus
    the batch-cadence analogs this engine adds for availableNow replays)."""
    require(
        max_gap_retries >= 0, f"max_gap_retries must be >= 0, got {max_gap_retries}"
    )
    require(
        first_segment_delay_batches >= 0,
        f"first_segment_delay_batches must be >= 0, got {first_segment_delay_batches}",
    )
    if first_segment_delay is not None:
        require(
            first_segment_delay >= timedelta(0),
            f"first_segment_delay must be >= 0, got {first_segment_delay}",
        )
    if lost_segment_timeout is not None:
        require(
            lost_segment_timeout > timedelta(0),
            f"lost_segment_timeout must be > 0, got {lost_segment_timeout}",
        )


def validate_backoff(base_ms: int, cap_ms: int) -> None:
    """Retry schedule (reference pkg/core/retrier.go:26-32)."""
    require(base_ms > 0, f"base_ms must be > 0, got {base_ms}")
    require(cap_ms >= base_ms, f"cap_ms ({cap_ms}) must be >= base_ms ({base_ms})")
