"""Segment path codec — S3/FS key layout ↔ segment identity.

Key layout (reference pkg/stores/s3_segment_store.go:36-37, README.md:199-215):

    {prefix}/{region}/{topic}/{partition}/{level}/{start:020d}-{end:020d}

Offsets are zero-padded to 20 digits so lexicographic order == numeric order
— that property is what lets an object-store LIST return segments in offset
order, and we preserve it.  Provided both as pure-Python functions (driver
metadata work, property-tested round-trip) and as column expressions
(distributed: derive segment identity from ``input_file_name()`` on a read,
reference parse at s3_segment_store.go:320-371).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: filename suffix for the parquet objects this engine writes (the reference
#: writes bare `start-end` keys; an extension keeps Spark/pyarrow happy).
SEGMENT_SUFFIX = ".parquet"

_PATH_RE = re.compile(
    r"(?P<prefix>.*?)/?"
    r"(?P<region>[^/]+)/(?P<topic>[^/]+)/(?P<partition>\d+)/(?P<level>\d+)/"
    r"(?P<start>\d{20})-(?P<end>\d{20})(?:\.parquet)?$"
)

#: regexp used Spark-side over input_file_name(); group numbers match
#: parse_segment_path_cols below.
PATH_COL_RE = r"^.*?([^/]+)/([^/]+)/(\d+)/(\d+)/(\d{20})-(\d{20})(?:\.parquet)?$"


@dataclass(frozen=True)
class SegmentId:
    """Identity tuple of a segment (reference messages.proto:28-35)."""

    region: str
    topic: str
    partition_id: int
    level: int
    start_offset: int
    end_offset: int


def format_segment_path(prefix: str, seg: SegmentId, suffix: str = SEGMENT_SUFFIX) -> str:
    """Format a segment path (reference s3_segment_store.go:244-258)."""
    return (
        f"{prefix.rstrip('/')}/{seg.region}/{seg.topic}/{seg.partition_id}/"
        f"{seg.level}/{seg.start_offset:020d}-{seg.end_offset:020d}{suffix}"
    )


def parse_segment_path(path: str) -> SegmentId:
    """Parse a segment path back to its identity
    (reference s3_segment_store.go:320-371).  Raises ValueError on mismatch.
    """
    m = _PATH_RE.match(path)
    if m is None:
        raise ValueError(f"not a segment path: {path!r}")
    return SegmentId(
        region=m.group("region"),
        topic=m.group("topic"),
        partition_id=int(m.group("partition")),
        level=int(m.group("level")),
        start_offset=int(m.group("start")),
        end_offset=int(m.group("end")),
    )


def segment_path_col(
    prefix: str | Column,
    region: str | Column = "region",
    topic: str | Column = "topic",
    partition_id: str | Column = "partition_id",
    level: str | Column = "level",
    start_offset: str | Column = "start_offset",
    end_offset: str | Column = "end_offset",
    suffix: str = SEGMENT_SUFFIX,
) -> Column:
    """Column-expression form of :func:`format_segment_path` — JVM-side
    ``format_string`` so path derivation runs inside codegen at scale.
    """
    as_col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    prefix_col = F.lit(prefix.rstrip("/")) if isinstance(prefix, str) else prefix
    return F.format_string(
        "%s/%s/%s/%d/%d/%020d-%020d" + suffix,
        prefix_col,
        as_col(region),
        as_col(topic),
        as_col(partition_id).cast("long"),
        as_col(level).cast("long"),
        as_col(start_offset),
        as_col(end_offset),
    )


def parse_segment_path_cols(path: Column | str = None) -> list[Column]:
    """Derive segment-identity columns from a path column (default:
    ``input_file_name()``) — the distributed parse used when reading many
    segment files at once.  Returns columns aliased to SEGMENT_SCHEMA names.
    """
    if path is None:
        path = F.input_file_name()
    elif isinstance(path, str):
        path = F.col(path)
    return [
        F.regexp_extract(path, PATH_COL_RE, 1).alias("region"),
        F.regexp_extract(path, PATH_COL_RE, 2).alias("topic"),
        F.regexp_extract(path, PATH_COL_RE, 3).cast("int").alias("partition_id"),
        F.regexp_extract(path, PATH_COL_RE, 4).cast("int").alias("level"),
        F.regexp_extract(path, PATH_COL_RE, 5).cast("long").alias("start_offset"),
        F.regexp_extract(path, PATH_COL_RE, 6).cast("long").alias("end_offset"),
    ]
