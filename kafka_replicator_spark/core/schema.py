"""Canonical schemas of the engine (SURVEY.md §1.2, FIXTURES.md).

The reference's one compiled-in row type is the Kafka ``Message``
(reference pkg/core/messages.proto:68-79; parquet struct
pkg/formats/s3_parquet.go:105-116).  We carry it as a DataFrame with the
stream coordinates (topic, partition) made explicit columns, because Spark
has no ambient "current topic-partition" the way a per-partition goroutine
worker does.

Column-name choices: ``msg_offset`` / ``partition_id`` instead of the
reference's ``offset`` / ``partition`` — both are SQL keywords and the
DuckDB correctness oracle runs plain ANSI SQL over the same data.

Timestamps: the reference stores Unix *nanoseconds* as INT64
(s3_parquet.go:114,323).  Spark's TimestampType is microseconds, so the
canonical schema carries ``ts_ns`` as LongType for lossless parity; derive a
TimestampType view with ``F.timestamp_micros(F.col("ts_ns") / 1000)`` when
event-time semantics (watermarks, windows) are needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.column import Column

#: One Kafka message, plus its stream coordinates.
#: reference: pkg/core/messages.proto:68-79
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("msg_offset", T.LongType(), False),  # uint64 in ref; Kafka offsets < 2^63
        T.StructField("msg_key", T.BinaryType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("ts_ns", T.LongType(), True),  # Unix nanos; NULL = timestamp-not-available
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

#: At-rest columns inside a segment parquet file (reference parquet struct
#: pkg/formats/s3_parquet.go:99-116: offset, key, value, timestamp, headers).
#: Readers pass this explicitly so pre-headers files surface NULL headers
#: instead of steering schema inference.
SEGMENT_DATA_DDL = (
    "msg_offset long, msg_key binary, payload binary, ts_ns long, "
    "headers array<struct<key:string,value:binary>>"
)

#: Segment identity + listing info.
#: reference: pkg/core/messages.proto:28-35 (identity), pkg/core/core.go:90-94
#: (SegmentInfo = identity + LastModified + size).
SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("region", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("level", T.IntegerType(), False),  # 0 = streaming; >=1 = compacted
        T.StructField("start_offset", T.LongType(), False),  # inclusive
        T.StructField("end_offset", T.LongType(), False),  # inclusive (core.go:150-152)
        T.StructField("message_count", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("modified_ts", T.TimestampType(), True),
        T.StructField("path", T.StringType(), True),
    ]
)

#: Delivery cursor (reference pkg/core/messages.proto:49-55).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("region", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("msg_offset", T.LongType(), False),
        T.StructField("ts_ns", T.LongType(), True),
    ]
)

#: CREATED/REMOVED segment notification (messages.proto:37-47).
SEGMENT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),  # CREATED | REMOVED
        T.StructField("event_ts", T.TimestampType(), False),
        T.StructField("region", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("start_offset", T.LongType(), False),
        T.StructField("end_offset", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), True),
    ]
)

EVENT_CREATED = "CREATED"
EVENT_REMOVED = "REMOVED"


def message_size_col(
    key: str | Column = "msg_key",
    payload: str | Column = "payload",
    headers: str | Column | None = "headers",
) -> Column:
    """Accounting size of a message, exactly as the reference computes it
    against MaxSegmentSize: ``16 + len(key) + len(value) + Σ(len(hk)+len(hv))``
    (reference pkg/core/core.go:136-147).

    Pure column expression → whole-stage codegen, no UDF.
    """
    key = F.col(key) if isinstance(key, str) else key
    payload = F.col(payload) if isinstance(payload, str) else payload
    size = (
        F.lit(16)
        + F.coalesce(F.length(key), F.lit(0))
        + F.coalesce(F.length(payload), F.lit(0))
    )
    if headers is not None:
        headers = F.col(headers) if isinstance(headers, str) else headers
        size = size + F.coalesce(
            F.aggregate(
                headers,
                F.lit(0),
                lambda acc, h: acc
                + F.coalesce(F.length(h["key"]), F.lit(0))
                + F.coalesce(F.length(h["value"]), F.lit(0)),
            ),
            F.lit(0),
        )
    return size.cast(T.LongType())
