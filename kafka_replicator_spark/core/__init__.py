from kafka_replicator_spark.core.schema import (
    CHECKPOINT_SCHEMA,
    MESSAGE_SCHEMA,
    SEGMENT_EVENT_SCHEMA,
    SEGMENT_SCHEMA,
    message_size_col,
)
from kafka_replicator_spark.core.codec import (
    format_segment_path,
    parse_segment_path,
    segment_path_col,
    parse_segment_path_cols,
)

__all__ = [
    "MESSAGE_SCHEMA",
    "SEGMENT_SCHEMA",
    "CHECKPOINT_SCHEMA",
    "SEGMENT_EVENT_SCHEMA",
    "message_size_col",
    "format_segment_path",
    "parse_segment_path",
    "segment_path_col",
    "parse_segment_path_cols",
]
