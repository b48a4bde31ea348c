from kafka_replicator_spark.sources.tables import load_table, register_views
from kafka_replicator_spark.sources.messages import events_as_messages, MESSAGES_ORACLE_CTE
from kafka_replicator_spark.sources.segments import list_segments, read_segment_files

__all__ = [
    "load_table",
    "register_views",
    "events_as_messages",
    "MESSAGES_ORACLE_CTE",
    "list_segments",
    "read_segment_files",
]
