"""events → canonical message stream mapping (FIXTURES.md §5).

The driver corpus has no real Kafka topic, so the deterministic ``events``
table plays the message stream: its monotonically increasing ``event_id``
orders the stream, ``user_id % N_PARTITIONS`` assigns a stable partition
(key-hash partitioning, like Kafka's default partitioner), and the
per-partition ``row_number() - 1`` becomes a dense, gap-free ``msg_offset``
— matching a healthy Kafka partition, and required by the compaction gap
check (reference pkg/compaction/compactor.go:219-221: a missing offset is an
error, so the fixture stream must be dense).

``MESSAGES_ORACLE_CTE`` is the *same mapping in DuckDB SQL*.  Every
oracle-checked query over messages composes it, so the Spark and DuckDB
sides are derived from one definition each and verified against each other
by the driver's hash compare.  Keep the two in lockstep when editing.

Note on scale: the row_number() here is a per-partition sort used only to
synthesize offsets from the test corpus; a real deployment reads offsets
directly from the Kafka source and never sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.core.schema import message_size_col
from kafka_replicator_spark.sources.tables import load_table

N_PARTITIONS = 4
TOPIC = "events"

#: (session id, sf_dir) → cached mapping; every r_* query starts from this
#: frame, and the offset-synthesis window (a 4-key shuffle + sort) is the
#: single most expensive step of the family — pay it once per session.
_MESSAGES_CACHE: dict[tuple[int, str], DataFrame] = {}


def events_as_messages(spark: SparkSession, sf_dir: str, cached: bool = True) -> DataFrame:
    """Map the events table to the canonical message stream.

    Columns: topic, partition_id, msg_offset, msg_key, payload (string form —
    the corpus is textual JSON; cast to binary only at the segment writer),
    ts_ns, msg_size, plus passthrough event_type / event_value for queries
    that need message "content".
    """
    key = (id(spark), sf_dir.rstrip("/"))
    if cached and key in _MESSAGES_CACHE:
        return _MESSAGES_CACHE[key]
    ev = load_table(spark, sf_dir, "events")
    part = (F.col("user_id") % N_PARTITIONS).cast("int")
    w = Window.partitionBy(part).orderBy("event_id")
    out = (
        ev.select(
            F.lit(TOPIC).alias("topic"),
            part.alias("partition_id"),
            (F.row_number().over(w) - 1).cast("long").alias("msg_offset"),
            F.col("user_id").cast("string").alias("msg_key"),
            F.col("props").alias("payload"),
            F.col("ts").alias("ts_ns"),
            # microsecond view for oracle-compared outputs: DuckDB's parquet
            # reader floors TIMESTAMP(NANOS) to micros, so parity lives at µs.
            # integer `div` — double division would lose precision at 1e18.
            F.expr("ts div 1000").alias("ts_us"),
            F.col("event_id"),
            F.col("event_type"),
            F.col("value").alias("event_value"),
        )
        .withColumn("msg_size", message_size_col("msg_key", "payload", headers=None))
    )
    if cached:
        out = out.cache()
        _MESSAGES_CACHE[key] = out
    return out


#: DuckDB mirror of events_as_messages — compose as `WITH messages AS (...)`.
MESSAGES_ORACLE_CTE = f"""
SELECT
    'events' AS topic,
    CAST(user_id % {N_PARTITIONS} AS INTEGER) AS partition_id,
    CAST(row_number() OVER (PARTITION BY user_id % {N_PARTITIONS} ORDER BY event_id) - 1 AS BIGINT)
        AS msg_offset,
    CAST(user_id AS VARCHAR) AS msg_key,
    props AS payload,
    epoch_ns(ts) AS ts_ns,
    epoch_us(ts) AS ts_us,
    event_id,
    event_type,
    value AS event_value,
    CAST(16 + length(CAST(user_id AS VARCHAR)) + length(props) AS BIGINT) AS msg_size
FROM events
"""
