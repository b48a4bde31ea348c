"""Checkpoint store semantics (reference pkg/stores/checkpoint_store.go).

The reference materializes a last-value-per-key map from a log-compacted
Kafka topic with a monotonic update rule (``new.offset > current.offset``,
checkpoint_store.go:219-237), then point-looks-up cursors per partition.
Declaratively these are small argmax aggregations and broadcast joins over
*metadata-scale* data — the message-scale side never shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["region", "topic", "partition_id"]


def latest_checkpoints(updates: DataFrame, ts_col: str = "ts_ns") -> DataFrame:
    """Fold a stream of checkpoint updates to the last-write-wins state (A6).

    Monotonicity rule per reference checkpoint_store.go:219-237: the largest
    offset wins; lower/equal updates are ignored.  ``max(struct(...))``
    keeps the aggregation partial-aggregable (map-side combine) and makes
    the ts tie-break deterministic.
    """
    return (
        updates.groupBy(*KEY)
        .agg(F.max(F.struct("msg_offset", ts_col)).alias("_s"))
        .select(
            *KEY,
            F.col("_s.msg_offset").alias("msg_offset"),
            F.col(f"_s.{ts_col}").alias(ts_col),
        )
    )


def apply_checkpoint_updates(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Merge new updates into existing checkpoint state, keeping the greater
    offset (the store's Save path, checkpoint_store.go:150-168,219-237).
    """
    return latest_checkpoints(current.unionByName(updates))


def filter_foreign_region(df: DataFrame, local_region: str) -> DataFrame:
    """F7: a region never consumes its own region's checkpoints/events
    (reference checkpoint_store.go:130-133, ingress controller.go:100-102).
    """
    return df.filter(F.col("region") != F.lit(local_region))


def compacted_topic_state(
    df: DataFrame, key_cols: list[str], order_col: str, value_cols: list[str]
) -> DataFrame:
    """S5: replay a log-compacted topic to its end state — last value per
    key, dropping keys whose final record is a tombstone (null value, F8,
    checkpoint_store.go:187-190).
    """
    pairs = (
        df.groupBy(*key_cols)
        .agg(F.max(F.struct(F.col(order_col), *[F.col(c) for c in value_cols])).alias("_s"))
        .select(*key_cols, *[F.col(f"_s.{c}").alias(c) for c in value_cols])
    )
    cond = None
    for c in value_cols:
        c_ok = F.col(c).isNotNull()
        cond = c_ok if cond is None else (cond | c_ok)
    return pairs.filter(cond)


def resume_filter(messages: DataFrame, checkpoints: DataFrame) -> DataFrame:
    """T9/F1: deliver exactly offsets > checkpoint per (topic, partition);
    partitions without a checkpoint replay from the beginning
    (reference pkg/ingress/worker.go:110-127,390-396).

    Broadcast join — checkpoints are metadata-scale; the message side keeps
    its partitioning (no shuffle).
    """
    cps = checkpoints.select(
        F.col("topic").alias("_cp_topic"),
        F.col("partition_id").alias("_cp_part"),
        F.col("msg_offset").alias("_cp_offset"),
    )
    return (
        messages.join(
            F.broadcast(cps),
            (messages["topic"] == cps["_cp_topic"])
            & (messages["partition_id"] == cps["_cp_part"]),
            "left",
        )
        .filter(F.col("_cp_offset").isNull() | (F.col("msg_offset") > F.col("_cp_offset")))
        .drop("_cp_topic", "_cp_part", "_cp_offset")
    )


def prune_processed_segments(segments: DataFrame, checkpoints: DataFrame) -> DataFrame:
    """F2: drop segments entirely at-or-below the checkpoint
    (``end_offset <= checkpoint``, reference pkg/ingress/worker.go:484-489).
    Broadcast metadata join.
    """
    cps = checkpoints.select(
        F.col("topic").alias("_cp_topic"),
        F.col("partition_id").alias("_cp_part"),
        F.col("msg_offset").alias("_cp_offset"),
    )
    return (
        segments.join(
            F.broadcast(cps),
            (segments["topic"] == cps["_cp_topic"])
            & (segments["partition_id"] == cps["_cp_part"]),
            "left",
        )
        .filter(F.col("_cp_offset").isNull() | (F.col("end_offset") > F.col("_cp_offset")))
        .drop("_cp_topic", "_cp_part", "_cp_offset")
    )


def checkpoint_key_col():
    """K3: stable message key for log compaction — ``region:topic:partition``
    (reference checkpoint_store.go:253-255)."""
    return F.concat_ws(
        ":", F.col("region"), F.col("topic"), F.col("partition_id").cast("string")
    ).alias("cp_key")


def publish_checkpoints(updates: DataFrame, log_dir: str) -> None:
    """K3 keyed checkpoint publish: append updates to a compacted-topic-style
    parquet log (key + monotonically usable order column).  With a real
    broker this is a Kafka sink write with ``cp_key`` as the message key to
    a log-compacted topic.
    """
    (
        updates.select(checkpoint_key_col(), *updates.columns)
        .write.mode("append")
        .parquet(log_dir)
    )


def load_checkpoint_log(spark, log_dir: str) -> DataFrame:
    """S5 replay of the checkpoint log to current state: last update per key
    by offset (the monotonic rule collapses to argmax over the log)."""
    log = spark.read.parquet(log_dir)
    return latest_checkpoints(log.drop("cp_key"))
