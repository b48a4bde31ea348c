"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke slice;
``queries()`` / ``oracle_sql()`` — the registered operator inventory
(kafka_replicator_spark/queries/) paired with DuckDB oracles for the
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full segment lifecycle on the sf0.001
    message stream — egress rollover write → listing → compaction merge →
    ordered replay — returning a per-partition reconciliation summary
    (row counts and offset extents at each stage; `lifecycle_ok` must be
    true on every row).
    """
    import tempfile

    from pyspark.sql import functions as F

    from kafka_replicator_spark.operators.compaction import compact
    from kafka_replicator_spark.operators.egress import assign_segments_greedy, write_segments
    from kafka_replicator_spark.sources.messages import events_as_messages
    from kafka_replicator_spark.sources.segments import read_segment_files

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    root = tempfile.mkdtemp(prefix="krs_entry_")
    msgs = events_as_messages(spark, SF_SMOKE)
    tagged = assign_segments_greedy(msgs, max_bytes=8192, max_messages=200)
    written = write_segments(tagged, root=root, region="local", level=0)
    n_segments = written.count()  # force the write

    compacted = compact(spark, root, region="local", min_count=2, min_bytes=1)
    paths = [r["path"] for r in compacted.collect()]
    replay = read_segment_files(spark, paths)

    src = msgs.groupBy("topic", "partition_id").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.min("msg_offset").alias("src_lo"),
        F.max("msg_offset").alias("src_hi"),
    )
    got = replay.groupBy("topic", "partition_id").agg(
        F.count(F.lit(1)).alias("n_replayed"),
        F.min("msg_offset").alias("replay_lo"),
        F.max("msg_offset").alias("replay_hi"),
    )
    return (
        src.join(got, ["topic", "partition_id"])
        .withColumn("n_level0_segments_written", F.lit(n_segments))
        .withColumn(
            "lifecycle_ok",
            (F.col("n_src") == F.col("n_replayed"))
            & (F.col("src_lo") == F.col("replay_lo"))
            & (F.col("src_hi") == F.col("replay_hi")),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline extensions).  Each callable takes
    (spark, sf_dir) and returns a DataFrame aligned with ``oracle_sql``.
    """
    from kafka_replicator_spark.queries import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    from kafka_replicator_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
