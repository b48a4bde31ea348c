"""SparkSession factory with the engine's required configuration.

Every config here is load-bearing:
  * ``spark.sql.session.timeZone=UTC`` — DuckDB oracle timestamps are
    UTC-naive; Spark must agree.
  * ``spark.sql.legacy.parquet.nanosAsLong=true`` — the test corpus's
    ``events.ts`` is Parquet TIMESTAMP(NANOS); Spark 4 otherwise refuses the
    file.  Reading nanos as a raw long also preserves the reference's
    nanosecond precision (pkg/formats/s3_parquet.go:114 stores Unix nanos as
    INT64), which Spark's micro-precision TimestampType would truncate.
  * AQE on — runtime coalescing + skew-join handling at scale.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_replicator_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are sized for local[$SPARK_GRAFT_CPUS] test runs; on a real
    cluster pass ``master=None`` with externally-managed deploy config and
    raise ``shuffle_partitions`` to ~2-3× total cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed tables (bucketing) land in scratch space, not the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", tempfile.gettempdir() + "/krs_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
