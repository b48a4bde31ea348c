"""Testdata table loading (TESTDATA.md corpus).

One parquet file per table at ``{sf_dir}/{name}.parquet``.  Reading goes
through ``spark.read.parquet`` so Catalyst gets pushdown/pruning; never
collect these to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts is Parquet TIMESTAMP(NANOS): without this (runtime-settable)
    # legacy flag Spark 4 refuses the file.  Set defensively — the driver
    # supplies its own SparkSession that may not carry our session config.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the DuckDB oracle's timestamps are UTC-naive; NTZ→epoch conversions
    # (as-of join) and window alignment must agree regardless of the
    # driver session's local timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
