"""Skew and co-location machinery for 100 TB-scale shuffles.

AQE's skew-join splitting handles most runtime skew (enabled in
session.py); these helpers cover the two cases AQE can't fix by itself:

  * **salted two-phase aggregation** — a groupBy where one key holds a
    large share of all rows (the hot-topic / boilerplate-document case):
    pre-aggregate on (key, salt) so every reducer sees bounded input, then
    combine the partials.  Works for any algebraic aggregate.
  * **salted join against a known-hot key set** — replicate the small side
    per salt so the hot keys' rows spread over N reducers.
  * **bucketed segment tables** — persist both sides bucketed by the join
    key so repeated metadata joins (segments ⋈ checkpoints ⋈ plans) are
    co-located: zero Exchange at read time (the Spark analog of the
    reference's per-partition data layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: (column, fn, alias) with fn ∈ {sum, count, min, max} —
    algebraic aggregates that re-combine losslessly (count re-combines as
    sum).  Phase 1 aggregates on (keys, random salt) bounding any single
    reducer; phase 2 combines the ≤ n_salts partials per key.
    """
    combine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _c, fn, _a in aggs:
        if fn not in combine:
            raise ValueError(f"non-algebraic aggregate {fn!r}")

    salted = df.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[getattr(F, fn)(c).alias(a) for c, fn, a in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[getattr(F, combine[fn])(a).alias(a) for _c, fn, a in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` has heavy skew on ``key``: salt the big side
    randomly and explode the small side across all salts, so each hot key
    spreads over ``n_salts`` reducers.  Use when the small side is too big
    to broadcast but the big side's key distribution is pathological.
    """
    big_s = big.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, bucket_key: str | list[str], n_buckets: int = 32
) -> None:
    """Persist as a bucketed table so later joins/aggregations on the
    bucket key are co-located (no Exchange).  The Spark analog of
    pre-partitioning the segment store by (topic, partition).
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    # mode("overwrite") alone does not clear a stale managed-table location,
    # and the default in-memory catalog forgets tables across sessions while
    # their files persist — drop both the entry and the location.
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .format("parquet")
        .saveAsTable(table)
    )
