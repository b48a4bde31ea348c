"""Distributed 2-D skyline (Pareto frontier) — minimize one key, maximize
the other.

A row survives iff no other row is at most as expensive AND at least as
large, with strict improvement in one dimension.  The classic sort-based
algorithm (sort by cost, keep rows beating the running best size) is
sequential; the distributed restatement splits it into

  1. per-cost groups (one shuffle; the frontier only needs each cost's max
     size, so grouped rows collapse map-side),
  2. a range partition of the cost groups + a partition-local running max
     (``Window.partitionBy(partition_id)`` — never a single-partition global
     window),
  3. a broadcast stitch of per-partition maxima, giving every group the
     exact max size over all STRICTLY cheaper groups,

the same range-partition + local-scan + boundary-stitch shape as
functions/dedup.prefix_duplicates and functions/textstats.curriculum_buckets.
The driver-side stitch state is one value per partition — metadata-scale.

No reference analog (the reference moves bytes, not rows); this is the
analytics-side frontier operator (cost/quality trade-off curves over
training corpora, price/size frontiers over catalog tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    partitions: int = 16,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier: minimal ``min_col``, maximal
    ``max_col``.  Exact under duplicates (ties on both keys all survive:
    neither strictly dominates the other).
    """
    groups = df.groupBy(min_col).agg(F.max(max_col).alias("__gmax"))
    d = (
        groups.repartitionByRange(partitions, min_col)
        .sortWithinPartitions(min_col)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    # the range placement must stay stable between the stitch action and the
    # final plan — cache and register for bulk release (cacheutil)
    d = track_cached(d)
    w = Window.partitionBy("__pid").orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = d.withColumn("__local_prev", F.max("__gmax").over(w))
    pmax = {r["__pid"]: r["m"] for r in d.groupBy("__pid").agg(F.max("__gmax").alias("m")).collect()}
    prefix, acc = [], None
    for pid in sorted(pmax):
        prefix.append((pid, acc))
        acc = pmax[pid] if acc is None else max(acc, pmax[pid])
    spark = df.sparkSession
    pre = spark.createDataFrame(
        [(pid, p) for pid, p in prefix], schema=f"__pid int, __prefix long"
    )
    strict = (
        local.join(F.broadcast(pre), "__pid")
        .withColumn(
            "__strict_max",
            F.greatest(
                F.coalesce("__local_prev", F.lit(None).cast("long")),
                F.col("__prefix"),
            ),
        )
        .select(min_col, "__gmax", "__strict_max")
    )
    return (
        df.join(strict, min_col)
        .filter(
            (F.col(max_col) == F.col("__gmax"))
            & (F.col("__strict_max").isNull() | (F.col("__strict_max") < F.col(max_col)))
        )
        .drop("__gmax", "__strict_max")
    )
