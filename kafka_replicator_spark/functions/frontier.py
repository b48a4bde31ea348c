"""Distributed 2-D skyline (Pareto frontier) — minimize one key, maximize
the other.

A row survives iff no other row is at most as expensive AND at least as
large, with strict improvement in one dimension.  The classic sort-based
algorithm (sort by cost, keep rows beating the running best size) is
sequential; the distributed restatement splits it into

  1. per-cost groups (one shuffle; the frontier only needs each cost's max
     size, so grouped rows collapse map-side),
  2. the shared range-partition prefix stitch (functions/stitch.py): a
     partition-local running max plus the exact max over all strictly
     earlier partitions — never a single-partition global window,
  3. a join back to the rows: survivor iff it holds its cost group's max
     size AND beats the strict-prefix max.

No reference analog (the reference moves bytes, not rows); this is the
analytics-side frontier operator (cost/quality trade-off curves over
training corpora, price/size frontiers over catalog tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.stitch import range_prefix_stitch


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    partitions: int = 16,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier: minimal ``min_col``, maximal
    ``max_col`` (any orderable numeric types).  Exact under duplicates
    (ties on both keys all survive: neither strictly dominates the other).
    """
    groups = df.groupBy(min_col).agg(F.max(max_col).alias("__gmax"))
    tagged, prefix = range_prefix_stitch(
        groups, min_col, "__gmax", agg="max", partitions=partitions
    )
    # groups are distinct per cost, so earlier rows within a partition are
    # strictly cheaper — the row-frame running max is the strict-prefix max
    w = Window.partitionBy("__pid").orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = tagged.withColumn("__local_prev", F.max("__gmax").over(w))
    strict = (
        local.join(F.broadcast(prefix), "__pid")
        .withColumn("__strict_max", F.greatest("__local_prev", "__prefix"))
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
