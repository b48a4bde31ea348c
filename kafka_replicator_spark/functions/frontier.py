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
    partitions: int | None = None,
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


def weighted_median(
    df: DataFrame, value_col: str, weight_col: str, partitions: int | None = None
) -> DataFrame:
    """Exact lower weighted median: the smallest value ``v`` whose running
    weight (ordered by value) reaches half the total — the robust center
    a revenue-weighted price dashboard needs, where the plain median
    ignores volume.

    Scale: the same range-partition prefix-stitch as the skyline and the
    shard planner (functions/stitch.py) — per-partition weight sums are
    collected driver-side (metadata-scale), every partition gets its
    exclusive prefix via a broadcast join, and the running sum inside each
    partition is a partition-local window.  Never a global single-partition
    window, so the selection holds at any row count.

    Output (1 row): n_rows, total_weight, weighted_median (the crossing
    row's value — deterministic even under ties, since every tied row
    carries the same value).
    """
    slim = df.select(F.col(value_col).alias("__v"), F.col(weight_col).cast("long").alias("__w"))
    tagged, prefix = range_prefix_stitch(slim, "__v", "__w", agg="sum", partitions=partitions)
    tot = tagged.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("__w").alias("total_weight")
    )
    run = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        tagged.join(F.broadcast(prefix), "__pid")
        .withColumn("__cum", F.col("__prefix") + F.sum("__w").over(run))
        .join(F.broadcast(tot))
    )
    crossing = cum.where(
        (F.col("__cum") * 2 >= F.col("total_weight"))
        & ((F.col("__cum") - F.col("__w")) * 2 < F.col("total_weight"))
    )
    return crossing.groupBy("n_rows", "total_weight").agg(
        F.min("__v").alias("weighted_median")
    ).select("n_rows", "total_weight", "weighted_median")


def weighted_median_sql(table: str, value_expr: str, weight_expr: str) -> str:
    """DuckDB mirror: one global window is fine oracle-side."""
    return f"""
WITH slim AS (SELECT {value_expr} AS v, CAST({weight_expr} AS BIGINT) AS w FROM {table}),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(w) AS BIGINT) AS total_weight
  FROM slim
),
cum AS (
  SELECT v, w, CAST(sum(w) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
  FROM slim
)
SELECT tot.n_rows, tot.total_weight,
       (SELECT min(v) FROM cum, tot
        WHERE c * 2 >= tot.total_weight AND (c - w) * 2 < tot.total_weight)
         AS weighted_median
FROM tot
"""
