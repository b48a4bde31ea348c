"""Range-partition prefix stitch — the shared scaffold of the engine's
exact global-order operators (2-D skyline, token-budget shard planner;
curriculum_buckets predates it with a rank-count variant).

Shape: range-partition on the order key, sort within partitions, tag rows
with their partition id, then give every partition the fold (max/sum) of
the value column over all STRICTLY earlier partitions via one driver-side
pass over per-partition aggregates (metadata-scale: one value per
partition) and a broadcast join — never a global single-partition window.

Invariant carried here once, for every caller: the tagged frame is cached
(cacheutil.track_cached) BEFORE the per-partition aggregates are collected,
because the final plan's correctness depends on the SAME range placement
the stitch observed — an uncached recompute could resample range boundaries.
Callers must keep using the returned frame (not rebuild it) and release via
cacheutil.release_cached() after their output action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached


def range_prefix_stitch(
    df: DataFrame,
    order_col: str,
    value_col: str,
    agg: str = "max",
    partitions: int = 16,
    extra_sum_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(tagged, prefix)``:

    * ``tagged`` — ``df`` range-partitioned and sorted on ``order_col``,
      with a ``__pid`` partition-id column, cached and registered for
      release.
    * ``prefix`` — one row per partition: ``__pid`` plus ``__prefix``, the
      ``agg`` ("max" or "sum") of ``value_col`` over all earlier
      partitions (NULL / 0 for the first partition respectively), typed
      like ``value_col`` so non-integer value columns work unchanged.
      With ``extra_sum_col`` set, the prefix also carries ``__sprefix``,
      the running SUM of that column over earlier partitions — computed in
      the SAME per-partition collect (one job, not two), for consumers
      that need both a rank offset and a value running total (e.g. Lorenz
      cuts).
    """
    if agg not in ("max", "sum"):
        raise ValueError(f"agg must be max|sum, got {agg!r}")
    tagged = track_cached(
        df.repartitionByRange(partitions, order_col)
        .sortWithinPartitions(order_col)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    aggfn = F.max if agg == "max" else F.sum
    aggs = [aggfn(value_col).alias("v")]
    if extra_sum_col is not None:
        aggs.append(F.sum(extra_sum_col).alias("s"))
    per_pid = {
        r["__pid"]: r for r in tagged.groupBy("__pid").agg(*aggs).collect()
    }

    # zero of the column's own type: DECIMAL columns reject a Python int 0
    # at createDataFrame verification
    def _zero(col: str):
        if tagged.schema[col].dataType.simpleString().startswith("decimal"):
            from decimal import Decimal

            return Decimal(0)
        return 0

    rows, acc = [], (None if agg == "max" else _zero(value_col))
    sacc = _zero(extra_sum_col) if extra_sum_col is not None else 0
    for pid in sorted(per_pid):
        rows.append((pid, acc, sacc) if extra_sum_col is not None else (pid, acc))
        v = per_pid[pid]["v"]
        # a range partition whose value_col is all NULL aggregates to NULL —
        # contribute nothing (max) / zero (sum), like SQL (ADVICE r06)
        if agg == "max":
            if v is not None:
                acc = v if acc is None else max(acc, v)
        else:
            acc += v if v is not None else _zero(value_col)
        if extra_sum_col is not None:
            # an all-NULL partition sums to NULL; contribute 0, like SQL SUM
            sacc += per_pid[pid]["s"] or 0
    dtype = tagged.schema[value_col].dataType.simpleString()
    schema = f"__pid int, __prefix {dtype}"
    if extra_sum_col is not None:
        sdtype = tagged.schema[extra_sum_col].dataType.simpleString()
        schema += f", __sprefix {sdtype}"
    prefix = tagged.sparkSession.createDataFrame(rows, schema=schema)
    return tagged, prefix
