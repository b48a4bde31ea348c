"""Distributed cardinality sketches — cross-engine-deterministic HyperLogLog.

The reference exposes distinct-count aggregates over replicated topics
(messageCount / key-cardinality style stats, pkg/compaction/compactor.go and
the metrics surface); at 100 TB an exact ``count(distinct)`` of a high-
cardinality key shuffles every distinct value.  HyperLogLog needs one
shuffle of (group, bucket) pairs with map-side combine — state is m=256
registers per group regardless of cardinality.

Spark's native ``approx_count_distinct`` IS this sketch (HLL++) and is the
production path.  This module re-derives HLL from the portable 60-bit md5
hash (functions/hashing.py) so the DuckDB oracle reproduces the estimate
BIT-FOR-BIT — something no native sketch pair can do — turning an
"approximate" operator into one the correctness gate can hash-compare:

* bucket  = top ``p=8`` bits of hash60          (256 registers)
* rho     = leading-zero count of the remaining 52-bit word, + 1
  (computed as ``53 - length(bin(w))`` — ``bin`` renders the minimal
  binary string in both engines; the all-zero word, probability 2^-52,
  yields 52 in both engines — deterministic, documented bias)
* register sum kept EXACT: sum of ``2^(53-rho)`` as int64 (≤ 256·2^52 <
  2^63) — integer addition is order-independent, so partial aggregation
  order can't change the estimate (the same trick money aggregates use)
* estimate = alpha_m · m² · 2^53 / reg_sum — one double division of
  identical operands, correctly rounded identically everywhere.

No small-range ln() correction: ``ln`` is not guaranteed identically
rounded across engines; the raw estimator is biased low under ~3·m
distinct values, and the paired exact count in the audit query makes the
bias visible instead of hiding it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import (
    portable_hash60,
    portable_hash60_sql,
)

#: HLL precision: 2^P registers per group
HLL_P = 8
HLL_M = 1 << HLL_P
#: bits left in the 60-bit portable hash after the bucket index
_W_BITS = 60 - HLL_P
_W_MASK = (1 << _W_BITS) - 1
#: alpha_256 bias-correction constant (Flajolet et al. 2007)
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: scaled numerator alpha·m²·2^53 — embedded as the same double literal in
#: both engines; register sums are scaled by 2^53 to stay integral
_NUMER = _ALPHA * HLL_M * HLL_M * float(1 << 53)


def hll_registers(df: DataFrame, key, group_cols: list[str]) -> DataFrame:
    """(group, bucket) → max rho — the HLL register table.

    Two-level aggregation: the first groupBy keys on (group, bucket) so a
    skewed group spreads over 256 reducer keys; partial ``max`` combines
    map-side, so the shuffle carries at most m rows per (input-partition,
    group) no matter the cardinality.
    """
    h = portable_hash60(key)
    w = h.bitwiseAND(F.lit(_W_MASK))
    rho = (
        F.when(w == 0, F.lit(_W_BITS))
        .otherwise(F.lit(_W_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, F.shiftright(h, _W_BITS).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(df: DataFrame, key, group_cols: list[str]) -> DataFrame:
    """Per-group HLL cardinality estimate with exact integer register sum."""
    regs = hll_registers(df, key, group_cols)
    per = regs.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(1L, 53 - r)")).alias("s_nonempty"),
        F.count(F.lit(1)).alias("nb"),
    )
    return per.select(
        *group_cols,
        (F.col("s_nonempty") + (F.lit(HLL_M) - F.col("nb")) * F.lit(1 << 53))
        .cast("long")
        .alias("reg_sum"),
        (F.lit(HLL_M) - F.col("nb")).cast("long").alias("empty_buckets"),
    ).withColumn("hll_estimate", F.round(F.lit(_NUMER) / F.col("reg_sum"), 4))


def hll_estimate_sql(key_expr: str, group_expr: str, table: str) -> str:
    """DuckDB mirror of :func:`hll_estimate` (+ exact distinct audit)."""
    h = portable_hash60_sql(key_expr)
    return f"""
WITH hashed AS (
  SELECT {group_expr} AS grp,
         {h} >> {_W_BITS} AS bucket,
         {h} & {_W_MASK} AS w
  FROM {table}
), regs AS (
  SELECT grp, bucket,
         max(CASE WHEN w = 0 THEN {_W_BITS}
                  ELSE {_W_BITS + 1} - length(bin(w)) END) AS r
  FROM hashed GROUP BY grp, bucket
), per AS (
  SELECT grp,
         CAST(sum(1::BIGINT << (53 - r)) AS BIGINT) AS s_nonempty,
         count(*) AS nb
  FROM regs GROUP BY grp
)
SELECT grp,
       CAST(s_nonempty + ({HLL_M} - nb) * (1::BIGINT << 53) AS BIGINT) AS reg_sum,
       CAST({HLL_M} - nb AS BIGINT) AS empty_buckets,
       round({_NUMER!r} / (s_nonempty + ({HLL_M} - nb) * (1::BIGINT << 53)), 4)
         AS hll_estimate
FROM per
"""
