"""Round-11 analytics queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

# ------------------------------------------------ Benford first-digit audit

#: floor(log10(1 + 1/d) * 1e6 + 0.5) — precomputed literals (runtime log10
#: is float and NOT trusted cross-engine, the df_histogram rule); the nine
#: shares sum to exactly 1000000
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}

_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in _BENFORD_PPM.items()
) + " END"


@register(
    "a_benford_price",
    f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders
),
obs AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM digits)
SELECT d, n,
       CAST(n * 1000000 // t AS BIGINT) AS share_ppm,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
       CAST(abs(n * 1000000 // t - ({_BENFORD_CASE})) AS BIGINT)
         AS abs_dev_ppm
FROM obs, tot
ORDER BY d
""",
    tags=("analytics", "stats", "audit"),
    doc="Benford first-digit audit of order values — the classic "
    "fabricated-data screen: first digit of the exact integer cents "
    "(floor(x*100+0.5), the r10 cents rule; digit via the BIGINT's "
    "decimal string, identical on both engines) vs the Benford "
    "expectation log10(1+1/d) as PRECOMPUTED ppm literals (runtime log10 "
    "is never trusted cross-engine).  TPC-H prices are sums of uniform "
    "parts, so deviations here are expected and CALIBRATE the screen — "
    "the query is the instrument, the corpus the null sample",
)
def q_benford_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT)"
        ).alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = digits.agg(F.count(F.lit(1)).cast("long").alias("t"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.expr("CAST(n * 1000000 div t AS BIGINT)").alias("share_ppm"),
            F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_ppm"),
            F.expr(
                f"CAST(abs(n * 1000000 div t - ({_BENFORD_CASE})) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
        .orderBy("d")
    )


# ------------------------------------------------ Hurst rescaled range

#: dyadic block-size ladder (days per block)
_RS_BLOCKS = (4, 8, 16)


def _rs_arm_sql(b: int) -> str:
    return f"""
SELECT CAST({b} AS BIGINT) AS block_days,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(rs_ppm) // count(*) AS BIGINT) AS mean_rs_ppm
FROM (
  SELECT blk,
         CAST(floor((max(by_dev) - min(by_dev))
                    / sqrt(CAST(any_value(v) AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS rs_ppm
  FROM (
    SELECT (t - 1) // {b} AS blk, t, cents,
           {b} * sum(cents) OVER (PARTITION BY (t - 1) // {b} ORDER BY t)
             - (t - 1 - ((t - 1) // {b}) * {b} + 1)
               * sum(cents) OVER (PARTITION BY (t - 1) // {b}) AS by_dev,
           {b} * sum(CAST(cents AS HUGEINT) * cents)
                   OVER (PARTITION BY (t - 1) // {b})
             - CAST(sum(cents) OVER (PARTITION BY (t - 1) // {b}) AS HUGEINT)
               * sum(cents) OVER (PARTITION BY (t - 1) // {b}) AS v
    FROM ds WHERE t <= (SELECT (max(t) // {b}) * {b} FROM ds)
  )
  GROUP BY blk HAVING any_value(v) > 0
)"""


@register(
    "a_hurst_rs",
    f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_orderdate
),
ds AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t, cents FROM daily
)
SELECT * FROM ({" UNION ALL ".join(_rs_arm_sql(b) for b in _RS_BLOCKS)})
ORDER BY block_days
""",
    tags=("analytics", "stats", "timeseries"),
    doc="Hurst rescaled-range (R/S) ladder over daily revenue at dyadic "
    f"block sizes {_RS_BLOCKS}: per block, R = range of cumulative "
    "deviations from the block mean and S = within-block std, kept EXACT "
    "by clearing the mean — b*Y_j = b*prefix - j*block_sum (integer) and "
    "V = b*sum(x^2) - sum(x)^2 = b^2*var (integer), so range(b*Y) = b*R "
    "and sqrt(V) = b*S cancel their b's: R/S = range(by_dev)/sqrt(V), "
    "exactly ONE IEEE sqrt (correctly rounded, bit-identical "
    "cross-engine — the cramers_v rule) before the floor(x*1e6+0.5) "
    "quantization (a review pass caught a spurious extra b under the "
    "sqrt that reported (R/S)/sqrt(b)); per-b mean over blocks is an "
    "integer floor division.  Growing mean R/S across the ladder is the "
    "long-range-dependence signal (H > 1/2) bursty event streams show; "
    "zero-variance blocks are excluded deterministically on both engines",
)
def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kafka_replicator_spark.cacheutil import track_cached

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    ds = track_cached(
        daily.select(
            F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
            "cents",
        )
    )
    # one metadata-scale collect; each arm trims to full blocks by literal
    n_days = ds.agg(F.max("t")).collect()[0][0]
    out = None
    for b in _RS_BLOCKS:
        wblk = Window.partitionBy("blk")
        wrun = wblk.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        blocks = (
            ds.filter(F.col("t") <= (n_days // b) * b)
            .select("t", "cents", F.expr(f"(t - 1) div {b}").alias("blk"))
            .select(
                "blk",
                "t",
                (
                    F.lit(b) * F.sum("cents").over(wrun)
                    - (
                        F.col("t")
                        - 1
                        - F.col("blk") * b
                        + 1
                    )
                    * F.sum("cents").over(wblk)
                ).alias("by_dev"),
                # HUGEINT/DECIMAL lift: daily cents^2 sums overflow int64
                (
                    F.lit(b)
                    * F.sum(
                        F.col("cents").cast("decimal(38,0)") * F.col("cents")
                    ).over(wblk)
                    - F.sum("cents").over(wblk).cast("decimal(38,0)")
                    * F.sum("cents").over(wblk)
                ).alias("v"),
            )
        )
        rs = (
            blocks.groupBy("blk")
            .agg(
                F.max("by_dev").alias("mxd"),
                F.min("by_dev").alias("mnd"),
                F.first("v").alias("v"),
            )
            .filter(F.col("v") > 0)
            .select(
                F.expr(
                    "CAST(floor((mxd - mnd) / sqrt(CAST(v AS DOUBLE))"
                    " * 1000000 + 0.5) AS BIGINT)"
                ).alias("rs_ppm")
            )
        )
        arm = rs.agg(
            F.lit(b).cast("long").alias("block_days"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.expr("CAST(sum(rs_ppm) div count(1) AS BIGINT)").alias("mean_rs_ppm"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("block_days")
