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
