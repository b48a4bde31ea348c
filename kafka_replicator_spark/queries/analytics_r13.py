"""Round-13 analytics: paired-binary and multi-ranking concordance
statistics — McNemar's test (the paired twin of the chi2/odds-ratio
family) and Kendall's W (the m-ranking generalization of the pairwise
Kendall tau queries).  Both in exact integer arithmetic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: exact integer microseconds per day (the analytics_ts convention)
_DAY_US = 86_400_000_000


# ------------------------------------------------- McNemar paired binary

_MCNEMAR_SQL = f"""
WITH od AS MATERIALIZED (
  SELECT o_custkey,
         epoch_us(o_orderdate) // {_DAY_US} AS d,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent
  FROM orders
),
b AS (SELECT min(d) AS lo, max(d) - min(d) + 1 AS span FROM od),
halves AS (
  SELECT o_custkey,
         max(CASE WHEN d <  lo + span // 2 THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN d >= lo + span // 2 THEN 1 ELSE 0 END) AS in2,
         max(CASE WHEN d <  lo + span // 2 THEN urgent ELSE 0 END) AS f1,
         max(CASE WHEN d >= lo + span // 2 THEN urgent ELSE 0 END) AS f2
  FROM od, b GROUP BY o_custkey
),
p AS (SELECT * FROM halves WHERE in1 = 1 AND in2 = 1)
SELECT CAST(count(*) AS BIGINT) AS n_paired,
       CAST(sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS b_discordant,
       CAST(sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS c_discordant,
       CAST(1000 * (sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)
                    - sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END))
                 * (sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)
                    - sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END))
            // nullif(sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)
                      + sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS chi2_milli
FROM p
"""


@register(
    "a_mcnemar_urgent",
    _MCNEMAR_SQL,
    tags=("analytics", "stats"),
    doc="McNemar's test for paired binary outcomes — the within-subject "
    "twin of the chi2/odds-ratio family (those compare independent "
    "groups; McNemar conditions on the discordant pairs of the SAME "
    "subject measured twice): each customer with orders in BOTH halves "
    "of the order timeline (integer epoch-day midpoint, the span-"
    "relative rule) is a pair, the outcome is 'placed any 1-URGENT "
    "order in that half', and chi2 = (b-c)^2/(b+c) over the discordant "
    "counts, exact in milli-units via one integer ratio — no continuity "
    "correction, documented.  Answers 'did urgency-seeking behavior "
    "CHANGE within customers across the two eras' rather than 'do two "
    "customer groups differ'",
)
def q_mcnemar_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}"
        ).alias("d"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "urgent"
        ),
    )
    b = od.agg(
        F.min("d").alias("lo"), (F.max("d") - F.min("d") + 1).alias("span")
    )
    halves = (
        od.crossJoin(F.broadcast(b))
        .withColumn("mid", F.expr("lo + span div 2"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("d") < F.col("mid"), 1).otherwise(0)).alias("in1"),
            F.max(F.when(F.col("d") >= F.col("mid"), 1).otherwise(0)).alias("in2"),
            F.max(
                F.when(F.col("d") < F.col("mid"), F.col("urgent")).otherwise(0)
            ).alias("f1"),
            F.max(
                F.when(F.col("d") >= F.col("mid"), F.col("urgent")).otherwise(0)
            ).alias("f2"),
        )
        .filter((F.col("in1") == 1) & (F.col("in2") == 1))
    )
    return halves.agg(
        F.count(F.lit(1)).cast("long").alias("n_paired"),
        F.sum(F.when((F.col("f1") == 1) & (F.col("f2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b_discordant"),
        F.sum(F.when((F.col("f1") == 0) & (F.col("f2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c_discordant"),
        F.expr(
            "CAST(1000 * (sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)"
            "             - sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END))"
            "          * (sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)"
            "             - sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END))"
            " div nullif(sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END)"
            "            + sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)"
        ).alias("chi2_milli"),
    )


# --------------------------------------------- Kendall's W concordance

_KENDALLS_W_SQL = """
WITH rev AS MATERIALIZED (
  SELECT c.c_nationkey AS nk, CAST(year(o.o_orderdate) AS BIGINT) AS y,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
yrs AS (SELECT count(DISTINCT y) AS m FROM rev),
full_n AS MATERIALIZED (
  SELECT nk FROM rev, yrs GROUP BY nk, m HAVING count(*) = m
),
ranked AS (
  SELECT r.y, r.nk,
         CAST(row_number() OVER (
           PARTITION BY r.y ORDER BY r.cents DESC, r.nk ASC) AS BIGINT) AS rk
  FROM rev r JOIN full_n USING (nk)
),
sums AS (SELECT nk, CAST(sum(rk) AS BIGINT) AS rsum FROM ranked GROUP BY nk),
dims AS (
  SELECT (SELECT m FROM yrs) AS m, CAST(count(*) AS BIGINT) AS n FROM full_n
),
s4 AS (
  SELECT CAST(sum((2 * s.rsum - d.m * (d.n + 1))
               * (2 * s.rsum - d.m * (d.n + 1))) AS BIGINT) AS v
  FROM sums s, dims d
)
SELECT d.m, d.n, s4.v AS s4,
       CAST(1000000 * 3 * s4.v
            // nullif(d.m * d.m * (d.n * d.n * d.n - d.n), 0) AS BIGINT)
         AS w_ppm
FROM dims d, s4
"""


@register(
    "a_kendalls_w_nation",
    _KENDALLS_W_SQL,
    tags=("analytics", "stats"),
    doc="Kendall's coefficient of concordance W across the yearly "
    "nation-revenue rankings — the m-ranking generalization of the "
    "pairwise Kendall tau queries (tau compares 2 rankings; W asks how "
    "much ALL m yearly league tables agree): nations present in every "
    "order-year are ranked per year by revenue cents (deterministic "
    "(cents DESC, nationkey) tie-break makes each ranking a permutation "
    "— exact-tie mid-ranks are not needed on cent sums, documented), "
    "and W = 12*S/(m^2*(n^3-n)) computed as ONE integer ratio via the "
    "4S lift (sum of (2*Rsum - m(n+1))^2 — m(n+1) need not be even, so "
    "the doubled deviations keep everything integral).  Bounded grains "
    "throughout: per-year windows over the <=25-nation frame",
)
def q_kendalls_w_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.year(F.col("o_orderdate").cast("timestamp")).cast("long").alias("y"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents")
        )
    )
    rev = track_cached(rev)
    yrs = rev.agg(F.countDistinct("y").alias("m"))
    full_n = (
        rev.crossJoin(F.broadcast(yrs))
        .groupBy("nk", "m")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == F.col("m"))
        .select("nk")
    )
    w = Window.partitionBy("y").orderBy(F.desc("cents"), F.asc("nk"))
    ranked = rev.join(F.broadcast(full_n), "nk").select(
        "y", "nk", F.row_number().over(w).cast("long").alias("rk")
    )
    sums = ranked.groupBy("nk").agg(F.sum("rk").cast("long").alias("rsum"))
    # m comes from yrs ALONE (the oracle's scalar subquery) — deriving it
    # via max() over the full_n crossJoin would be NULL when no nation
    # spans every year, diverging from the oracle's real year count
    dims = yrs.crossJoin(
        F.broadcast(full_n.agg(F.count(F.lit(1)).cast("long").alias("n")))
    ).select(F.col("m").cast("long").alias("m"), "n")
    s4 = sums.crossJoin(F.broadcast(dims)).agg(
        F.sum(
            (2 * F.col("rsum") - F.col("m") * (F.col("n") + 1))
            * (2 * F.col("rsum") - F.col("m") * (F.col("n") + 1))
        )
        .cast("long")
        .alias("v")
    )
    return dims.crossJoin(F.broadcast(s4)).select(
        "m",
        "n",
        F.col("v").alias("s4"),
        F.expr(
            "CAST(1000000 * 3 * v div nullif(m * m * (n * n * n - n), 0)"
            " AS BIGINT)"
        ).alias("w_ppm"),
    )


# -------------------------------- shared-text null-safe comparison surface

#: identical text on BOTH engines (spark.sql over registered views == the
#: DuckDB oracle) — IS [NOT] DISTINCT FROM verified to agree, incl. the
#: NULL-vs-NULL and NULL-vs-value cells.  NOTE the probe that did NOT
#: make it a query: try_cast('3.5' AS BIGINT) ROUNDS to 4 on DuckDB but
#: NULLs on Spark — try_cast of fractional strings is a cross-engine trap.
SHARED_SQL_DISTINCT_FROM = """
WITH latest AS (
  SELECT c.c_custkey,
         max(CASE WHEN o.o_orderpriority = '1-URGENT'
                  THEN o.o_orderkey END) AS last_urgent,
         max(o.o_orderkey) AS last_any
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN last_urgent IS DISTINCT FROM last_any
                     THEN 1 ELSE 0 END) AS BIGINT) AS urgent_not_last,
       CAST(sum(CASE WHEN last_urgent IS NOT DISTINCT FROM last_any
                     THEN 1 ELSE 0 END) AS BIGINT) AS urgent_is_last,
       CAST(sum(CASE WHEN last_any IS NULL
                     AND last_urgent IS NOT DISTINCT FROM last_any
                     THEN 1 ELSE 0 END) AS BIGINT) AS null_null_agree
FROM latest
"""


@register(
    "a_shared_sql_distinct_from",
    SHARED_SQL_DISTINCT_FROM,
    tags=("analytics", "sql"),
    doc="SQL front door: null-safe comparison via IS [NOT] DISTINCT FROM "
    "through the same-text contract — orderless customers produce "
    "NULL/NULL cells (counted as EQUAL by IS NOT DISTINCT FROM, pinned "
    "by the null_null_agree column) and urgent-less customers produce "
    "NULL-vs-value cells (DISTINCT FROM true); ordinary equality would "
    "silently drop both classes to UNKNOWN.  Verified byte-identical "
    "semantics on both engines including the NULL cells; the probe that "
    "FAILED the contract is recorded beside the text (try_cast of "
    "fractional strings rounds on DuckDB, NULLs on Spark)",
)
def q_shared_sql_distinct_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.queries.analytics_sql_ext import _run_shared_sql

    return _run_shared_sql(spark, sf_dir, SHARED_SQL_DISTINCT_FROM)


# ------------------------------------ shared-text ORDER BY ALL surface

SHARED_SQL_ORDER_BY_ALL = """
SELECT o.o_orderpriority,
       CAST(year(o.o_orderdate) AS BIGINT) AS y,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders o
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "a_shared_sql_order_by_all",
    SHARED_SQL_ORDER_BY_ALL,
    tags=("analytics", "sql"),
    doc="SQL front door: GROUP BY ALL composed with ORDER BY ALL through "
    "the same-text contract — VERIFIED both engines expand ALL to the "
    "full select list left-to-right (the (priority, year) grain makes "
    "the total order deterministic), completing the *BY ALL pair next "
    "to r10's a_shared_sql_group_by_all.  Cents via the floor(x*100+"
    "0.5) rule (o_totalprice ships as DOUBLE)",
)
def q_shared_sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.queries.analytics_sql_ext import _run_shared_sql

    return _run_shared_sql(spark, sf_dir, SHARED_SQL_ORDER_BY_ALL)
