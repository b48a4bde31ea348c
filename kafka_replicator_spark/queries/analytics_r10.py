"""Round-10 analytics queries (TPC-H grain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


# --------------------------------------------- Pettitt change-point test


@register(
    "a_pettitt_changepoint",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_orderdate
),
ranked AS (
  SELECT d, cents,
         CAST(rank() OVER (ORDER BY cents ASC) AS BIGINT) AS ra,
         CAST(rank() OVER (ORDER BY cents DESC) AS BIGINT) AS rd,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
  FROM daily
),
u AS (
  SELECT t, d, n,
         sum(ra + (n + 1 - rd)) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
           - t * (n + 1) AS ut
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(t AS BIGINT) AS t_star,
       CAST(d AS VARCHAR) AS cp_date,
       CAST(abs(ut) AS BIGINT) AS k_stat
FROM (
  SELECT *, row_number() OVER (ORDER BY abs(ut) DESC, t ASC) AS rn
  FROM u WHERE t < n
) WHERE rn = 1
""",
    tags=("analytics", "stats"),
    doc="Pettitt change-point test on daily order revenue (the rank-based "
    "nonparametric sibling of a_cusum_changepoint / a_changepoint_sse — "
    "robust to the heavy-tailed order values both mean-based tests "
    "square): U_t = sum_{i<=t} double-average-rank_i - t(n+1), where the "
    "double rank 2r_i = rank_asc + (n+1 - rank_desc) keeps tied days in "
    "exact integers; K = max|U_t| over t < n (U_n = 0 identically) with "
    "the earliest-t tie-break.  All windows run on the bounded day grain; "
    "cents from DECIMAL(18,2)*100 are exact integers so ranks can never "
    "drift cross-engine",
)
def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("cents")
    )
    w_all = Window.partitionBy()
    ranked = daily.select(
        "d",
        F.rank().over(w_all.orderBy(F.asc("cents"))).cast("long").alias("ra"),
        F.rank().over(w_all.orderBy(F.desc("cents"))).cast("long").alias("rd"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.row_number().over(w_all.orderBy("d")).cast("long").alias("t"),
    )
    run = w_all.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = ranked.select(
        "t",
        "d",
        "n",
        (
            F.sum(F.col("ra") + (F.col("n") + 1 - F.col("rd"))).over(run)
            - F.col("t") * (F.col("n") + 1)
        ).alias("ut"),
    )
    w_pick = w_all.orderBy(F.desc(F.abs(F.col("ut"))), F.asc("t"))
    return (
        u.filter(F.col("t") < F.col("n"))
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("n").alias("n_days"),
            F.col("t").alias("t_star"),
            F.col("d").cast("string").alias("cp_date"),
            F.abs(F.col("ut")).cast("long").alias("k_stat"),
        )
    )


# --------------------------------------------- Little's-law identity


@register(
    "a_littles_law_identity",
    """
WITH iv AS MATERIALIZED (
  SELECT o.o_orderkey, o.o_orderdate AS od, max(l.l_shipdate) AS cd
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
dur AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(datediff('day', od, cd) + 1) AS BIGINT) AS order_days
  FROM iv
),
ev AS (
  SELECT od AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT cd + INTERVAL 1 DAY, -1 FROM iv
),
daily AS (
  SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM ev GROUP BY d
),
run AS (
  SELECT d,
         CAST(sum(delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS backlog,
         datediff('day', d,
                  lead(d) OVER (ORDER BY d)) AS gap_days
  FROM daily
),
sweep AS (
  SELECT CAST(sum(backlog * gap_days) AS BIGINT) AS order_days
  FROM run WHERE gap_days IS NOT NULL
)
SELECT dur.n_orders, dur.order_days AS order_days_direct,
       sweep.order_days AS order_days_sweep,
       CAST((dur.order_days * 1000000) // nullif(sweep.order_days, 0) AS BIGINT)
         AS identity_ppm
FROM dur, sweep
""",
    tags=("analytics", "stats", "audit"),
    doc="Little's-law integral identity as a cross-check: total order-open "
    "days computed TWO independent ways — directly (sum over orders of "
    "receipt - orderdate + 1) and by the sweep-line (the +1/-1 event "
    "walk a_peak_open_orders uses, each backlog level weighted by the "
    "gap to the next event day, so days BETWEEN event dates are counted "
    "at their constant level) — must agree exactly: identity_ppm is "
    "pinned at 1000000.  A mismatch localizes an interval-handling bug "
    "(off-by-one on closes, gap weighting, date arithmetic) on either "
    "engine; windows run on the bounded day grain",
)
def q_littles_law_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("cd"))
        .select(F.col("o_orderdate").alias("od"), "cd")
    )
    from kafka_replicator_spark.cacheutil import track_cached

    iv = track_cached(iv)
    dur = iv.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.datediff("cd", "od") + 1).cast("long").alias("order_days_direct"),
    )
    ev = iv.select(F.col("od").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("cd", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = ev.groupBy("d").agg(F.sum("delta").cast("long").alias("delta"))
    w = Window.partitionBy().orderBy("d")
    run = daily.select(
        "d",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("backlog"),
        F.datediff(F.lead("d").over(w), F.col("d")).alias("gap_days"),
    )
    sweep = run.filter(F.col("gap_days").isNotNull()).agg(
        F.sum(F.col("backlog") * F.col("gap_days")).cast("long").alias("order_days_sweep")
    )
    return (
        dur.crossJoin(sweep)
        .select(
            "n_orders",
            "order_days_direct",
            "order_days_sweep",
            F.expr(
                "CAST((order_days_direct * 1000000)"
                " div nullif(order_days_sweep, 0) AS BIGINT)"
            ).alias("identity_ppm"),
        )
    )


# --------------------------------------------- Page trend test (dow)


@register(
    "a_page_trend_dow",
    """
WITH daily AS (
  SELECT o_orderdate AS d,
         datediff('day', DATE '1970-01-01', o_orderdate) AS ed,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_orderdate
),
tagged AS (
  SELECT ed // 7 AS block, dayofweek(d) AS j, cents FROM daily
),
complete AS (
  SELECT block FROM tagged GROUP BY block
  HAVING count(*) = 7 AND count(DISTINCT j) = 7
),
ranked AS (
  SELECT t.block, t.j,
         CAST(rank() OVER (PARTITION BY t.block ORDER BY t.cents ASC) AS BIGINT)
           + (8 - CAST(rank() OVER (PARTITION BY t.block ORDER BY t.cents DESC) AS BIGINT))
           AS dr
  FROM tagged t JOIN complete USING (block)
),
rj AS (
  SELECT j, CAST(sum(dr) AS BIGINT) AS drj,
         CAST(count(*) AS BIGINT) AS b
  FROM ranked GROUP BY j
)
SELECT CAST(min(b) AS BIGINT) AS n_blocks,
       CAST(sum((j + 1) * drj) AS BIGINT) AS l_x2,
       CAST(min(b) * 7 * 32 AS BIGINT) AS e_l_x2,
       CAST(sum((j + 1) * drj) - min(b) * 7 * 32 AS BIGINT) AS l_excess_x2
FROM rj
""",
    tags=("analytics", "stats"),
    doc="Page's trend test for ordered alternatives across the week "
    "(Page 1963; the monotone-ordering sibling of a_kruskal_wallis_dow, "
    "which only detects ANY difference): within each COMPLETE 7-day "
    "block (epoch-day // 7; blocks missing a day drop out) daily revenue "
    "is rank-scored with the exact double-rank 2r = rank_asc + (8 - "
    "rank_desc) so ties stay integer, L = sum_j (j+1) * R_j folds "
    "doubled (drj = 2*R_j), and the null expectation E[2L] = "
    "2 * b*k(k+1)^2/4 = 224b for k=7 (min(b)*7*32); l_excess_x2 > 0 "
    "means revenue trends UP across the dow positions.  dow is DuckDB dayofweek == Spark dayofweek - 1 (the "
    "r04 note); all windows on the bounded 7-row block grain",
)
def q_page_trend_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).cast("long").alias("cents")
    )
    tagged = daily.select(
        F.expr("datediff(d, DATE '1970-01-01') div 7").alias("block"),
        (F.dayofweek("d") - 1).alias("j"),
        "cents",
    )
    complete = (
        tagged.groupBy("block")
        .agg(F.count(F.lit(1)).alias("c"), F.countDistinct("j").alias("dj"))
        .filter((F.col("c") == 7) & (F.col("dj") == 7))
        .select("block")
    )
    wb = Window.partitionBy("block")
    ranked = tagged.join(complete, "block").select(
        "block",
        "j",
        (
            F.rank().over(wb.orderBy(F.asc("cents"))).cast("long")
            + (8 - F.rank().over(wb.orderBy(F.desc("cents"))).cast("long"))
        ).alias("dr"),
    )
    rj = ranked.groupBy("j").agg(
        F.sum("dr").cast("long").alias("drj"), F.count(F.lit(1)).cast("long").alias("b")
    )
    return rj.agg(
        F.min("b").cast("long").alias("n_blocks"),
        F.sum((F.col("j") + 1) * F.col("drj")).cast("long").alias("l_x2"),
        (F.min("b") * 7 * 32).cast("long").alias("e_l_x2"),
        (F.sum((F.col("j") + 1) * F.col("drj")) - F.min("b") * 7 * 32)
        .cast("long")
        .alias("l_excess_x2"),
    )
