"""TPC-H query shapes added in round 2 (Q4/Q7/Q14/Q19).

Separate module so they register BEFORE the round-1 analytics family: the
driver's correctness harness verifies a prefix of the registry, and these
have no round-1 green row yet (the round-1 families do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

# local copies (importing them from .analytics would trigger that module's
# registrations first and push these queries out of the driver window)
DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


@register(
    "a_q4_priority_lateness",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
    tags=("analytics", "semi-join"),
    doc="TPC-H Q4 shape: EXISTS correlated on a non-equi predicate → "
    "left-semi join with a composite condition, then count by priority "
    "(lateness predicate adapted: the fixture lineitem has no "
    "l_commitdate/l_receiptdate, so 'late' = shipped >30 days after order)",
)
def q4_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ------------------------------------------------------------ TPC-H Q7

@register(
    "a_q7_bination_volume",
    """
SELECT n_s.n_name AS supp_nation, n_c.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_c ON c_nationkey = n_c.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
WHERE (n_s.n_name = 'NATION_1' AND n_c.n_name = 'NATION_2')
   OR (n_s.n_name = 'NATION_2' AND n_c.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
    tags=("analytics", "join"),
    doc="TPC-H Q7 shape: two roles of the same dimension (supplier nation "
    "vs customer nation) with a symmetric pair filter, grouped by year — "
    "dims broadcast, fact shuffles once for the final aggregate",
)
def q7_bination_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n_c = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    df = (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
        .cast("double")
        .alias("revenue")
    )


# ------------------------------------------------------------ TPC-H Q14

@register(
    "a_q14_promo_revenue",
    """
WITH t AS (
  SELECT CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END AS promo,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
)
SELECT CAST(round(sum(promo), 2) AS DOUBLE) AS promo_revenue,
       CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
       floor(100.0 * CAST(round(sum(promo), 2) AS DOUBLE)
                   / CAST(round(sum(rev), 2) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS promo_pct
FROM t
""",
    tags=("analytics", "aggregation"),
    doc="TPC-H Q14 shape: conditional aggregate ratio (promo revenue share) "
    "over a month scan joined to the part dimension",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    agg = li.join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey")).agg(
        F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.floor(100.0 * F.col("promo_revenue") / F.col("total_revenue") * 1e6 + F.lit(0.5)) / 1e6)
        .alias("promo_pct"),
    )


# ------------------------------------------------------------ TPC-H Q19

@register(
    "a_q19_bracket_scan",
    """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    tags=("analytics", "join"),
    doc="TPC-H Q19 shape: OR-of-AND bracket predicates spanning both join "
    "sides — the single-side conjuncts (p_brand/p_size brackets) are "
    "pushable; the cross-side residual evaluates post-join",
)
def q19_bracket_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), F.col("p_partkey") == li["l_partkey"])
    bracket = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(bracket).agg(
        F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ------------------------------------------------------------ TPC-H Q8

@register(
    "a_q8_market_share",
    """
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         n_s.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n_c ON c_nationkey = n_c.n_nationkey
  JOIN region   ON n_c.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n_s ON s_nationkey = n_s.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
           AS nation_revenue,
       CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
       floor(CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                                 ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
             / CAST(round(sum(rev), 2) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share
FROM base GROUP BY o_year
""",
    tags=("analytics", "join"),
    doc="TPC-H Q8 shape: seven-table star (two nation roles + region gate) "
    "with a conditional-share aggregate by order year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_c = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n_s = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    base = (
        li.join(F.broadcast(orders), li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(part), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
    )
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast(DEC))
    agg = base.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(F.sum(nat), 2).cast("double").alias("nation_revenue"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.floor(F.col("nation_revenue") / F.col("total_revenue") * 1e6 + F.lit(0.5)) / 1e6)
        .alias("mkt_share"),
    )


# --------------------------------------------------------- funnel analysis

#: epoch micros in one week (funnel/retention bucketing)
WEEK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "a_funnel_steps",
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view_us,
         min(CASE WHEN event_type = 'click' THEN ts_us END) AS first_click_us,
         min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS first_purchase_us
  FROM e GROUP BY user_id
)
SELECT user_id, first_view_us, first_click_us, first_purchase_us,
       CAST(CASE
         WHEN first_view_us IS NOT NULL
          AND first_click_us IS NOT NULL AND first_click_us > first_view_us
          AND first_purchase_us IS NOT NULL AND first_purchase_us > first_click_us
         THEN 3
         WHEN first_view_us IS NOT NULL
          AND first_click_us IS NOT NULL AND first_click_us > first_view_us
         THEN 2
         WHEN first_view_us IS NOT NULL THEN 1
         ELSE 0 END AS BIGINT) AS funnel_stage
FROM firsts
""",
    tags=("analytics", "events"),
    doc="ordered funnel (view -> click -> purchase): per-user first-touch "
    "times via conditional min, stage = deepest strictly-ordered prefix",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("first_view_us"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts_us"))).alias("first_click_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("first_purchase_us"),
    )
    v, c, p = F.col("first_view_us"), F.col("first_click_us"), F.col("first_purchase_us")
    stage = (
        F.when(v.isNotNull() & c.isNotNull() & (c > v) & p.isNotNull() & (p > c), 3)
        .when(v.isNotNull() & c.isNotNull() & (c > v), 2)
        .when(v.isNotNull(), 1)
        .otherwise(0)
    )
    return firsts.select(
        "user_id", "first_view_us", "first_click_us", "first_purchase_us",
        stage.cast("long").alias("funnel_stage"),
    )


# --------------------------------------------------------- retention cohorts

@register(
    "a_retention_cohorts",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week - cohort_week AS BIGINT) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active_users
FROM e JOIN cohort USING (user_id)
GROUP BY 1, 2
""",
    tags=("analytics", "events"),
    doc="weekly retention cohorts: users bucketed by first-seen week, "
    "distinct-active counts per (cohort, week offset); broadcast cohort "
    "join, integer week arithmetic",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000) div {WEEK_US}").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active_users"))
    )


# --------------------------------------------- native session_window parity

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches a_sessionization


@register(
    "a_session_window_builtin",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         -- >= : session_window's end boundary is EXCLUSIVE (an event at
         -- exactly prev + gap opens a new session)
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS total_events,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(max(session_end_us - session_start_us) AS BIGINT) AS max_session_span_us
FROM per_session GROUP BY user_id
""",
    tags=("analytics", "window", "streaming-shape"),
    doc="Spark's native session_window aggregation (the state-store-backed "
    "streaming operator, run in batch) checked against the same lag/cumsum "
    "gap-sessionization oracle as the hand-rolled a_sessionization — "
    "built-in and manual semantics must agree",
)
def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
    )
    per_session = ev.groupBy(
        F.session_window("event_time", "30 minutes").alias("sw"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.max(F.col("session_end_us") - F.col("session_start_us"))
        .cast("long")
        .alias("max_session_span_us"),
    )


# ------------------------------------------------------------ exact quantiles

@register(
    "a_quantiles",
    """
SELECT l_returnflag,
       floor(quantile_cont(l_quantity, 0.25) * 1e6 + 0.5) / 1e6 AS qty_p25,
       floor(quantile_cont(l_quantity, 0.50) * 1e6 + 0.5) / 1e6 AS qty_p50,
       floor(quantile_cont(l_quantity, 0.75) * 1e6 + 0.5) / 1e6 AS qty_p75,
       floor(quantile_cont(l_quantity, 0.95) * 1e6 + 0.5) / 1e6 AS qty_p95,
       floor(quantile_cont(l_extendedprice, 0.50) * 1e6 + 0.5) / 1e6 AS price_median
FROM lineitem GROUP BY l_returnflag
""",
    tags=("analytics", "aggregation"),
    doc="exact linear-interpolation percentiles (Spark percentile == DuckDB "
    "quantile_cont bit-for-bit: same sorted-index formula) per return flag",
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def q6(expr):
        return (F.floor(F.expr(expr) * 1e6 + F.lit(0.5)) / 1e6)

    return li.groupBy("l_returnflag").agg(
        q6("percentile(l_quantity, 0.25)").alias("qty_p25"),
        q6("percentile(l_quantity, 0.50)").alias("qty_p50"),
        q6("percentile(l_quantity, 0.75)").alias("qty_p75"),
        q6("percentile(l_quantity, 0.95)").alias("qty_p95"),
        q6("percentile(l_extendedprice, 0.50)").alias("price_median"),
    )


# ------------------------------------------------------------ rolling window

@register(
    "a_rolling_revenue",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS day_revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT CAST(d AS VARCHAR) AS day,
       day_revenue,
       floor(avg(day_revenue) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             * 1e6 + 0.5) / 1e6 AS ma7,
       CAST(count(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_days_in_frame
FROM daily
""",
    tags=("analytics", "window"),
    doc="bounded-frame rolling aggregate: 7-day moving average over daily "
    "revenue (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW); decimal-exact "
    "daily sums, quantized average",
)
def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("day_revenue")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.col("d").cast("string").alias("day"),
        "day_revenue",
        (F.floor(F.avg("day_revenue").over(w) * 1e6 + F.lit(0.5)) / 1e6).alias("ma7"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days_in_frame"),
    )


# ----------------------------------------------------------- exact correlation

@register(
    "a_correlation",
    """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       floor((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e6 + 0.5) / 1e6
           AS corr_qty_price
FROM s
""",
    tags=("analytics", "aggregation"),
    doc="exact Pearson correlation via decimal sums + the product-moment "
    "identity (native corr() accumulates floats in shuffle order; decimal "
    "sums make it deterministic across engines)",
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(_dec("l_quantity")).cast("double")
    sy = F.sum(_dec("l_extendedprice")).cast("double")
    sxx = F.sum(_dec("l_quantity") * _dec("l_quantity")).cast("double")
    syy = F.sum(_dec("l_extendedprice") * _dec("l_extendedprice")).cast("double")
    sxy = F.sum(_dec("l_quantity") * _dec("l_extendedprice")).cast("double")
    agg = li.groupBy("l_returnflag").agg(
        n.alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxx.alias("sxx"), syy.alias("syy"), sxy.alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.floor(corr * 1e6 + F.lit(0.5)) / 1e6).alias("corr_qty_price"),
    )
