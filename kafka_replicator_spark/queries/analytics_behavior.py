"""Behavioral-analytics query registrations over the events stream plus the
catalog skyline: Markov event transitions, time-decayed user value, value
histograms, and the 2-D Pareto frontier (functions/frontier.py).

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has no
analytics surface — these extend the events/catalog analytics families that
ride on the same normalized ``ts`` (epoch-nanos LONG via
sources.tables.load_table; oracle side uses ``epoch_us(ts)``).

Cross-engine determinism: counts and micro/milli units are exact integers;
the decay weight is ``round(exp(·), 9)`` so the only DOUBLE transcendental
is itself re-quantized before it multiplies anything; money follows the
DECIMAL(18,2) → round(2) → DOUBLE convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.frontier import skyline_2d
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: decay time-constant of the exponentially-decayed user value (microseconds)
DECAY_TAU_US = 7 * 24 * 3600 * 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.expr("ts div 1000").alias("ts_us")
    )


@register(
    "a_markov_transitions",
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS prev_type
  FROM e
), tr AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
), tot AS (
  SELECT prev_type, sum(n_transitions) AS n_from FROM tr GROUP BY prev_type
)
SELECT tr.prev_type, tr.event_type, tr.n_transitions,
       round(CAST(tr.n_transitions AS DOUBLE) / CAST(tot.n_from AS BIGINT), 6) AS prob
FROM tr JOIN tot USING (prev_type)
""",
    tags=("analytics", "events"),
    doc="first-order Markov transition matrix over per-user event sequences "
    "(lag window keyed by user — millions of small partitions at scale, "
    "never a global sort); probabilities via a broadcast per-state totals "
    "join, |event_types|^2 output rows",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    tr = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = tr.groupBy("prev_type").agg(F.sum("n_transitions").alias("n_from"))
    return tr.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("n_from"), 6).alias("prob"),
    )


@register(
    "a_decayed_value",
    f"""
WITH e AS (
  SELECT user_id, value, epoch_us(ts) AS ts_us FROM events
), mx AS (
  SELECT max(ts_us) AS tmax FROM e
), terms AS (
  SELECT user_id, value,
         CAST(round(value * round(exp(-CAST(tmax - ts_us AS DOUBLE) / {DECAY_TAU_US}), 9), 6)
              AS DECIMAL(18,6)) AS term
  FROM e, mx
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
       CAST(round(sum(term), 6) AS DOUBLE) AS decayed_value
FROM terms GROUP BY user_id
""",
    tags=("analytics", "events"),
    doc="exponentially time-decayed user value (tau = 7 days against the "
    "corpus max timestamp, broadcast 1-row frame); decay weight re-quantized "
    "to 9 dp before the multiply, terms folded as DECIMAL — "
    "order-independent exact aggregation",
)
def q_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    mx = ev.agg(F.max("ts_us").alias("tmax"))
    term = F.round(
        F.col("value")
        * F.round(F.exp(-((F.col("tmax") - F.col("ts_us")).cast("double")) / DECAY_TAU_US), 9),
        6,
    ).cast("decimal(18,6)")
    return (
        ev.join(F.broadcast(mx))
        .select("user_id", "value", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
            F.round(F.sum("term"), 6).cast("double").alias("decayed_value"),
        )
    )


@register(
    "a_value_histogram",
    """
WITH e AS (
  SELECT event_type, value, least(CAST(floor(value / 50) AS BIGINT), 9) AS bucket
  FROM events
)
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
       CAST(round(min(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS min_value,
       CAST(round(max(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_value
FROM e GROUP BY event_type, bucket
""",
    tags=("analytics", "events"),
    doc="fixed-width value histogram per event type (width 50, top bucket "
    "clamped): the one-pass partial-aggregated profile a monitoring "
    "pipeline keeps per stream; money in DECIMAL throughout",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type",
        "value",
        F.least(F.floor(F.col("value") / 50).cast("long"), F.lit(9).cast("long")).alias("bucket"),
    )
    dec = F.col("value").cast("decimal(18,2)")
    return ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(dec), 2).cast("double").alias("sum_value"),
        F.round(F.min(dec), 2).cast("double").alias("min_value"),
        F.round(F.max(dec), 2).cast("double").alias("max_value"),
    )


@register(
    "a_skyline_parts",
    """
SELECT a.p_partkey,
       CAST(round(CAST(a.p_retailprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS price,
       CAST(a.p_size AS BIGINT) AS size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
""",
    tags=("analytics", "catalog"),
    doc="2-D Pareto frontier over parts (cheapest price vs largest size) "
    "via the distributed sort-based skyline: per-cost group collapse + "
    "range partition + partition-local running max + broadcast boundary "
    "stitch (functions/frontier.py) — the oracle states dominance "
    "declaratively (NOT EXISTS), the Spark plan never goes quadratic",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    sky = skyline_2d(parts, "price", "size")
    return sky.select(
        "p_partkey",
        F.round(F.col("price").cast("decimal(18,2)"), 2).cast("double").alias("price"),
        "size",
    )


#: trailing window of the rolling activity count (microseconds)
ROLLING_7D_US = 7 * 24 * 3600 * 1_000_000


@register(
    "a_rolling_user_activity",
    f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT event_id, user_id, ts_us,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts_us
         RANGE BETWEEN {ROLLING_7D_US} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_7d
FROM e
""",
    tags=("analytics", "events"),
    doc="trailing-7-day activity count per event (RANGE window keyed by "
    "user — value-based frame is tie-order-insensitive, partitions are "
    "per-user at any scale)",
)
def q_rolling_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts_us")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLLING_7D_US, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts_us", F.count(F.lit(1)).over(w).alias("n_7d")
    )


@register(
    "a_revenue_momentum",
    """
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT CAST(month AS BIGINT) AS month,
       CAST(round(rev, 2) AS DOUBLE) AS revenue,
       CAST(round(lag(rev) OVER (ORDER BY month), 2) AS DOUBLE) AS prev_revenue,
       CAST(round(rev - lag(rev) OVER (ORDER BY month), 2) AS DOUBLE) AS delta
FROM m
""",
    tags=("analytics", "tpch"),
    doc="month-over-month order revenue momentum: the distributed DECIMAL "
    "aggregation collapses to month grain FIRST, so the lag window runs "
    "over a bounded-cardinality frame (the guarded small-side pattern) — "
    "never the order stream",
)
def q_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("month")
    return m.select(
        "month",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(F.lag("rev").over(w), 2).cast("double").alias("prev_revenue"),
        F.round(F.col("rev") - F.lag("rev").over(w), 2).cast("double").alias("delta"),
    )


@register(
    "a_anomaly_zscore",
    """
WITH e AS (SELECT event_type, value FROM events),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM e GROUP BY event_type
),
m AS (
  SELECT event_type, n, s / n AS mean,
         sqrt(greatest(s2 / n - (s / n) * (s / n), 0)) AS std
  FROM stats
)
SELECT e.event_type,
       m.n AS n_events,
       round(m.mean, 6) AS mean_value,
       round(m.std, 6) AS std_value,
       CAST(count(*) FILTER (WHERE abs(e.value - m.mean) > 3 * m.std) AS BIGINT)
           AS n_outliers
FROM e JOIN m USING (event_type)
GROUP BY e.event_type, m.n, m.mean, m.std
""",
    tags=("analytics", "events"),
    doc="per-type 3-sigma outlier counts: moments from exact DECIMAL "
    "sums (order-independent), the z-test re-joins the stream against a "
    "broadcast per-type stats frame — two passes, both partial-aggregated",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "value")
    dec = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    m = stats.select(
        "event_type",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    outlier = F.when(F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"), 1)
    return j.groupBy("event_type", "n", "mean", "std").agg(
        F.count(outlier).alias("n_outliers")
    ).select(
        "event_type",
        F.col("n").alias("n_events"),
        F.round("mean", 6).alias("mean_value"),
        F.round("std", 6).alias("std_value"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


#: RFM segmentation thresholds: recency days, frequency, monetary
RFM_RECENT_DAYS = 7
RFM_FREQ = 70
RFM_MONETARY = 15000


@register(
    "a_user_rfm",
    f"""
WITH e AS (
  SELECT user_id, value, epoch_us(ts) AS ts_us FROM events
), mx AS (SELECT max(ts_us) AS tmax FROM e),
per_user AS (
  SELECT user_id,
         CAST((tmax - max(ts_us)) // 86400000000 AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS monetary
  FROM e, mx GROUP BY user_id, tmax
)
SELECT user_id, recency_days, frequency, monetary,
       (CASE WHEN recency_days <= {RFM_RECENT_DAYS} THEN 'R' ELSE 'r' END ||
        CASE WHEN frequency >= {RFM_FREQ} THEN 'F' ELSE 'f' END ||
        CASE WHEN monetary >= {RFM_MONETARY} THEN 'M' ELSE 'm' END) AS segment
FROM per_user
""",
    tags=("analytics", "events"),
    doc="recency/frequency/monetary user segmentation against fixed "
    "thresholds — one user-keyed aggregation + a broadcast corpus-max "
    "frame; integer day recency, DECIMAL monetary",
)
def q_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "value", "ts_us")
    mx = ev.agg(F.max("ts_us").alias("tmax"))
    per_user = (
        ev.join(F.broadcast(mx))
        .groupBy("user_id", "tmax")
        .agg(
            F.max("ts_us").alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "user_id",
            F.expr("(tmax - last_us) div 86400000000").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    seg = F.concat(
        F.when(F.col("recency_days") <= RFM_RECENT_DAYS, F.lit("R")).otherwise(F.lit("r")),
        F.when(F.col("frequency") >= RFM_FREQ, F.lit("F")).otherwise(F.lit("f")),
        F.when(F.col("monetary") >= RFM_MONETARY, F.lit("M")).otherwise(F.lit("m")),
    )
    return per_user.select(
        "user_id", "recency_days", "frequency", "monetary", seg.alias("segment")
    )


@register(
    "a_nation_trade_balance",
    """
WITH cust AS (
  SELECT c.c_nationkey AS nationkey,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS cust_rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
),
supp AS (
  SELECT s.s_nationkey AS nationkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS supp_rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey
)
SELECT n.n_name,
       CAST(round(cust.cust_rev, 2) AS DOUBLE) AS cust_revenue,
       CAST(round(supp.supp_rev, 2) AS DOUBLE) AS supp_revenue,
       CAST(round(cust.cust_rev - supp.supp_rev, 2) AS DOUBLE) AS balance
FROM cust JOIN supp USING (nationkey)
JOIN nation n ON n.n_nationkey = nationkey
""",
    tags=("analytics", "tpch"),
    doc="per-nation trade balance: demand-side order revenue vs supply-side "
    "discounted lineitem revenue, both DECIMAL-aggregated to nation grain "
    "before the broadcast nation join — two fact shuffles total",
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("cust_rev"))
    )
    supp_rev = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("supp_rev")
        )
    )
    return (
        cust_rev.join(supp_rev, "nationkey")
        .join(F.broadcast(nation), F.col("nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round("cust_rev", 2).cast("double").alias("cust_revenue"),
            F.round("supp_rev", 2).cast("double").alias("supp_revenue"),
            F.round(F.col("cust_rev") - F.col("supp_rev"), 2).cast("double").alias("balance"),
        )
    )


@register(
    "a_time_seasonality",
    """
WITH e AS (
  SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr FROM events  -- DuckDB dow is 0-based (Sun=0); Spark's is 1-based
), cells AS (
  SELECT dow, hr, CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY dow, hr
), tot AS (SELECT sum(n_events) AS t FROM cells)
SELECT CAST(dow AS INTEGER) AS dow, CAST(hr AS INTEGER) AS hr, n_events,
       round(CAST(n_events AS DOUBLE) / CAST(t AS BIGINT), 6) AS share
FROM cells, tot
""",
    tags=("analytics", "events"),
    doc="day-of-week x hour traffic matrix with global shares — one "
    "partial-aggregated pass, broadcast 1-row total; calendar fields "
    "derive from the UTC-normalized event time (168 output cells max)",
)
def q_time_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("dayofweek(timestamp_micros(ts div 1000))").alias("dow"),
        F.expr("hour(timestamp_micros(ts div 1000))").alias("hr"),
    )
    from kafka_replicator_spark.cacheutil import track_cached

    # the 168-row cell frame feeds both output and the totals branch; cache
    # or the event scan + aggregation runs twice (no cross-branch reuse)
    cells = track_cached(ev.groupBy("dow", "hr").agg(F.count(F.lit(1)).alias("n_events")))
    tot = cells.agg(F.sum("n_events").alias("t"))
    return cells.join(F.broadcast(tot)).select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hr").cast("int").alias("hr"),
        "n_events",
        F.round(F.col("n_events") / F.col("t"), 6).alias("share"),
    )


#: epoch micros per week (weekly-active bucketing)
WEEK_US_WAU = 7 * 24 * 3600 * 1_000_000


@register(
    "a_weekly_active_users",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US_WAU} AS week FROM events
),
w AS (
  SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY week
)
SELECT CAST(week AS BIGINT) AS week, n_active, n_events,
       CAST(n_active - lag(n_active) OVER (ORDER BY week) AS BIGINT) AS wow_change
FROM w
""",
    tags=("analytics", "events"),
    doc="weekly active users with week-over-week change: the distinct "
    "aggregation collapses to week grain FIRST, so the lag window sees a "
    "bounded-cardinality frame (the guarded small-side pattern)",
)
def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {WEEK_US_WAU}").alias("week")
    )
    w = ev.groupBy("week").agg(
        F.count_distinct("user_id").alias("n_active"),
        F.count(F.lit(1)).alias("n_events"),
    )
    win = Window.orderBy("week")
    return w.select(
        "week",
        "n_active",
        "n_events",
        (F.col("n_active") - F.lag("n_active").over(win)).cast("long").alias("wow_change"),
    )


@register(
    "a_user_concentration",
    """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
),
thr AS (SELECT round(quantile_cont(n, 0.75), 6) AS p75 FROM per_user),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN n > thr.p75 THEN n ELSE 0 END) AS BIGINT) AS top_events,
         CAST(sum(CASE WHEN n > thr.p75 THEN 1 ELSE 0 END) AS BIGINT) AS top_users
  FROM per_user, thr GROUP BY thr.p75
)
SELECT agg.n_users, agg.n_events, agg.top_users, agg.top_events,
       (SELECT p75 FROM thr) AS p75_events,
       round(CAST(agg.top_events AS DOUBLE) / agg.n_events, 6) AS top_share
FROM agg
""",
    tags=("analytics", "events"),
    doc="activity concentration (Pareto check): share of all events from "
    "users above the 75th activity percentile — exact sort-based "
    "percentile (power-of-two fraction, bit-identical cross-engine), one "
    "user aggregation + a broadcast 1-row threshold",
)
def q_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    thr = per_user.agg(F.round(F.expr("percentile(n, 0.75D)"), 6).alias("p75"))
    j = per_user.join(F.broadcast(thr))
    return j.groupBy("p75").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
        F.sum(F.when(F.col("n") > F.col("p75"), 1).otherwise(0)).alias("top_users"),
        F.sum(F.when(F.col("n") > F.col("p75"), F.col("n")).otherwise(0)).alias("top_events"),
    ).select(
        "n_users",
        "n_events",
        "top_users",
        "top_events",
        F.col("p75").alias("p75_events"),
        F.round(F.col("top_events") / F.col("n_events"), 6).alias("top_share"),
    )


@register(
    "a_conversion_lag",
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS first_purchase
  FROM e GROUP BY user_id
),
conv AS (
  SELECT user_id, first_purchase - first_view AS lag_us
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase > first_view
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM firsts WHERE first_view IS NOT NULL)
           AS n_viewers,
       CAST(count(*) AS BIGINT) AS n_converted,
       CAST(sum(lag_us) AS BIGINT) // count(*) AS avg_lag_us,
       CAST(min(lag_us) AS BIGINT) AS min_lag_us,
       CAST(max(lag_us) AS BIGINT) AS max_lag_us
FROM conv
""",
    tags=("analytics", "events"),
    doc="view-to-purchase conversion latency: per-user first-touch "
    "conditional mins, strictly-ordered conversions only; integer-exact "
    "microsecond lags (avg via integer division)",
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("first_purchase"),
    )
    viewers = firsts.filter(F.col("first_view").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_viewers")
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select((F.col("first_purchase") - F.col("first_view")).alias("lag_us"))
    agg = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("sum(lag_us) div count(*)").alias("avg_lag_us"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
    )
    return agg.join(F.broadcast(viewers)).select(
        "n_viewers", "n_converted", "avg_lag_us", "min_lag_us", "max_lag_us"
    )
