"""General analytics queries over the star schema — the relational surface
(joins, windows, rollup, pivot, semi/anti, top-k, sessionization, as-of)
that makes the engine a usable analytics system beyond the reference's
streaming parity (SURVEY.md §2.3 notes the reference has no joins; these are
the north-star extension mandated by BASELINE.json).

Float-determinism pattern: money aggregates are computed in DECIMAL (exact,
associative — safe under Spark's parallel partial aggregation), then
``round(..., 2)`` and cast to DOUBLE so both engines emit bit-identical
values.  Plain double sums would differ in the last bits because Spark sums
in shuffle-partition order and DuckDB sequentially.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.messages import MESSAGES_ORACLE_CTE, events_as_messages
from kafka_replicator_spark.sources.tables import load_table

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


# ------------------------------------------------------------ TPC-H Q1

@register(
    "a_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("analytics", "aggregation"),
    doc="TPC-H Q1 pricing summary: multi-aggregate groupBy with pushed-down "
    "date filter; DECIMAL-exact sums",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast(DEC) + _dec("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


# ------------------------------------------------------------ TPC-H Q3-ish

@register(
    "a_q3_top_revenue_orders",
    """
WITH revenue AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, CAST(round(rev, 2) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
FROM revenue
ORDER BY rev DESC, l_orderkey ASC
LIMIT 10
""",
    tags=("analytics", "join", "topk"),
    doc="TPC-H Q3 shape: 3-way join + group + deterministic top-10 "
    "(broadcast-able dims, AQE-planned join order)",
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev"))
        .orderBy(F.desc("rev"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round("rev", 2).cast("double").alias("revenue"),
            # date as a string: engines disagree on pandas datetime unit
            # (us vs ns), which can break a stringify-then-hash compare
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
    )


# ------------------------------------------------------------ TPC-H Q5-ish

@register(
    "a_q5_region_revenue",
    """
SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE') AND c_nationkey = s_nationkey
GROUP BY n_name
""",
    tags=("analytics", "join"),
    doc="TPC-H Q5 shape: 6-way star join with broadcast dims + local "
    "supplier predicate",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------- sessionization

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "a_sessionization",
    f"""
WITH messages AS ({MESSAGES_ORACLE_CTE}),
flagged AS (
  SELECT msg_key, ts_us, msg_offset,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM messages
  WINDOW w AS (PARTITION BY msg_key ORDER BY ts_us, msg_offset)
),
sess AS (
  SELECT msg_key, ts_us,
         sum(is_new) OVER (PARTITION BY msg_key ORDER BY ts_us, msg_offset
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT msg_key, session_id, count(*) AS n_events,
         max(ts_us) - min(ts_us) AS duration_us
  FROM sess GROUP BY msg_key, session_id
)
SELECT msg_key AS user_key, count(*) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS total_events,
       CAST(max(duration_us) AS BIGINT) AS max_session_duration_us
FROM per_session GROUP BY msg_key
""",
    tags=("analytics", "window", "streaming-shape"),
    doc="sessionization via gap detection: lag + running sum of session "
    "breaks (the batch shape of streaming session windows, T16 upgrade)",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = events_as_messages(spark, sf_dir)
    w = Window.partitionBy("msg_key").orderBy("ts_us", "msg_offset")
    w_run = Window.partitionBy("msg_key").orderBy("ts_us", "msg_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = msgs.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("is_new").over(w_run))
    per_session = sess.groupBy("msg_key", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
    return per_session.groupBy(F.col("msg_key").alias("user_key")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.max("duration_us").cast("long").alias("max_session_duration_us"),
    )


# -------------------------------------------------------------- top-k

@register(
    "a_topk_per_group",
    """
SELECT event_type, event_id, value AS event_value, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3
""",
    tags=("analytics", "window", "topk"),
    doc="top-k per group via ranking window (deterministic tie-break)",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "event_id", F.col("value").alias("event_value"), "rank")
    )


# -------------------------------------------------------------- rollup

@register(
    "a_rollup_orders",
    """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("analytics", "aggregation"),
    doc="hierarchical ROLLUP aggregation with subtotal rows",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------- pivot

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "a_pivot_event_counts",
    """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id
""",
    tags=("analytics", "pivot"),
    doc="pivot: event-type counts per user as columns",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    for t in EVENT_TYPES:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("long"))
    return out


# ------------------------------------------------------ running window

@register(
    "a_running_revenue",
    """
SELECT o_custkey, o_orderkey,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS running_total
FROM orders
""",
    tags=("analytics", "window"),
    doc="running total per customer (cumulative frame — the A8 window shape "
    "on business data)",
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(w), 2).cast("double").alias("running_total"),
    )


# ----------------------------------------------------------- semi / anti

@register(
    "a_semi_anti_customers",
    """
SELECT c_mktsegment,
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
FROM customer GROUP BY c_mktsegment
""",
    tags=("analytics", "join"),
    doc="left-semi / left-anti join semantics (EXISTS / NOT EXISTS)",
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_with_orders"))
    )
    without = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


# -------------------------------------------------------------- as-of join

@register(
    "a_asof_join",
    """
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events WHERE event_type = 'purchase'
)
SELECT purchase_id, user_id, last_click_id
FROM (
  SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS last_click_id,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts_us DESC, c.event_id DESC) AS rn
  FROM purchases p JOIN clicks c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
) WHERE rn = 1
""",
    tags=("analytics", "join", "asof"),
    doc="as-of join: latest click per user at-or-before each purchase — "
    "implemented Spark-side as per-group pd.merge_asof in applyInPandas "
    "(the guide's recommended pattern); oracle expresses the same semantics "
    "relationally.  Both streams live in the events table's time range so "
    "the fixture is non-degenerate (~1/4 of purchases match at sf0.01).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id", "event_type"
    )

    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        left = (
            pdf[pdf["side"] == "p"]
            .sort_values(["t", "event_id"])
            .rename(columns={"event_id": "purchase_id"})[["purchase_id", "user_id", "t"]]
        )
        right = (
            pdf[pdf["side"] == "c"]
            .sort_values(["t", "event_id"])
            .rename(columns={"event_id": "last_click_id"})[["t", "last_click_id"]]
        )
        if left.empty or right.empty:
            return pd.DataFrame(
                {"purchase_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "last_click_id": pd.Series(dtype="int64")}
            )
        # backward merge_asof on sorted (t, id) == latest click at-or-before,
        # max event_id on a timestamp tie — same tie-break as the oracle's
        # ORDER BY ts_us DESC, event_id DESC
        merged = pd.merge_asof(left, right, on="t", direction="backward")
        out = merged.dropna(subset=["last_click_id"])[
            ["purchase_id", "user_id", "last_click_id"]
        ]
        out["last_click_id"] = out["last_click_id"].astype("int64")
        return out

    # one union frame so each user group carries both sides into the pandas fn
    both = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.when(F.col("event_type") == "purchase", F.lit("p"))
            .otherwise(F.lit("c"))
            .alias("side"),
            "user_id",
            F.col("ts_us").alias("t"),
            "event_id",
        )
    )
    out_schema = "purchase_id long, user_id long, last_click_id long"
    return both.groupBy("user_id").applyInPandas(asof, schema=out_schema)


# ------------------------------------------------------------- set ops

@register(
    "a_set_ops",
    """
WITH building AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
machinery AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT 'intersect' AS op, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM building
                                            INTERSECT SELECT DISTINCT c_nationkey FROM machinery)
UNION ALL
SELECT 'except' AS op, c_nationkey FROM (SELECT DISTINCT c_nationkey FROM building
                                         EXCEPT SELECT DISTINCT c_nationkey FROM machinery)
""",
    tags=("analytics", "setop"),
    doc="INTERSECT / EXCEPT set operations (beyond-reference relational "
    "surface; the reference's only set op is the M1 union)",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    m = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey").distinct()
    inter = b.intersect(m).select(F.lit("intersect").alias("op"), "c_nationkey")
    exc = b.exceptAll(m).distinct().select(F.lit("except").alias("op"), "c_nationkey")
    return inter.unionByName(exc)


# ------------------------------------------------------ scalar functions

@register(
    "a_scalar_functions",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       upper(o_orderpriority) AS prio_upper,
       substr(o_orderstatus, 1, 1) AS status_code,
       CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
       CAST(floor(o_totalprice + 0.5) AS BIGINT) AS price_rounded,
       CAST(o_totalprice >= 100000 AS BOOLEAN) AS is_large
FROM orders
""",
    tags=("analytics", "scalar"),
    doc="scalar function surface: date extraction, string ops, arithmetic, "
    "predicates (X-family generalization)",
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        # floor(x+0.5), not round(): see a_window_functions note on
        # cross-engine round(double) tie-breaking
        F.floor(F.col("o_totalprice") + 0.5).cast("long").alias("price_rounded"),
        (F.col("o_totalprice") >= 100000).alias("is_large"),
    )


# ---------------------------------------------------- window function family

@register(
    "a_window_functions",
    """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS INTEGER) AS rn,
       CAST(rank() OVER v AS INTEGER) AS rnk,
       CAST(dense_rank() OVER v AS INTEGER) AS drnk,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       first_value(o_orderkey) OVER w AS first_order,
       CAST(floor((o_totalprice
             - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER p AS DOUBLE)
               / count(*) OVER p) * 100 + 0.5) AS BIGINT) AS diff_from_avg_cents
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       v AS (PARTITION BY o_custkey ORDER BY o_orderstatus),
       p AS (PARTITION BY o_custkey)
""",
    tags=("analytics", "window"),
    doc="analytic window family: row_number/rank/dense_rank/lag/lead/"
    "first_value + partition-average delta",
)
def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    p = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(v).alias("rnk"),
        F.dense_rank().over(v).alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        # avg(DECIMAL) semantics differ across engines, and round(double)
        # breaks decimal-string ties differently (Java shortest-repr
        # HALF_UP vs exact-binary) — quantize via floor(x*100+0.5) instead:
        # floor on doubles is exact and identical everywhere
        F.floor(
            (
                F.col("o_totalprice")
                - F.sum(_dec("o_totalprice")).over(p).cast("double")
                / F.count(F.lit(1)).over(p)
            )
            * 100
            + 0.5
        ).cast("long").alias("diff_from_avg_cents"),
    )


# -------------------------------------------------- shared-SQL front door

#: identical ANSI SQL text executed by BOTH engines — Spark via spark.sql
#: over registered views, DuckDB via the oracle. The strongest form of the
#: correctness contract: not merely equivalent plans, the same query text.
SHARED_SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
       CAST(max(o_orderkey) AS BIGINT) AS max_orderkey
FROM customer
JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

SHARED_SQL_GROUPING_SETS = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def _run_shared_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from kafka_replicator_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "a_shared_sql_revenue",
    SHARED_SQL_SEGMENT_REVENUE,
    tags=("analytics", "sql"),
    doc="SQL front door: the oracle's exact SQL text runs through spark.sql "
    "over registered views — same query string, two engines, one answer",
)
def q_shared_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_SEGMENT_REVENUE)


@register(
    "a_shared_sql_grouping_sets",
    SHARED_SQL_GROUPING_SETS,
    tags=("analytics", "sql", "aggregation"),
    doc="GROUPING SETS through the shared-SQL front door",
)
def q_shared_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_GROUPING_SETS)


SHARED_SQL_SCALAR_SUBQUERY = """
SELECT c_custkey, c_mktsegment,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT CAST(max(o_orderkey) AS BIGINT) FROM orders WHERE o_custkey = c_custkey)
           AS last_orderkey
FROM customer
WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 12
"""


@register(
    "a_shared_sql_scalar_subquery",
    SHARED_SQL_SCALAR_SUBQUERY,
    tags=("analytics", "sql", "join"),
    doc="correlated scalar subqueries through the shared-SQL front door "
    "(Catalyst decorrelates them into joins)",
)
def q_shared_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_SCALAR_SUBQUERY)


# ------------------------------------------------------------- range join

@register(
    "a_range_join",
    f"""
WITH messages AS ({MESSAGES_ORACLE_CTE}),
spans AS (
  SELECT partition_id, msg_offset // 100 AS span_id,
         (msg_offset // 100) * 100 AS span_start,
         (msg_offset // 100) * 100 + 99 AS span_end
  FROM messages GROUP BY partition_id, msg_offset // 100
)
SELECT m.partition_id, s.span_id, count(*) AS n_in_span,
       min(m.msg_offset) AS first_offset, max(m.msg_offset) AS last_offset
FROM messages m
JOIN spans s ON s.partition_id = m.partition_id
            AND m.msg_offset BETWEEN s.span_start AND s.span_end
GROUP BY m.partition_id, s.span_id
""",
    tags=("analytics", "join", "range"),
    doc="range (interval-containment) join via bucketization — the scale "
    "construction for a join Spark lacks natively (equi-join on covered "
    "buckets + exact refine, not a nested loop)",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.operators.temporal import bucketed_range_join

    msgs = events_as_messages(spark, sf_dir).select("partition_id", "msg_offset")
    spans = (
        msgs.withColumn("span_id", F.expr("msg_offset div 100"))
        .groupBy("partition_id", "span_id")
        .agg(
            (F.col("span_id") * 100).alias("span_start"),
            (F.col("span_id") * 100 + 99).alias("span_end"),
        )
        .select(
            F.col("partition_id").alias("s_partition_id"), "span_id", "span_start", "span_end"
        )
    )
    joined = bucketed_range_join(
        msgs, spans, left_point="msg_offset", right_start="span_start",
        right_end="span_end", bucket_width=100,
        extra_cond=F.col("partition_id") == F.col("s_partition_id"),
    )
    return joined.groupBy("partition_id", "span_id").agg(
        F.count(F.lit(1)).alias("n_in_span"),
        F.min("msg_offset").alias("first_offset"),
        F.max("msg_offset").alias("last_offset"),
    )


SHARED_SQL_CUBE = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n,
       CAST(min(o_orderkey) AS BIGINT) AS first_key
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register(
    "a_shared_sql_cube",
    SHARED_SQL_CUBE,
    tags=("analytics", "sql", "aggregation"),
    doc="CUBE aggregation through the shared-SQL front door",
)
def q_shared_sql_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_CUBE)


# ------------------------------------------------------ exact stats aggs

@register(
    "a_stats_aggregates",
    """
SELECT o_orderstatus,
       count(*) AS n,
       CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                  * 100 + 0.5) AS BIGINT) AS mean_cents,
       CAST(floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                  / (count(*) - 1) + 0.5) AS BIGINT) AS variance_floor
FROM orders GROUP BY o_orderstatus
""",
    tags=("analytics", "aggregation"),
    doc="exact mean/variance via decimal sums + the textbook identity "
    "(engines' native stddev use different accumulation orders; exact "
    "decimal sums make the statistic deterministic)",
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = F.sum(_dec("o_totalprice")).cast("double")
    s2 = F.sum(_dec("o_totalprice") * _dec("o_totalprice")).cast("double")
    n = F.count(F.lit(1))
    return orders.groupBy("o_orderstatus").agg(
        n.alias("n"),
        F.floor(s / n * 100 + 0.5).cast("long").alias("mean_cents"),
        F.floor((s2 - s * s / n) / (n - 1) + 0.5).cast("long").alias("variance_floor"),
    )


# ------------------------------------------------------------ TPC-H Q6

@register(
    "a_q6_forecast_revenue",
    """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.05
  AND l_quantity < 24
""",
    tags=("analytics", "aggregation"),
    doc="TPC-H Q6 shape: highly selective conjunctive scan filter (all "
    "predicates pushed to parquet) + single global aggregate",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.05)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ------------------------------------------------------------ TPC-H Q10

@register(
    "a_q10_returned_items",
    """
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    tags=("analytics", "join", "topk"),
    doc="TPC-H Q10 shape: returned-item revenue per customer — 4-way join, "
    "selective fact filter, deterministic top-20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ------------------------------------------------------ multi-distinct aggs

@register(
    "a_distinct_aggregates",
    """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_items
FROM lineitem GROUP BY l_returnflag
""",
    tags=("analytics", "aggregation"),
    doc="multiple DISTINCT aggregates in one groupBy (Spark's Expand-based "
    "multi-distinct plan)",
)
def q_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
    )

