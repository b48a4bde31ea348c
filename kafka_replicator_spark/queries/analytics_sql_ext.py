"""SQL-surface and robust-statistics analytics extensions: correlated
LATERAL joins through the shared-SQL front door, gaps-and-islands streaks,
Theil-Sen robust trend, Pareto concentration, and sequence mining.

Reference parity: none (segment-grain transport engine); this family
widens the relational surface a warehouse user expects — the LATERAL
correlated-subquery form, the classic islands idiom, robust alternatives
to the OLS trend (a_revenue_trend_ols), and market-concentration metrics.

Determinism: day grain is exact integer epoch-day; money is BIGINT cents;
medians/quantiles use power-of-two fractions only (0.5 / 0.75 — the cases
where Spark ``percentile`` and DuckDB ``quantile_cont`` agree bit-for-bit,
CLAUDE.md); per-pair doubles are fixed expressions over exact integers
rounded to 6 dp before any cross-row fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

_DAY_US = 86_400_000_000

# ----------------------------------------------- shared-SQL LATERAL join

#: identical ANSI SQL text executed by BOTH engines (the strongest
#: correctness contract — same query string, two engines).  The correlated
#: LATERAL subquery is the "top-n per outer row without a window over the
#: whole fact table" idiom; Spark ≥ 3.2 and DuckDB both support it.
SHARED_SQL_LATERAL = """
SELECT n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


def _run_shared_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    from kafka_replicator_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "a_shared_sql_lateral",
    SHARED_SQL_LATERAL,
    tags=("analytics", "sql"),
    doc="SQL front door: correlated LATERAL subquery (top-2 customers by "
    "balance per nation) — the exact oracle SQL text runs through "
    "spark.sql over registered views; Catalyst rewrites the correlated "
    "limit as a partitioned rank, DuckDB as a lateral scan, one answer",
)
def q_shared_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_LATERAL)


# ------------------------------------------- gaps-and-islands streaks

@register(
    "a_activity_streaks",
    f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
runs AS (
  SELECT user_id,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM ud
),
lens AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, island
),
longest AS (SELECT user_id, max(run_len) AS streak FROM lens GROUP BY user_id)
SELECT streak AS streak_len, CAST(count(*) AS BIGINT) AS n_users
FROM longest GROUP BY streak
""",
    tags=("analytics", "events", "window"),
    doc="gaps-and-islands: longest consecutive-active-day streak per user "
    "(day minus row_number island key — the classic idiom), reported as a "
    "streak-length histogram; every window is partitioned by user, so the "
    "plan holds at any user count — bounded output rows",
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr(f"(ts div 1000) div {_DAY_US}").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = ud.select(
        "user_id", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    lens = runs.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    longest = lens.groupBy("user_id").agg(F.max("run_len").alias("streak"))
    return longest.groupBy(F.col("streak").alias("streak_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --------------------------------------------------- Theil-Sen trend

@register(
    "a_theil_sen_trend",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
),
daily AS (SELECT day, CAST(sum(v) * 100 AS BIGINT) AS yc FROM d GROUP BY day),
slopes AS (
  SELECT round(CAST(b.yc - a.yc AS DOUBLE) / (b.day - a.day), 6) AS s
  FROM daily a JOIN daily b ON b.day > a.day
),
m AS (
  SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
         CAST(count(*) AS BIGINT) AS n_pairs,
         quantile_cont(s, 0.5) AS med
  FROM slopes
)
SELECT n_days, n_pairs, round(med / 100.0, 6) AS slope_median FROM m
""",
    tags=("analytics", "timeseries", "robust"),
    doc="Theil-Sen robust revenue trend: median of all pairwise daily "
    "slopes (insensitive to the outlier days that bend the OLS fit in "
    "a_revenue_trend_ols) — orders collapse to day grain FIRST so the "
    "pair join is day-range² not row², per-pair slope is one fixed double "
    "over BIGINT cents rounded 6 dp, median at the power-of-two fraction "
    "where both engines interpolate identically — 1 output row",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "orders").select(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
            "day"
        ),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    daily = track_cached(
        d.groupBy("day").agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("yc"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("yc").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("yc").alias("yb"))
    slopes = (
        a.join(b, F.col("db") > F.col("da"))
        .select(
            F.round(
                (F.col("yb") - F.col("ya")).cast("double") / (F.col("db") - F.col("da")),
                6,
            ).alias("s")
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    m = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("percentile(s, 0.5)").alias("med"),
    )
    return m.join(F.broadcast(n_days)).select(
        "n_days", "n_pairs", F.round(F.col("med") / 100.0, 6).alias("slope_median")
    )


# ------------------------------------------- Pareto concentration

@register(
    "a_pareto_top_quartile",
    """
WITH cr AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
thr AS (SELECT quantile_cont(cents, 0.75) AS t FROM cr),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_customers,
         CAST(count(*) FILTER (cents >= t) AS BIGINT) AS n_top,
         sum(cents::HUGEINT) AS total,
         sum(cents::HUGEINT) FILTER (cents >= t) AS top_sum,
         any_value(t) AS t
  FROM cr CROSS JOIN thr
)
SELECT n_customers, n_top,
       CAST((1000000::HUGEINT * top_sum) // total AS BIGINT) AS share_ppm,
       round(t / 100.0, 6) AS threshold
FROM agg
""",
    tags=("analytics", "concentration"),
    doc="revenue concentration: share of total order revenue held by "
    "customers at or above the 0.75 revenue quantile (power-of-two "
    "fraction — engines interpolate identically); per-customer cents "
    "aggregate first, the 1-row threshold broadcasts, share in exact "
    "integer ppm with HUGEINT/DECIMAL folds — 1 output row",
)
def q_pareto_top_quartile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cr = track_cached(
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
    )
    thr = cr.agg(F.expr("percentile(cents, 0.75)").alias("t"))
    agg = cr.join(F.broadcast(thr)).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum((F.col("cents") >= F.col("t")).cast("long")).cast("long").alias("n_top"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
        F.sum(
            F.when(F.col("cents") >= F.col("t"), F.col("cents"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("top_sum"),
        F.first("t").alias("t"),
    )
    return agg.select(
        "n_customers",
        "n_top",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * top_sum) div total AS BIGINT)"
        ).alias("share_ppm"),
        F.round(F.col("t") / 100.0, 6).alias("threshold"),
    )


# --------------------------------------------------- sequence mining

#: trigram patterns reported
_TRIGRAM_TOP = 15


@register(
    "a_event_trigrams",
    f"""
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
tri AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS trigram, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY 1
)
SELECT trigram, n FROM tri ORDER BY n DESC, trigram LIMIT {_TRIGRAM_TOP}
""",
    tags=("analytics", "events", "sequence"),
    doc="sequence mining lite: top event-type trigrams over per-user "
    "time-ordered streams (lead×2 windows partitioned by user, total "
    "order via the event_id tiebreak), distributed TakeOrdered for the "
    "top-k — pattern-cardinality intermediate, 15 output rows",
)
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = o.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    tri = (
        seq.where(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return tri.orderBy(F.col("n").desc(), "trigram").limit(_TRIGRAM_TOP)


# ------------------------------------------- shared-SQL correlated EXISTS

SHARED_SQL_EXISTS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


@register(
    "a_shared_sql_exists",
    SHARED_SQL_EXISTS,
    tags=("analytics", "sql"),
    doc="SQL front door: correlated EXISTS + NOT EXISTS in one predicate "
    "(big-ticket customers with no finished order) — the same query text "
    "both engines; Catalyst plans a semi + anti join pair, DuckDB a mark "
    "join, one answer",
)
def q_shared_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_EXISTS)


# --------------------------------------------- session entry/exit matrix

from kafka_replicator_spark.queries.analytics import SESSION_GAP_US  # noqa: E402
from kafka_replicator_spark.sources.messages import (  # noqa: E402
    MESSAGES_ORACLE_CTE,
    events_as_messages,
)


@register(
    "a_session_entry_exit",
    f"""
WITH messages AS ({MESSAGES_ORACLE_CTE}),
flagged AS (
  SELECT msg_key, ts_us, msg_offset, event_type,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM messages
  WINDOW w AS (PARTITION BY msg_key ORDER BY ts_us, msg_offset)
),
sess AS (
  SELECT msg_key, ts_us, msg_offset, event_type,
         sum(is_new) OVER (PARTITION BY msg_key ORDER BY ts_us, msg_offset
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
ends AS (
  SELECT msg_key, session_id,
         first(event_type ORDER BY ts_us, msg_offset) AS entry_type,
         last(event_type ORDER BY ts_us, msg_offset) AS exit_type
  FROM sess GROUP BY msg_key, session_id
)
SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
FROM ends GROUP BY entry_type, exit_type
""",
    tags=("analytics", "events", "session"),
    doc="session entry/exit matrix: first and last event type of every "
    "30-minute-gap session (the same sessionization recurrence as "
    "a_sessionization — shared gap constant and tie-break), counted into "
    "the entry×exit transition matrix; windows partition by user key, "
    "bounded output rows",
)
def q_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = events_as_messages(spark, sf_dir).select(
        "msg_key", "ts_us", "msg_offset", "event_type"
    )
    w = Window.partitionBy("msg_key").orderBy("ts_us", "msg_offset")
    flagged = m.select(
        "msg_key",
        "ts_us",
        "msg_offset",
        "event_type",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "msg_key",
        "event_type",
        "ts_us",
        "msg_offset",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    sw = Window.partitionBy("msg_key", "session_id").orderBy("ts_us", "msg_offset")
    ends = (
        sess.select(
            "msg_key",
            "session_id",
            F.first("event_type").over(sw).alias("entry_type"),
            F.last("event_type").over(
                sw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("exit_type"),
            F.row_number().over(sw).alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    return ends.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


# --------------------------------------------------- Tukey IQR outliers

@register(
    "a_iqr_outliers",
    """
WITH q AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type, any_value(q.n) AS n,
       CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       round(any_value(q.q1 - 1.5 * (q.q3 - q.q1)), 6) AS fence_lo,
       round(any_value(q.q3 + 1.5 * (q.q3 - q.q1)), 6) AS fence_hi
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type
""",
    tags=("analytics", "quality", "robust"),
    doc="Tukey IQR outlier fences per event type (the robust-quantile "
    "companion to a_anomaly_zscore/a_anomaly_mad): quartiles at "
    "power-of-two fractions (bit-identical interpolation both engines), "
    "1.5×IQR fences as fixed double expressions, outlier counts from one "
    "re-scan with the tiny quantile frame broadcast — type-cardinality "
    "output",
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("value") < lo).cast("long")).cast("long").alias("n_low"),
            F.sum((F.col("value") > hi).cast("long")).cast("long").alias("n_high"),
            F.round(F.first(lo), 6).alias("fence_lo"),
            F.round(F.first(hi), 6).alias("fence_hi"),
        )
    )


# ------------------------------------------- promo difference-in-differences

@register(
    "a_promo_diff_in_diff",
    f"""
WITH li AS (
  SELECT l_partkey,
         epoch_us(l_shipdate) // {_DAY_US} AS day,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM li),
cells AS (
  SELECT CAST(p.p_type LIKE 'PROMO%' AS INTEGER) AS treated,
         CAST(li.day >= (b.d0 + b.d1 + 1) // 2 AS INTEGER) AS post,
         CAST(round(sum(li.rev), 2) * 100 AS BIGINT) AS cents
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  CROSS JOIN bounds b
  GROUP BY 1, 2
)
SELECT
  CAST(max(CASE WHEN treated = 1 AND post = 0 THEN cents END) AS BIGINT) AS treat_pre,
  CAST(max(CASE WHEN treated = 1 AND post = 1 THEN cents END) AS BIGINT) AS treat_post,
  CAST(max(CASE WHEN treated = 0 AND post = 0 THEN cents END) AS BIGINT) AS ctrl_pre,
  CAST(max(CASE WHEN treated = 0 AND post = 1 THEN cents END) AS BIGINT) AS ctrl_post,
  CAST((max(CASE WHEN treated = 1 AND post = 1 THEN cents END)
        - max(CASE WHEN treated = 1 AND post = 0 THEN cents END))
       - (max(CASE WHEN treated = 0 AND post = 1 THEN cents END)
          - max(CASE WHEN treated = 0 AND post = 0 THEN cents END)) AS BIGINT) AS did_cents
FROM cells
""",
    tags=("analytics", "causal"),
    doc="difference-in-differences readout: promo-part revenue vs "
    "non-promo, before vs after the shipdate midpoint — the causal-effect "
    "shape of an experiment dashboard, exact BIGINT cents end to end "
    "(DECIMAL sums per cell, the 2x2 pivot via conditional max); part dim "
    "broadcasts, one fact aggregation — 1 output row",
)
def q_promo_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_DAY_US}").alias("day"),
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").cast("int").alias("treated")
    )
    bounds = li.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cells = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bounds))
        .select(
            "treated",
            (F.col("day") >= F.expr("(d0 + d1 + 1) div 2")).cast("int").alias("post"),
            "rev",
        )
        .groupBy("treated", "post")
        # the discount product carries scale 4 — round to money scale 2
        # BEFORE the cents cast (decimal→bigint truncates on Spark but
        # rounds on DuckDB; at scale 2 the ×100 is exactly integral)
        .agg(F.expr("CAST(round(sum(rev), 2) * 100 AS BIGINT)").alias("cents"))
    )
    cell = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("cents"))
    )
    return cells.agg(
        cell(1, 0).cast("long").alias("treat_pre"),
        cell(1, 1).cast("long").alias("treat_post"),
        cell(0, 0).cast("long").alias("ctrl_pre"),
        cell(0, 1).cast("long").alias("ctrl_post"),
        ((cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)))
        .cast("long")
        .alias("did_cents"),
    )


# ------------------------------------------------- shared-SQL set ops

SHARED_SQL_SETOPS = """
SELECT 'both_statuses' AS bucket, count(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
) t
UNION ALL
SELECT 'open_only' AS bucket, count(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
) t2
"""


@register(
    "a_shared_sql_setops",
    SHARED_SQL_SETOPS,
    tags=("analytics", "sql"),
    doc="SQL front door: INTERSECT / EXCEPT through the same-text contract "
    "(customers with both open and finished orders vs open-only) — the "
    "set-operator surface of a_set_ops exercised as literal ANSI SQL on "
    "both engines",
)
def q_shared_sql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_SETOPS)


# ------------------------------------------- seasonal-naive backtest

@register(
    "a_seasonal_naive_backtest",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
),
daily AS (SELECT day, CAST(sum(v) * 100 AS BIGINT) AS yc FROM d GROUP BY day),
scored AS (
  SELECT a.day, a.yc, p.yc AS pred,
         CAST((1000000::HUGEINT * abs(a.yc - p.yc)) // a.yc AS BIGINT) AS ape_ppm
  FROM daily a JOIN daily p ON p.day = a.day - 7
)
SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
       CAST(sum(ape_ppm) // count(*) AS BIGINT) AS mape_ppm,
       quantile_cont(ape_ppm, 0.5) AS median_ape_ppm
FROM scored
""",
    tags=("analytics", "timeseries", "backtest"),
    doc="seasonal-naive forecast backtest: predict each day's revenue with "
    "the same weekday one week earlier, report MAPE and median APE in "
    "exact ppm of actual cents — the baseline every forecasting model "
    "must beat; day-grain self-join on an equality key (day-7), all "
    "integer arithmetic — 1 output row",
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "orders").select(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    daily = track_cached(
        d.groupBy("day").agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("yc"))
    )
    pred = daily.select((F.col("day") + 7).alias("day"), F.col("yc").alias("pred"))
    # numerator lifted to DECIMAL(38,0) (HUGEINT in the oracle): a
    # high-revenue day at 100TB scale pushes 1e6 * day-cents past 2^63 —
    # int64 would wrap silently on Spark while DuckDB raises
    scored = daily.join(pred, "day").select(
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * abs(yc - pred)) div yc AS BIGINT)"
        ).alias("ape_ppm")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.expr("CAST(sum(ape_ppm) div count(1) AS BIGINT)").alias("mape_ppm"),
        F.expr("percentile(ape_ppm, 0.5)").alias("median_ape_ppm"),
    )


# --------------------------------------------------- churn hazard curve

_WEEK_US = 7 * _DAY_US


@register(
    "a_churn_hazard",
    f"""
WITH uw AS (
  SELECT user_id,
         min(epoch_us(ts) // {_WEEK_US}) AS w0,
         max(epoch_us(ts) // {_WEEK_US}) AS w1
  FROM events GROUP BY user_id
),
tenure AS (SELECT CAST(w1 - w0 AS BIGINT) AS t FROM uw),
per_t AS (SELECT t, CAST(count(*) AS BIGINT) AS n_churned FROM tenure GROUP BY t),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tenure),
curve AS (
  SELECT t, n_churned,
         CAST(tot.n - coalesce(sum(n_churned) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
  FROM per_t CROSS JOIN tot
)
SELECT t AS tenure_weeks, n_churned, n_at_risk,
       CAST((1000000 * n_churned) // n_at_risk AS BIGINT) AS hazard_ppm
FROM curve
""",
    tags=("analytics", "survival"),
    doc="discrete churn-hazard curve (survival analysis over user "
    "tenures): P(last activity at tenure week t | survived to t), with "
    "the at-risk set from a cumulative walk over the BOUNDED tenure-week "
    "grain (weeks in the corpus span — a bounded window at any user "
    "count); right-censoring by end-of-data is intentionally ignored "
    "(every user's last week counts as churn) — tenure-cardinality output",
)
def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    uw = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr(f"(ts div 1000) div {_WEEK_US}").alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("w0"), F.max("w").alias("w1"))
    )
    tenure = uw.select((F.col("w1") - F.col("w0")).cast("long").alias("t"))
    per_t = tenure.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    tot = per_t.agg(F.sum("n_churned").alias("n"))
    # tenure grain is bounded by the corpus week span — global window OK
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = per_t.join(F.broadcast(tot)).select(
        "t",
        "n_churned",
        (F.col("n") - F.coalesce(F.sum("n_churned").over(w), F.lit(0)))
        .cast("long")
        .alias("n_at_risk"),
    )
    return curve.select(
        F.col("t").alias("tenure_weeks"),
        "n_churned",
        "n_at_risk",
        F.expr("CAST((1000000 * n_churned) div n_at_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
    )


# --------------------------------------------- shared-SQL named windows

SHARED_SQL_NAMED_WINDOWS = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_order,
       CAST(sum(1) OVER wr AS BIGINT) AS order_seq,
       CAST(count(*) OVER p AS BIGINT) AS n_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       p AS (PARTITION BY o_custkey)
"""


@register(
    "a_shared_sql_named_windows",
    SHARED_SQL_NAMED_WINDOWS,
    tags=("analytics", "sql", "window"),
    doc="SQL front door: the WINDOW clause (three named window specs — "
    "ordered, explicit-ROWS-frame, unordered; Spark rejects inline "
    "refinement of a named window, so the frame gets its own name) as literal "
    "same-text SQL on both engines — the windowed companion to "
    "a_shared_sql_lateral/exists/setops",
)
def q_shared_sql_named_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_NAMED_WINDOWS)


# ------------------------------------------- nation revenue share drift

@register(
    "a_nation_share_drift",
    f"""
WITH o AS (
  SELECT c.c_nationkey AS nk,
         epoch_us(o.o_orderdate) // {_DAY_US} AS day,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
halves AS (
  SELECT nk, CAST(day >= (d0 + d1 + 1) // 2 AS INTEGER) AS late,
         CAST(sum(v) * 100 AS BIGINT) AS cents
  FROM o CROSS JOIN bounds GROUP BY 1, 2
),
tot AS (
  SELECT late, CAST(sum(cents) AS BIGINT) AS t FROM halves GROUP BY late
),
shares AS (
  SELECT h.nk, h.late,
         CAST((1000000::HUGEINT * h.cents) // t.t AS BIGINT) AS share_ppm
  FROM halves h JOIN tot t USING (late)
)
SELECT n.n_name,
       CAST(coalesce(e.share_ppm, 0) AS BIGINT) AS early_share_ppm,
       CAST(coalesce(l.share_ppm, 0) AS BIGINT) AS late_share_ppm,
       CAST(coalesce(l.share_ppm, 0) - coalesce(e.share_ppm, 0) AS BIGINT)
         AS drift_ppm
FROM nation n
LEFT JOIN (SELECT nk, share_ppm FROM shares WHERE late = 0) e ON e.nk = n.n_nationkey
LEFT JOIN (SELECT nk, share_ppm FROM shares WHERE late = 1) l ON l.nk = n.n_nationkey
""",
    tags=("analytics", "drift"),
    doc="nation revenue-share drift: each nation's share of total order "
    "revenue in the early vs late half of the date range and the ppm "
    "shift — the money-weighted companion to p_categorical_drift_chi2; "
    "customer/nation dims broadcast, one fact aggregation at "
    "nation x half grain, HUGEINT/DECIMAL share folds — 25 output rows",
)
def q_nation_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_nationkey").alias("nk"),
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
    )
    bounds = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    halves = (
        o.join(F.broadcast(bounds))
        .select(
            "nk",
            (F.col("day") >= F.expr("(d0 + d1 + 1) div 2")).cast("int").alias("late"),
            "v",
        )
        .groupBy("nk", "late")
        .agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("cents"))
    )
    from kafka_replicator_spark.cacheutil import track_cached

    halves = track_cached(halves)
    tot = halves.groupBy("late").agg(F.sum("cents").alias("t"))
    shares = halves.join(F.broadcast(tot), "late").select(
        "nk",
        "late",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cents) div t AS BIGINT)"
        ).alias("share_ppm"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    e = shares.where(F.col("late") == 0).select(
        F.col("nk").alias("nk_e"), F.col("share_ppm").alias("early_share_ppm")
    )
    l = shares.where(F.col("late") == 1).select(
        F.col("nk").alias("nk_l"), F.col("share_ppm").alias("late_share_ppm")
    )
    return (
        nation.join(F.broadcast(e), nation.n_nationkey == F.col("nk_e"), "left")
        .join(F.broadcast(l), nation.n_nationkey == F.col("nk_l"), "left")
        .select(
            "n_name",
            F.coalesce("early_share_ppm", F.lit(0)).cast("long").alias("early_share_ppm"),
            F.coalesce("late_share_ppm", F.lit(0)).cast("long").alias("late_share_ppm"),
            (
                F.coalesce("late_share_ppm", F.lit(0))
                - F.coalesce("early_share_ppm", F.lit(0))
            )
            .cast("long")
            .alias("drift_ppm"),
        )
    )


# ------------------------------------------- weekend effect Welch t-test

@register(
    "a_weekend_effect_ttest",
    f"""
WITH e AS (
  SELECT CAST((dayofweek(ts) IN (0, 6)) AS INTEGER) AS weekend,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
g AS (
  SELECT weekend, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) AS s,
         CAST(sum(v * v) AS DOUBLE) AS ss
  FROM e GROUP BY weekend
),
m AS (
  SELECT
    max(CASE WHEN weekend = 1 THEN n END) AS n1,
    max(CASE WHEN weekend = 1 THEN s END) AS s1,
    max(CASE WHEN weekend = 1 THEN ss END) AS ss1,
    max(CASE WHEN weekend = 0 THEN n END) AS n0,
    max(CASE WHEN weekend = 0 THEN s END) AS s0,
    max(CASE WHEN weekend = 0 THEN ss END) AS ss0
  FROM g
)
SELECT n1 AS n_weekend, n0 AS n_weekday,
       round(s1 / n1 - s0 / n0, 6) AS mean_diff,
       round((s1 / n1 - s0 / n0)
             / nullif(sqrt((ss1 / n1 - (s1 / n1) * (s1 / n1)) / nullif(n1 - 1, 0)
                           + (ss0 / n0 - (s0 / n0) * (s0 / n0)) / nullif(n0 - 1, 0)), 0),
             6) AS welch_t
FROM m
""",
    tags=("analytics", "stats", "eval"),
    doc="Welch two-sample t statistic for weekend vs weekday event value "
    "(the two-group companion to a_value_by_hour_anova): per-group "
    "DECIMAL-exact moments, one fixed double expression with "
    "nullif-guarded degenerate groups; Spark dayofweek is 1-based vs "
    "DuckDB 0-based — the Spark side subtracts 1 (CLAUDE.md gotcha) — "
    "1 output row",
)
def q_weekend_effect_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB: 0=Sunday..6=Saturday
        F.expr("CAST((dayofweek(timestamp_micros(ts div 1000)) - 1) IN (0, 6) AS INT)")
        .alias("weekend"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    g = e.groupBy("weekend").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("ss"),
    )
    cell = lambda w, c: F.max(F.when(F.col("weekend") == w, F.col(c)))  # noqa: E731
    m = g.agg(
        cell(1, "n").alias("n1"),
        cell(1, "s").alias("s1"),
        cell(1, "ss").alias("ss1"),
        cell(0, "n").alias("n0"),
        cell(0, "s").alias("s0"),
        cell(0, "ss").alias("ss0"),
    )
    mean_diff = F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")
    var1 = (F.col("ss1") / F.col("n1") - (F.col("s1") / F.col("n1")) * (F.col("s1") / F.col("n1"))) / F.nullif(F.col("n1") - 1, F.lit(0))
    var0 = (F.col("ss0") / F.col("n0") - (F.col("s0") / F.col("n0")) * (F.col("s0") / F.col("n0"))) / F.nullif(F.col("n0") - 1, F.lit(0))
    return m.select(
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("n0").cast("long").alias("n_weekday"),
        F.round(mean_diff, 6).alias("mean_diff"),
        F.round(mean_diff / F.nullif(F.sqrt(var1 + var0), F.lit(0.0)), 6).alias("welch_t"),
    )


# ------------------------------------------------- HHI market concentration

@register(
    "a_hhi_concentration",
    """
WITH cr AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
tot AS (SELECT seg, CAST(sum(cents) AS BIGINT) AS t FROM cr GROUP BY seg),
shares AS (
  SELECT cr.seg,
         CAST((1000000::HUGEINT * cr.cents) // tot.t AS BIGINT) AS share_ppm
  FROM cr JOIN tot USING (seg)
)
SELECT seg AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(share_ppm::HUGEINT * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares GROUP BY seg
""",
    tags=("analytics", "concentration"),
    doc="Herfindahl-Hirschman revenue concentration per market segment: "
    "sum of squared customer revenue shares (ppm² scaled back to ppm — "
    "1e6 = monopoly), shares quantized to integer ppm BEFORE squaring so "
    "the fold is exact HUGEINT/DECIMAL; customer-grain aggregation + a "
    "segment totals broadcast — segment-cardinality output",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cr = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
    )
    cr = track_cached(cr)
    tot = cr.groupBy("seg").agg(F.sum("cents").alias("t"))
    shares = cr.join(F.broadcast(tot), "seg").select(
        "seg",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * cents) div t AS BIGINT)"
        ).alias("share_ppm"),
    )
    return shares.groupBy(F.col("seg").alias("mktsegment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.expr(
            "CAST(sum(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)"
            " div 1000000 AS BIGINT)"
        ).alias("hhi_ppm"),
    )


# ------------------------------------------------- year-over-year growth

@register(
    "a_yoy_growth",
    """
WITH m AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mon,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT CAST(a.mon // 12 AS BIGINT) AS yr,
       CAST(a.mon % 12 + 1 AS BIGINT) AS mon,
       a.cents AS cents,
       p.cents AS cents_prev_year,
       CAST((1000000 * (a.cents - p.cents)) // p.cents AS BIGINT) AS yoy_growth_ppm
FROM m a JOIN m p ON p.mon = a.mon - 12
""",
    tags=("analytics", "timeseries"),
    doc="year-over-year monthly revenue growth: month-grain revenue in "
    "BIGINT cents self-joined on the month-minus-12 equality key, growth "
    "in exact signed ppm of the prior year — the reporting staple next to "
    "the trend fits; month-cardinality output",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = track_cached(
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").alias("mon")
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
    )
    p = m.select((F.col("mon") + 12).alias("mon"), F.col("cents").alias("cents_prev_year"))
    return m.join(p, "mon").select(
        F.expr("CAST(mon div 12 AS BIGINT)").alias("yr"),
        F.expr("CAST(mon % 12 + 1 AS BIGINT)").alias("mon"),
        "cents",
        "cents_prev_year",
        # signed division is portable as-is: Spark `div` and DuckDB `//`
        # BOTH truncate toward zero (verified; the floor-like DuckDB
        # behavior is negative list indices, not division)
        F.expr(
            "CAST((1000000 * (cents - cents_prev_year))"
            " div cents_prev_year AS BIGINT)"
        ).alias("yoy_growth_ppm"),
    )


# ------------------------------------------------- basket size histogram

@register(
    "a_basket_size_histogram",
    """
WITH b AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY n_items
""",
    tags=("analytics", "histogram"),
    doc="order basket-size distribution: lineitem count per order rolled "
    "into a bounded histogram (TPC-H caps baskets at 7) — the fact table "
    "collapses to order grain in one partial-aggregated shuffle, then to "
    "the bounded size grain; the denominator every per-basket rate in the "
    "suite normalizes by",
)
def q_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    return b.groupBy("n_items").agg(F.count(F.lit(1)).cast("long").alias("n_orders"))


# ------------------------------------------------- shared-SQL ROLLUP

SHARED_SQL_ROLLUP = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register(
    "a_shared_sql_rollup",
    SHARED_SQL_ROLLUP,
    tags=("analytics", "sql", "rollup"),
    doc="SQL front door: GROUP BY ROLLUP as literal same-text SQL — "
    "completes the grouping-analytics front-door set next to "
    "a_shared_sql_cube/grouping_sets (the DataFrame-side rollup is "
    "a_rollup_orders); hierarchy totals in one partial-aggregated pass",
)
def q_shared_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_ROLLUP)


# ------------------------------------------------- shared-SQL UNPIVOT

SHARED_SQL_UNPIVOT = """
SELECT yr, quarter, n_orders
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(sum(CASE WHEN quarter(o_orderdate) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
         CAST(sum(CASE WHEN quarter(o_orderdate) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2,
         CAST(sum(CASE WHEN quarter(o_orderdate) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS q3,
         CAST(sum(CASE WHEN quarter(o_orderdate) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS q4
  FROM orders GROUP BY year(o_orderdate)
) UNPIVOT (n_orders FOR quarter IN (q1, q2, q3, q4))
ORDER BY yr, quarter
"""


@register(
    "a_shared_sql_unpivot",
    SHARED_SQL_UNPIVOT,
    tags=("analytics", "sql", "unpivot"),
    doc="SQL front door: UNPIVOT as literal same-text SQL (verified: Spark "
    "4 and DuckDB 1.0 parse the identical UNPIVOT (v FOR k IN (...)) "
    "clause with the same label strings) — wide quarterly order counts "
    "melted back to long form; the relational melt every BI export path "
    "needs, completing the reshape front-door set next to "
    "a_pivot_event_counts (conditional-aggregate pivot)",
)
def q_shared_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_UNPIVOT)


# ------------------------------------------------- shared-SQL GROUP BY ALL

SHARED_SQL_GROUP_BY_ALL = """
SELECT o_orderstatus,
       o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""


@register(
    "a_shared_sql_group_by_all",
    SHARED_SQL_GROUP_BY_ALL,
    tags=("analytics", "sql", "grouping"),
    doc="SQL front door: GROUP BY ALL as literal same-text SQL (verified: "
    "Spark >= 3.4 and DuckDB both infer the grouping set from the "
    "non-aggregate select items) — the modern analyst shorthand that "
    "eliminates the classic select/group-by drift bug; completes the "
    "grouping front-door set next to rollup/cube/grouping-sets",
)
def q_shared_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_GROUP_BY_ALL)


# ------------------------------------------- shared-SQL lateral aliases

SHARED_SQL_LATERAL_ALIAS = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(floor(revenue_cents / n_orders) AS BIGINT) AS avg_cents,
       CAST(floor(avg_cents / 100) AS BIGINT) AS avg_dollars
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "a_shared_sql_lateral_alias",
    SHARED_SQL_LATERAL_ALIAS,
    tags=("analytics", "sql", "lateral"),
    doc="SQL front door: LATERAL COLUMN ALIASES as literal same-text SQL "
    "(verified: Spark >= 3.4 and DuckDB both resolve an alias defined "
    "earlier in the SAME select list, chained two deep here: "
    "revenue_cents -> avg_cents -> avg_dollars) — kills the classic "
    "copy-the-whole-expression duplication in report queries; division "
    "goes through floor(a / b) because BOTH engines double-divide "
    "integers (identical IEEE result -> identical floor), while a bare "
    "CAST of the double rounds on DuckDB and was off by one",
)
def q_shared_sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared_sql(spark, sf_dir, SHARED_SQL_LATERAL_ALIAS)
