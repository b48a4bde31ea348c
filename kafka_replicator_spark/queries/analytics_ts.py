"""Time-series / behavioral analytics over the events table: autocorrelation,
changepoint detection, co-occurrence lift, lifespan cohorts, DAU/MAU
stickiness, robust (MAD) anomaly flags, last-touch attribution.

All queries ride the normalized ``ts`` (epoch-nanos LONG via
sources.tables.load_table; ``ts_us = ts div 1000``, oracle ``epoch_us(ts)``).
Day grain is ``ts_us div DAY_US`` — exact integer bucketing on both engines.

Reference parity: the reference engine's temporal surface is segment-grain
(rollover windows, TTL ordering — covered by the r_t* queries); this family
is the event-grain analytics layer a consumer of those segments runs.

Scale notes: every query collapses the event stream to a bounded grain
(day / user-day / type-day) FIRST; windows only ever see the collapsed frame
(day-count- or per-user-sized partitions), never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import frontier
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: epoch micros per day
DAY_US = 86_400_000_000
#: last-touch attribution lookback window (7 days, micros)
ATTRIB_WINDOW_US = 7 * DAY_US


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("ts_us"),
    )


# ---------------------------------------------------------------------------


@register(
    "a_autocorr_daily",
    f"""
WITH e AS (
  SELECT epoch_us(ts) // {DAY_US} AS day, CAST(value AS DECIMAL(18,2)) AS v FROM events
),
daily AS (SELECT day, sum(v) AS total FROM e GROUP BY day),
lags AS (SELECT unnest(range(1, 8)) AS lag),
pairs AS (
  SELECT l.lag, x.total AS xv, y.total AS yv
  FROM daily x CROSS JOIN lags l JOIN daily y ON y.day = x.day + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xv) AS DOUBLE) AS sx, CAST(sum(yv) AS DOUBLE) AS sy,
         CAST(sum(xv * yv) AS DOUBLE) AS sxy,
         CAST(sum(xv * xv) AS DOUBLE) AS sx2,
         CAST(sum(yv * yv) AS DOUBLE) AS sy2
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n AS n_pairs,
       round((n * sxy - sx * sy)
             / nullif(sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 0), 6)
         AS autocorr
FROM m
""",
    tags=("analytics", "timeseries"),
    doc="lag-1..7 autocorrelation of daily revenue: events collapse to day "
    "grain first (the lag self-join touches a day-count-sized frame, "
    "broadcast at any corpus size); Pearson moments fold as DECIMAL and "
    "the correlation is one fixed double expression over exact sums",
)
def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        F.expr(f"ts_us div {DAY_US}").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    daily = track_cached(ev.groupBy("day").agg(F.sum("v").alias("total")))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    x = daily.select(F.col("day").alias("xday"), F.col("total").alias("xv"))
    y = daily.select(F.col("day").alias("yday"), F.col("total").alias("yv"))
    pairs = (
        x.join(F.broadcast(lags))
        .join(F.broadcast(y), F.col("yday") == F.col("xday") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xv").cast("double").alias("sx"),
        F.sum("yv").cast("double").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).cast("double").alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).cast("double").alias("sx2"),
        F.sum(F.col("yv") * F.col("yv")).cast("double").alias("sy2"),
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.sqrt(
                    (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
                    * (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("autocorr"),
    )


# ---------------------------------------------------------------------------


@register(
    "a_cusum_changepoint",
    f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(n) AS BIGINT) AS s_n
  FROM d GROUP BY event_type
),
pre AS (
  SELECT d.event_type, d.day, tot.n_days, tot.s_n,
         CAST(row_number() OVER w AS BIGINT) AS k,
         CAST(sum(n) OVER w AS BIGINT) AS s_k
  FROM d JOIN tot USING (event_type)
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
splits AS (
  SELECT event_type, day, n_days,
         (1000000 * abs(s_k * (n_days - k) - (s_n - s_k) * k))
           // (k * (n_days - k)) AS delta_ppm
  FROM pre WHERE k < n_days
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY delta_ppm DESC, day ASC) AS r
  FROM splits
)
SELECT event_type, day AS split_day, n_days, delta_ppm
FROM best WHERE r = 1
""",
    tags=("analytics", "timeseries"),
    doc="CUSUM-style changepoint per event type: the split maximizing "
    "|left mean - right mean| of daily counts, exact integer ppm via "
    "cross-multiplied fractions (earliest-day tie-break); events collapse "
    "to type-day grain first so every window is day-count-sized",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us div {DAY_US}").alias("day")
    )
    d = track_cached(
        ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("s_n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = d.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n_days",
        "s_n",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("k"),
        F.sum("n").over(w).cast("long").alias("s_k"),
    )
    splits = pre.where(F.col("k") < F.col("n_days")).select(
        "event_type",
        "day",
        "n_days",
        F.expr(
            "(1000000 * abs(s_k * (n_days - k) - (s_n - s_k) * k))"
            " div (k * (n_days - k))"
        ).alias("delta_ppm"),
    )
    r = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.col("delta_ppm").desc(), F.col("day").asc()
        )
    )
    return (
        splits.withColumn("r", r)
        .where(F.col("r") == 1)
        .select("event_type", F.col("day").alias("split_day"), "n_days", "delta_ppm")
    )


# ---------------------------------------------------------------------------


@register(
    "a_event_type_lift",
    f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day, event_type FROM events
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT user_id, day FROM ud)),
n_t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ud GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ud a JOIN ud b
    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.type_a, p.type_b, p.n_both, na.n AS n_a, nb.n AS n_b,
       CAST((1000000::HUGEINT * p.n_both * tot.n)
         // (na.n::HUGEINT * nb.n) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN n_t na ON na.event_type = p.type_a
JOIN n_t nb ON nb.event_type = p.type_b
CROSS JOIN tot
""",
    tags=("analytics", "events"),
    doc="event-type co-occurrence lift over user-days (market-basket "
    "association): P(a,b)/(P(a)P(b)) in exact integer ppm; the stream "
    "collapses to DISTINCT (user, day, type) before the self-join, whose "
    "fan-out is bounded by the type count per user-day — type-pair output",
)
def q_event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = track_cached(
        _events(spark, sf_dir)
        .select("user_id", F.expr(f"ts_us div {DAY_US}").alias("day"), "event_type")
        .distinct()
    )
    tot = (
        ud.select("user_id", "day").distinct().agg(F.count(F.lit(1)).alias("n_tot"))
    )
    n_t = ud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ud.select("user_id", "day", F.col("event_type").alias("type_a"))
    b = ud.select("user_id", "day", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = n_t.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = n_t.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .join(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            # DECIMAL(38,0) lift before the x1e6 ppm multiply: the triple
            # count product wraps int64 silently once n_both*n_tot > ~9e12
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * n_both * n_tot)"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            ).alias("lift_ppm"),
        )
    )


# ---------------------------------------------------------------------------


@register(
    "a_user_lifespan",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
),
per_user AS (
  SELECT user_id, min(day) AS first_day, max(day) AS last_day,
         CAST(count(DISTINCT day) AS BIGINT) AS n_active_days,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY user_id
)
SELECT (last_day - first_day) // 7 AS span_weeks,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_active_days) AS BIGINT) AS sum_active_days,
       CAST(sum(n_events) AS BIGINT) AS sum_events,
       CAST((1000 * sum(n_active_days)) // count(*) AS BIGINT) AS avg_active_days_milli
FROM per_user GROUP BY span_weeks
""",
    tags=("analytics", "events"),
    doc="user lifespan cohorts: per-user first/last activity span rolled "
    "into a weeks-histogram with average active days in exact integer "
    "milli-units — two aggregations, week-count output rows",
)
def q_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {DAY_US}").alias("day")
    )
    per_user = e.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count_distinct("day").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_user.withColumn(
            "span_weeks", F.expr("(last_day - first_day) div 7")
        )
        .groupBy("span_weeks")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_active_days").alias("sum_active_days"),
            F.sum("n_events").alias("sum_events"),
            F.expr("(1000 * sum(n_active_days)) div count(1)").alias(
                "avg_active_days_milli"
            ),
        )
    )


# ---------------------------------------------------------------------------


@register(
    "a_stickiness",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
),
dau AS (
  SELECT day // 30 AS w, day, CAST(count(DISTINCT user_id) AS BIGINT) AS du
  FROM e GROUP BY day // 30, day
),
mau AS (
  SELECT day // 30 AS w, CAST(count(DISTINCT user_id) AS BIGINT) AS mu
  FROM e GROUP BY day // 30
),
agg AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_days, CAST(sum(du) AS BIGINT) AS sum_dau
  FROM dau GROUP BY w
)
SELECT agg.w AS window_30d, agg.n_days, agg.sum_dau, mau.mu AS mau,
       (1000000 * agg.sum_dau) // (agg.n_days * mau.mu) AS stickiness_ppm
FROM agg JOIN mau USING (w)
""",
    tags=("analytics", "events"),
    doc="DAU/MAU stickiness per 30-day window (avg daily actives over "
    "window actives, exact integer ppm): two distinct aggregations at day "
    "and window grain — window-count output rows",
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = track_cached(
        _events(spark, sf_dir).select(
            "user_id", F.expr(f"ts_us div {DAY_US}").alias("day")
        )
    )
    dau = e.groupBy(F.expr("day div 30").alias("w"), F.col("day")).agg(
        F.count_distinct("user_id").alias("du")
    )
    mau = e.groupBy(F.expr("day div 30").alias("w")).agg(
        F.count_distinct("user_id").alias("mu")
    )
    agg = dau.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("du").alias("sum_dau")
    )
    return agg.join(F.broadcast(mau), "w").select(
        F.col("w").alias("window_30d"),
        "n_days",
        "sum_dau",
        F.col("mu").alias("mau"),
        F.expr("(1000000 * sum_dau) div (n_days * mu)").alias("stickiness_ppm"),
    )


# ---------------------------------------------------------------------------


@register(
    "a_anomaly_mad",
    f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {DAY_US} AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day
),
med AS (
  SELECT event_type, round(quantile_cont(n, 0.5), 6) AS med FROM d GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n, med.med, abs(d.n - med.med) AS dv
  FROM d JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(dv, 0.5), 6) AS mad FROM dev GROUP BY event_type
)
SELECT dev.event_type, dev.day, dev.n,
       dev.med AS median_daily, mad.mad AS mad_daily
FROM dev JOIN mad USING (event_type)
WHERE dev.dv > 3 * mad.mad
""",
    tags=("analytics", "timeseries"),
    doc="robust daily-volume anomalies via median absolute deviation "
    "(|count - median| > 3 MAD): the MAD-vs-stddev robustness upgrade of "
    "a_anomaly_zscore; medians are exact sort-based percentiles at the 0.5 "
    "fraction (bit-identical cross-engine), computed on the bounded "
    "type-day frame",
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type", F.expr(f"ts_us div {DAY_US}").alias("day")
    )
    d = track_cached(
        ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    )
    med = d.groupBy("event_type").agg(
        F.round(F.expr("percentile(n, 0.5D)"), 6).alias("med")
    )
    dev = track_cached(
        d.join(F.broadcast(med), "event_type").withColumn(
            "dv", F.abs(F.col("n") - F.col("med"))
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(dv, 0.5D)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dv") > 3 * F.col("mad"))
        .select(
            "event_type",
            "day",
            "n",
            F.col("med").alias("median_daily"),
            F.col("mad").alias("mad_daily"),
        )
    )


# ---------------------------------------------------------------------------


@register(
    "a_attribution_last_touch",
    f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
),
w AS (
  SELECT *,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER uw AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END IGNORE NULLS)
           OVER uw AS touch_ts
  FROM e
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
p AS (
  SELECT CASE WHEN touch_ts IS NULL OR ts_us - touch_ts > {ATTRIB_WINDOW_US}
              THEN 'none' ELSE touch_type END AS attributed_to,
         value
  FROM w WHERE event_type = 'purchase'
)
SELECT attributed_to,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS attributed_revenue
FROM p GROUP BY attributed_to
""",
    tags=("analytics", "events"),
    doc="last-touch attribution: each purchase credits the user's most "
    "recent prior non-purchase event within 7 days ('none' past the "
    "window); one per-user ordered window over the event stream — "
    "per-user partitions, touch-type output rows; DECIMAL revenue fold",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    uw = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), True
    ).over(uw)
    touch_ts = F.last(
        F.when(F.col("event_type") != "purchase", F.col("ts_us")), True
    ).over(uw)
    w = e.select(
        "event_type",
        "value",
        "ts_us",
        touch_type.alias("touch_type"),
        touch_ts.alias("touch_ts"),
    )
    p = w.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_ts").isNull()
            | (F.col("ts_us") - F.col("touch_ts") > ATTRIB_WINDOW_US),
            "none",
        )
        .otherwise(F.col("touch_type"))
        .alias("attributed_to"),
        "value",
    )
    return p.groupBy("attributed_to").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("attributed_revenue"),
    )


# ---------------------------------------------------------------------------

#: epoch micros per week (growth accounting grain)
WEEK_US = 7 * DAY_US


@register(
    "a_growth_accounting",
    f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
),
ext AS (SELECT CAST(max(week) AS BIGINT) AS max_week FROM uw),
w AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS first_week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
  FROM uw
),
active AS (
  SELECT week,
         CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN prev_week = week - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN week > first_week AND (prev_week IS NULL OR prev_week < week - 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM w GROUP BY week
),
churn AS (
  SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
  FROM w, ext
  WHERE (next_week IS NULL OR next_week > week + 1) AND week + 1 <= ext.max_week
  GROUP BY week + 1
)
SELECT coalesce(active.week, churn.week) AS week,
       coalesce(active.n_new, 0) AS n_new,
       coalesce(active.n_retained, 0) AS n_retained,
       coalesce(active.n_resurrected, 0) AS n_resurrected,
       coalesce(churn.n_churned, 0) AS n_churned
FROM active FULL JOIN churn USING (week)
""",
    tags=("analytics", "events"),
    doc="growth accounting (new / retained / resurrected / churned users "
    "per week — the standard growth ledger): the stream collapses to "
    "DISTINCT (user, week) first, lag/lead windows run on per-user "
    "partitions of that bounded frame; churn attributes to the following "
    "week, capped at the corpus horizon",
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    uw = track_cached(
        _events(spark, sf_dir)
        .select("user_id", F.expr(f"ts_us div {WEEK_US}").alias("week"))
        .distinct()
    )
    ext = uw.agg(F.max("week").alias("max_week"))
    per_user = Window.partitionBy("user_id")
    ordered = Window.partitionBy("user_id").orderBy("week")
    w = track_cached(
        uw.select(
            "user_id",
            "week",
            F.min("week").over(per_user).alias("first_week"),
            F.lag("week").over(ordered).alias("prev_week"),
            F.lead("week").over(ordered).alias("next_week"),
        )
    )
    active = w.groupBy("week").agg(
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(F.when(F.col("prev_week") == F.col("week") - 1, 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (F.col("prev_week").isNull() | (F.col("prev_week") < F.col("week") - 1)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churn = (
        w.join(F.broadcast(ext))
        .where(
            (F.col("next_week").isNull() | (F.col("next_week") > F.col("week") + 1))
            & (F.col("week") + 1 <= F.col("max_week"))
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    # FULL join: a week can be churn-only (nobody active that week) — a
    # LEFT join would silently drop its churn count from the ledger
    return active.join(churn, "week", "full").select(
        "week",
        F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        F.coalesce(F.col("n_retained"), F.lit(0)).alias("n_retained"),
        F.coalesce(F.col("n_resurrected"), F.lit(0)).alias("n_resurrected"),
        F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
    )


#: paths reported by a_top_event_paths / path length
PATH_LEN = 5
PATH_TOP = 20


@register(
    "a_top_event_paths",
    f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
ranked AS (
  SELECT user_id, event_type, ts_us, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
  FROM e
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {PATH_LEN} GROUP BY user_id
),
counts AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM paths GROUP BY path
)
SELECT path, n_users FROM counts ORDER BY n_users DESC, path LIMIT {PATH_TOP}
""",
    tags=("analytics", "events"),
    doc="top opening event paths (first 5 events per user joined '>'): the "
    "Sankey/onboarding-flow census; per-user rank windows on user-sized "
    "partitions, path counts via one aggregation, top-k by distributed "
    "TakeOrdered",
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    )
    ranked = e.withColumn("rn", rn).where(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(rn, event_type))),"
            " x -> x.event_type), '>')"
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    return counts.orderBy(F.col("n_users").desc(), "path").limit(PATH_TOP)


# ---------------------------------------------------------------------------


@register(
    "a_cohort_ltv",
    f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS week,
         CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
              ELSE CAST(0 AS DECIMAL(18,2)) END AS rev
  FROM events
),
first_w AS (SELECT user_id, CAST(min(week) AS BIGINT) AS cohort FROM e GROUP BY user_id),
cells AS (
  SELECT first_w.cohort, CAST(e.week - first_w.cohort AS BIGINT) AS week_index,
         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
         CAST(round(sum(e.rev), 2) AS DOUBLE) AS revenue
  FROM e JOIN first_w USING (user_id)
  GROUP BY first_w.cohort, e.week - first_w.cohort
),
sizes AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM first_w GROUP BY cohort)
SELECT cells.cohort, cells.week_index, sizes.cohort_size, cells.n_active, cells.revenue
FROM cells JOIN sizes USING (cohort)
""",
    tags=("analytics", "events"),
    doc="cohort lifetime-value matrix: purchase revenue by (first-seen "
    "week cohort x weeks-since-first) with cohort sizes — the revenue "
    "companion of a_retention_cohorts; the first-seen map is user-grain "
    "and joins back on the user key, DECIMAL revenue folds, "
    "weeks^2-bounded output",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = track_cached(
        _events(spark, sf_dir).select(
            "user_id",
            F.expr(f"ts_us div {WEEK_US}").alias("week"),
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            )
            .otherwise(F.lit(0).cast("decimal(18,2)"))
            .alias("rev"),
        )
    )
    first_w = track_cached(
        e.groupBy("user_id").agg(F.min("week").alias("cohort"))
    )
    cells = (
        e.join(first_w, "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("week_index"))
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
    )
    sizes = first_w.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort", "week_index", "cohort_size", "n_active", "revenue"
    )


@register(
    "a_shipping_lag",
    f"""
WITH lag_days AS (
  SELECT (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // {DAY_US} AS lag_d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(min(lag_d) AS BIGINT) AS min_days,
       CAST(max(lag_d) AS BIGINT) AS max_days,
       CAST(sum(lag_d) // count(*) AS BIGINT) AS avg_days,
       round(quantile_cont(lag_d, 0.25), 6) AS p25_days,
       round(quantile_cont(lag_d, 0.5), 6) AS p50_days,
       round(quantile_cont(lag_d, 0.75), 6) AS p75_days
FROM lag_days
""",
    tags=("analytics", "relational"),
    doc="order-to-ship lag distribution: integer day deltas through the "
    "orderkey join, exact integer mean + sort-based quartiles at "
    "power-of-two fractions — 1 output row",
)
def q_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").alias("ship_us"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("order_us"),
    )
    lag_d = li.join(o, "l_orderkey").select(
        F.expr(f"(ship_us - order_us) div {DAY_US}").alias("lag_d")
    )
    return lag_d.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.min("lag_d").alias("min_days"),
        F.max("lag_d").alias("max_days"),
        F.expr("sum(lag_d) div count(1)").alias("avg_days"),
        F.round(F.expr("percentile(lag_d, 0.25D)"), 6).alias("p25_days"),
        F.round(F.expr("percentile(lag_d, 0.5D)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(lag_d, 0.75D)"), 6).alias("p75_days"),
    )


# ---------------------------------------------------------------------------

#: half-open activity interval attached to each event (30 min, micros)
INTERVAL_US = 30 * 60 * 1_000_000


@register(
    "a_interval_merge",
    f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {INTERVAL_US} AS e FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM marked
),
merged AS (
  SELECT user_id, island_id,
         CAST(min(s) AS BIGINT) AS island_start, CAST(max(e) AS BIGINT) AS island_end
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(island_end - island_start) AS BIGINT) AS covered_us,
       CAST(max(island_end - island_start) AS BIGINT) AS max_island_us
FROM merged GROUP BY user_id
""",
    tags=("analytics", "events", "temporal"),
    doc="interval union (gaps-and-islands): each event opens a 30-minute "
    "activity interval; overlapping intervals merge via the running-max-"
    "end prefix window (per-user partitions), islands aggregate to "
    "covered-time stats — the busy-period primitive under SLA/usage "
    "metering; all integer micros",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts_us").alias("s"),
        (F.col("ts_us") + INTERVAL_US).alias("e"),
    )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)), 1
        ).otherwise(0),
    )
    islands = marked.withColumn("island_id", F.sum("new_island").over(run))
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered_us"),
        F.max(F.col("island_end") - F.col("island_start")).alias("max_island_us"),
    )


@register(
    "a_weighted_median_price",
    frontier.weighted_median_sql(
        "lineitem",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "round(l_quantity)",
    ),
    tags=("analytics", "relational"),
    doc="exact quantity-weighted median line price (cents): the smallest "
    "price whose running quantity reaches half the total — built on the "
    "range-partition prefix stitch (functions/stitch.py), the third "
    "consumer of that scaffold after the skyline and the shard planner; "
    "never a global single-partition window",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("price_cents"),
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("qty"),
    )
    return frontier.weighted_median(li, "price_cents", "qty")


# -------------------------------------------- shared-SQL recursive front door

#: identical ANSI SQL text executed by BOTH engines (the shared-SQL front
#: door convention of queries/analytics.py) — WITH RECURSIVE generates the
#: complete month spine so zero-activity months surface as explicit rows,
#: the classic time-series gap fill
SHARED_SQL_RECURSIVE_SPINE = """
WITH RECURSIVE bounds AS (
  SELECT CAST(min(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT) AS lo,
         CAST(max(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT) AS hi
  FROM orders
),
seg(a, b) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT CASE WHEN side = 0 THEN a ELSE CAST(floor((a + b) / 2.0) AS BIGINT) + 1 END,
         CASE WHEN side = 0 THEN CAST(floor((a + b) / 2.0) AS BIGINT) ELSE b END
  FROM seg CROSS JOIN (VALUES (0), (1)) AS s(side)
  WHERE a < b
),
monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY year(o_orderdate) * 12 + month(o_orderdate)
)
SELECT seg.a AS month_index, coalesce(monthly.n_orders, 0) AS n_orders
FROM seg LEFT JOIN monthly ON monthly.m = seg.a
WHERE seg.a = seg.b
"""


@register(
    "a_shared_sql_recursive_spine",
    SHARED_SQL_RECURSIVE_SPINE,
    tags=("analytics", "sql", "timeseries"),
    doc="WITH RECURSIVE through the shared-SQL front door (Spark 4's "
    "recursive CTE + DuckDB, one query text): a complete month spine "
    "left-joined to monthly order counts so gap months surface as zero "
    "rows — the calendar-fill primitive; the spine is generated by "
    "binary interval splitting, so recursion DEPTH is log2(span) "
    "(7 Spark iterations for ~80 months, vs 80 for the naive m+1 chain "
    "— each recursive step is a full job in Spark, so depth is the cost)",
)
def q_shared_sql_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL_RECURSIVE_SPINE)
