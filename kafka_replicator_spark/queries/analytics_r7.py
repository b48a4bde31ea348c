"""Round-7 analytics additions: trend/inequality/association statistics in
exact integer arithmetic, each paired with its DuckDB oracle.

Shared determinism rules (CLAUDE.md): money folds in DECIMAL(18,2) →
round(2) → integer cents; cross-row moments lifted to DECIMAL(38,0) /
HUGEINT; ratios emitted as ppm/nano integer floor-divisions; the ONLY raw
float ops are single correctly-rounded IEEE sqrt/divide chains (the
a_cramers_v / a_partial_corr precedent).  Day-grain windows are
calendar-bounded (documented exemption for unpartitioned windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

_DAY_US = 86_400_000_000

#: trailing window for the double-EWMA (weights (t-i+1)*2^(i-1) must stay
#: well inside the DECIMAL(38,0)/HUGEINT lift at every scale factor)
_DEMA_DAYS = 25


# ------------------------------------------------- Mann-Kendall trend test

@register(
    "a_mann_kendall_daily",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY day
),
s AS (
  SELECT CAST(sum(CASE WHEN d2.cents > d1.cents THEN 1
                       WHEN d2.cents < d1.cents THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM d d1 JOIN d d2 ON d2.day > d1.day
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
t AS (
  SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0) AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY cents
        HAVING count(*) > 1)
)
SELECT n_days, s_stat,
       n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18,
       CAST((2000000::HUGEINT * s_stat)
            // nullif(n_days::HUGEINT * (n_days - 1), 0) AS BIGINT) AS tau_a_ppm
FROM s, n, t
""",
    tags=("analytics", "stats", "timeseries"),
    doc="Mann-Kendall trend test on daily revenue: S = Σ_{i<j} sign(c_j - "
    "c_i) over the calendar-bounded day grain (~2.4k days → ~3M pairs, a "
    "broadcast nested-loop over the tiny day frame), tie-adjusted variance "
    "numerator var18 = n(n-1)(2n+5) - Σ t(t-1)(2t+5) kept as an exact "
    "integer (the /18 and sqrt for the z-score are the caller's), and "
    "Kendall-style tau_a = 2S/(n(n-1)) in exact ppm (truncating integer "
    "division agrees cross-engine for negative values — verified "
    "non-trap).  Complements a_theil_sen_trend (slope) with direction "
    "significance.  1-row output",
)
def q_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("cents"))
    )
    d = track_cached(d)  # tiny day frame feeds three scans (pairs ×2, ties)
    d1 = d.select(F.col("day").alias("day1"), F.col("cents").alias("c1"))
    d2 = d.select(F.col("day").alias("day2"), F.col("cents").alias("c2"))
    s = (
        F.broadcast(d1)
        .join(d2, F.col("day2") > F.col("day1"))
        .agg(
            F.sum(
                F.when(F.col("c2") > F.col("c1"), 1)
                .when(F.col("c2") < F.col("c1"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        d.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("long"), F.lit(0)
            ).alias("tie_term")
        )
    )
    return (
        s.join(F.broadcast(n))
        .join(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            F.expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term").alias(
                "var18"
            ),
            F.expr(
                "CAST((CAST(2000000 AS DECIMAL(38,0)) * s_stat)"
                " div nullif(CAST(n_days AS DECIMAL(38,0)) * (n_days - 1), 0)"
                " AS BIGINT)"
            ).alias("tau_a_ppm"),
        )
    )


# ------------------------------------------------------ exact brand Gini

@register(
    "a_gini_brand_revenue",
    """
WITH b AS (
  SELECT p_brand AS brand,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) * 100
              AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
),
r AS (
  SELECT cents, row_number() OVER (ORDER BY cents, brand) AS rk FROM b
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_brands,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         sum(rk::HUGEINT * cents) AS src
  FROM r
)
SELECT n_brands, total_cents,
       CAST((2000000::HUGEINT * src - 1000000::HUGEINT * (n_brands + 1) * total_cents)
            // nullif(n_brands::HUGEINT * total_cents, 0) AS BIGINT) AS gini_ppm
FROM m
""",
    tags=("analytics", "stats"),
    doc="exact Gini coefficient of discounted revenue across part brands "
    "via the rank formula G = 2Σ r·x / (nΣx) - (n+1)/n in ppm: revenue "
    "folded in DECIMAL(18,2) → round(2) → cents, ranks over the 25-brand "
    "catalog (bounded-grain window, (cents, brand) tie-break), moments in "
    "HUGEINT/DECIMAL(38,0).  The lineitem⋈part join carries NO broadcast "
    "hint — part is a mid-size dimension, AQE picks the side (the "
    "wrong-side-broadcast lesson).  Complements a_lorenz_octiles (curve) "
    "with the scalar index.  1-row output",
)
def q_gini_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(12,2)))"
        ).alias("val"),
    )
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    b = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy("brand")
        .agg(F.expr("CAST(round(sum(val), 2) * 100 AS BIGINT)").alias("cents"))
    )
    r = b.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.col("cents").asc(), F.col("brand").asc()))
        .alias("rk"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.expr("sum(CAST(rk AS DECIMAL(38,0)) * cents)").alias("src"),
    ).select(
        "n_brands",
        "total_cents",
        F.expr(
            "CAST((CAST(2000000 AS DECIMAL(38,0)) * src"
            " - CAST(1000000 AS DECIMAL(38,0)) * (n_brands + 1) * total_cents)"
            " div nullif(CAST(n_brands AS DECIMAL(38,0)) * total_cents, 0)"
            " AS BIGINT)"
        ).alias("gini_ppm"),
    )


# ------------------------------------ lag-2 partial autocorrelation (PACF)

@register(
    "a_pacf_lag2_daily",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY day
),
p1 AS (
  SELECT a.cents AS x, b.cents AS y FROM d a JOIN d b ON b.day = a.day + 1
),
p2 AS (
  SELECT a.cents AS x, b.cents AS y FROM d a JOIN d b ON b.day = a.day + 2
),
r1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n1,
         CAST(floor(1e9 * CAST(count(*)::HUGEINT * sum(x::HUGEINT * y)
                               - sum(x)::HUGEINT * sum(y) AS DOUBLE)
              / nullif(sqrt(CAST(count(*)::HUGEINT * sum(x::HUGEINT * x)
                          - sum(x)::HUGEINT * sum(x) AS DOUBLE)
                     * CAST(count(*)::HUGEINT * sum(y::HUGEINT * y)
                            - sum(y)::HUGEINT * sum(y) AS DOUBLE)), 0)) AS BIGINT)
           AS r1_nano
  FROM p1
),
r2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
         CAST(floor(1e9 * CAST(count(*)::HUGEINT * sum(x::HUGEINT * y)
                               - sum(x)::HUGEINT * sum(y) AS DOUBLE)
              / nullif(sqrt(CAST(count(*)::HUGEINT * sum(x::HUGEINT * x)
                          - sum(x)::HUGEINT * sum(x) AS DOUBLE)
                     * CAST(count(*)::HUGEINT * sum(y::HUGEINT * y)
                            - sum(y)::HUGEINT * sum(y) AS DOUBLE)), 0)) AS BIGINT)
           AS r2_nano
  FROM p2
)
SELECT n1 AS n_lag1_pairs, n2 AS n_lag2_pairs, r1_nano, r2_nano,
       CAST((1000000::HUGEINT * (r2_nano * 1000000000::HUGEINT
                                 - r1_nano::HUGEINT * r1_nano))
            // nullif(1000000000000000000::HUGEINT
                      - r1_nano::HUGEINT * r1_nano, 0) AS BIGINT)
         AS pacf2_ppm
FROM r1, r2
""",
    tags=("analytics", "stats", "timeseries"),
    doc="lag-2 partial autocorrelation of daily revenue via the "
    "Durbin-Levinson closed form φ22 = (r2 - r1²)/(1 - r1²): lag pairs "
    "come from day+1 / day+2 equi-joins on the tiny day frame (gap-safe — "
    "missing days simply contribute no pair), each Pearson r is one "
    "HUGEINT moment fold + one correctly-rounded sqrt/divide quantized to "
    "nano (a_partial_corr precedent), and the φ22 composition runs on the "
    "exact nano integers with a pure integer floor-division.  1-row output",
)
def q_pacf_lag2_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("cents"))
    )
    d = track_cached(d)

    def lag_pairs(k: int) -> DataFrame:
        a = d.select(F.col("day").alias("da"), F.col("cents").alias("x"))
        b = d.select(F.col("day").alias("db"), F.col("cents").alias("y"))
        return F.broadcast(a).join(b, F.col("db") == F.col("da") + k)

    r_expr = (
        "CAST(floor(1e9 * CAST(CAST(count(*) AS DECIMAL(38,0))"
        " * sum(CAST(x AS DECIMAL(38,0)) * y)"
        " - CAST(sum(x) AS DECIMAL(38,0)) * sum(y) AS DOUBLE)"
        " / nullif(sqrt(CAST(CAST(count(*) AS DECIMAL(38,0))"
        " * sum(CAST(x AS DECIMAL(38,0)) * x)"
        " - CAST(sum(x) AS DECIMAL(38,0)) * sum(x) AS DOUBLE)"
        " * CAST(CAST(count(*) AS DECIMAL(38,0))"
        " * sum(CAST(y AS DECIMAL(38,0)) * y)"
        " - CAST(sum(y) AS DECIMAL(38,0)) * sum(y) AS DOUBLE)), 0)) AS BIGINT)"
    )
    r1 = lag_pairs(1).agg(
        F.count(F.lit(1)).cast("long").alias("n_lag1_pairs"),
        F.expr(r_expr).alias("r1_nano"),
    )
    r2 = lag_pairs(2).agg(
        F.count(F.lit(1)).cast("long").alias("n_lag2_pairs"),
        F.expr(r_expr).alias("r2_nano"),
    )
    return r1.join(F.broadcast(r2)).select(
        "n_lag1_pairs",
        "n_lag2_pairs",
        "r1_nano",
        "r2_nano",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (r2_nano * CAST(1000000000 AS DECIMAL(38,0))"
            "    - CAST(r1_nano AS DECIMAL(38,0)) * r1_nano))"
            " div nullif(CAST(1000000000000000000 AS DECIMAL(38,0))"
            " - CAST(r1_nano AS DECIMAL(38,0)) * r1_nano, 0) AS BIGINT)"
        ).alias("pacf2_ppm"),
    )


# ------------------------------------------- exact double EWMA (alpha=1/2)

@register(
    "a_dema_revenue",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY day
),
recent AS (
  SELECT * FROM d WHERE day > (SELECT max(day) FROM d) - {_DEMA_DAYS}
),
idx AS (
  SELECT cents, row_number() OVER (ORDER BY day) - 1 AS i,
         (SELECT count(*) FROM recent) - 1 AS t
  FROM recent
),
m AS (
  SELECT CAST(max(t) + 1 AS BIGINT) AS n_days, CAST(max(t) AS INTEGER) AS t,
         sum(cents::HUGEINT * CASE WHEN i = 0 THEN t + 2
             ELSE (t - i + 1) * (1::BIGINT << CAST(i - 1 AS INTEGER)) END) AS q
  FROM idx
)
SELECT n_days,
       CAST((1000000::HUGEINT * q) // (1::HUGEINT << (t + 1)) AS BIGINT)
         AS dema_ucents
FROM m
""",
    tags=("analytics", "timeseries"),
    doc="double-smoothed EWMA (EWMA of the EWMA, alpha = 1/2) of daily "
    f"revenue over the trailing {_DEMA_DAYS} present days, EXACT: with "
    "power-of-two decay the coupled recursion s_t=(v_t+s_(t-1))/2, "
    "d_t=(s_t+d_(t-1))/2 collapses to the closed form d_t = "
    "[(t+2)·v_0 + Σ_(i=1..t) (t-i+1)·2^(i-1)·v_i] / 2^(t+1) — one "
    "integer-weighted fold in HUGEINT/DECIMAL(38,0) and one power-of-two "
    "floor-division, no float decay to drift (a_ewma_revenue's recipe "
    "extended one smoothing level; verified algebraically for t=1,2).  "
    "Day index is presence-ordered (row_number over the ≤25-row window — "
    "bounded grain).  Output in exact micro-cents; 1 row",
)
def q_dema_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("cents"))
    )
    d = track_cached(d)
    bounds = d.agg(F.max("day").alias("dmax"))
    recent = d.join(F.broadcast(bounds), F.col("day") > F.col("dmax") - _DEMA_DAYS)
    idx = recent.select(
        "cents",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("i"),
    )
    n = idx.agg((F.count(F.lit(1)) - 1).cast("int").alias("t"))
    m = idx.join(F.broadcast(n)).agg(
        (F.max("t") + 1).cast("long").alias("n_days"),
        F.max("t").cast("int").alias("tt"),
        F.expr(
            "sum(CAST(cents AS DECIMAL(38,0)) * CASE WHEN i = 0 THEN t + 2"
            " ELSE (t - i + 1) * shiftleft(CAST(1 AS BIGINT), i - 1) END)"
        ).alias("q"),
    )
    return m.select(
        "n_days",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * q)"
            " div CAST(shiftleft(CAST(1 AS BIGINT), tt + 1) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("dema_ucents"),
    )


# ---------------------------------------------- weekend×returns odds ratio

@register(
    "a_odds_ratio_weekend",
    """
WITH c AS (
  SELECT CAST(sum(CASE WHEN (dayofweek(l_shipdate) + 1) IN (1, 7)
                        AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN (dayofweek(l_shipdate) + 1) IN (1, 7)
                        AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(sum(CASE WHEN (dayofweek(l_shipdate) + 1) NOT IN (1, 7)
                        AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(sum(CASE WHEN (dayofweek(l_shipdate) + 1) NOT IN (1, 7)
                        AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM lineitem
)
SELECT a, b, c, d,
       CAST((1000000::HUGEINT * a * d) // nullif(b::HUGEINT * c, 0) AS BIGINT)
         AS odds_ratio_ppm
FROM c
""",
    tags=("analytics", "stats"),
    doc="odds ratio of the 2×2 weekend-shipment × returned contingency in "
    "exact ppm: one scan, four conditional counts, OR = ad/bc as a "
    "HUGEINT/DECIMAL(38,0) integer floor-division (counts are large at "
    "every SF so no Haldane correction; nullif guards the degenerate "
    "cell).  DuckDB dayofweek is 0-based vs Spark's 1-based — the oracle "
    "adds 1 (the documented cross-engine gotcha).  Effect-size companion "
    "to a_weekend_effect_ttest / a_cramers_v.  1-row output",
)
def q_odds_ratio_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("dayofweek(l_shipdate) IN (1, 7)").alias("wknd"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    c = li.agg(
        F.sum(F.when(F.col("wknd") & F.col("ret"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("wknd") & ~F.col("ret"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(~F.col("wknd") & F.col("ret"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(~F.col("wknd") & ~F.col("ret"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * a * d)"
            " div nullif(CAST(b AS DECIMAL(38,0)) * c, 0) AS BIGINT)"
        ).alias("odds_ratio_ppm"),
    )


# ---------------------------------------- peak concurrent open orders

@register(
    "a_peak_open_orders",
    f"""
WITH spans AS (
  SELECT o.o_orderkey,
         epoch_us(o.o_orderdate) // {_DAY_US} AS d0,
         max(epoch_us(l.l_shipdate) // {_DAY_US}) AS d1,
         n.n_name AS nation
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY o.o_orderkey, o.o_orderdate, n.n_name
),
deltas AS (
  SELECT nation, d0 AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT nation, d1 + 1 AS day, -1 AS delta FROM spans
),
daily AS (
  SELECT nation, day, CAST(sum(delta) AS BIGINT) AS net
  FROM deltas GROUP BY nation, day
),
rs AS (
  SELECT nation, day,
         sum(net) OVER (PARTITION BY nation ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS conc
  FROM daily
),
peaks AS (SELECT nation, max(conc) AS peak FROM rs GROUP BY nation)
SELECT rs.nation, CAST(peaks.peak AS BIGINT) AS peak_open,
       CAST(min(rs.day) AS BIGINT) AS first_peak_day
FROM rs JOIN peaks ON rs.nation = peaks.nation AND rs.conc = peaks.peak
GROUP BY rs.nation, peaks.peak
""",
    tags=("analytics", "intervals"),
    doc="peak number of concurrently open orders per nation (open = "
    "order date .. last line receipt, day grain): the classic sweep-line "
    "— +1/-1 delta events, per-nation running sum over the "
    "calendar-bounded day grain (partitioned window, ~2.5k rows/nation), "
    "then first day attaining the per-nation max (join-with-peak, "
    "deterministic — DuckDB max_by rejects struct keys).  The "
    "orders⋈lineitem⋈customer joins are key-grain shuffles with a "
    "broadcast nation dim — the plan a 100TB TPC-H run wants.  "
    "Interval-analytics companion to a_interval_merge (union) adding "
    "max-overlap.  25-row output",
)
def q_peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
            "d0"
        ),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(f"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div {_DAY_US}").alias(
            "rd"
        ),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "d0", "o_custkey")
        .agg(F.max("rd").alias("d1"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("nation", "d0", "d1")
    )
    deltas = spans.select(
        "nation", F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select("nation", (F.col("d1") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("nation", "day").agg(
        F.sum("delta").cast("long").alias("net")
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rs = track_cached(daily.select("nation", "day", F.sum("net").over(w).alias("conc")))
    peaks = rs.groupBy("nation").agg(F.max("conc").alias("peak")).select(
        F.col("nation").alias("p_nation"), "peak"
    )
    return (
        rs.join(
            F.broadcast(peaks),
            (F.col("nation") == F.col("p_nation")) & (F.col("conc") == F.col("peak")),
        )
        .groupBy("nation", "peak")
        .agg(F.min("day").cast("long").alias("first_peak_day"))
        .select(
            "nation", F.col("peak").cast("long").alias("peak_open"), "first_peak_day"
        )
    )


# ------------------------------------------ Kruskal-Wallis across weekdays

@register(
    "a_kruskal_wallis_dow",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY day
),
r AS (
  SELECT day % 7 AS dow, row_number() OVER (ORDER BY cents, day) AS rk FROM d
),
g AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_j, CAST(sum(rk) AS BIGINT) AS r_j
  FROM r GROUP BY dow
),
m AS (
  SELECT CAST(sum(n_j) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_groups,
         sum((1000000::HUGEINT * r_j * r_j) // n_j) AS s_micro
  FROM g
)
SELECT n AS n_days, n_groups,
       CAST((12::HUGEINT * s_micro) // (n::HUGEINT * (n + 1))
            - 3000000::HUGEINT * (n + 1) AS BIGINT) AS h_ppm
FROM m
""",
    tags=("analytics", "stats"),
    doc="Kruskal-Wallis H across day-of-week groups of daily revenue, in "
    "exact ppm: ranks are deterministic row_number over (cents, day) "
    "(ties broken by day — the corpus has distinct daily cents, so this "
    "equals the average-rank form), each group's R²/n term is an exact "
    "integer floor-division to micro BEFORE the cross-group fold (the "
    "quantize-before-fold rule — 7 doubles would sum in engine order), "
    "then H = 12·ΣR²/n / (N(N+1)) − 3(N+1) as pure HUGEINT/DECIMAL(38,0) "
    "arithmetic.  The k-group extension of a_mann_whitney_weekend; the "
    "dow grain comes from epoch-day mod 7 so both engines share it "
    "without calendar functions.  1-row output",
)
def q_kruskal_wallis_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("cents"))
    )
    r = d.select(
        (F.col("day") % 7).alias("dow"),
        F.row_number().over(Window.orderBy("cents", "day")).alias("rk"),
    )
    g = r.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_j"),
        F.sum("rk").cast("long").alias("r_j"),
    )
    m = g.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.expr(
            "sum((CAST(1000000 AS DECIMAL(38,0)) * r_j * r_j) div n_j)"
        ).alias("s_micro"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        "n_groups",
        F.expr(
            "CAST((CAST(12 AS DECIMAL(38,0)) * s_micro)"
            " div (CAST(n AS DECIMAL(38,0)) * (n + 1))"
            " - CAST(3000000 AS DECIMAL(38,0)) * (n + 1) AS BIGINT)"
        ).alias("h_ppm"),
    )


# ------------------------------------------------ winsorized mean price

@register(
    "a_winsorized_mean_price",
    """
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
q AS (
  SELECT quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.75) AS q3
  FROM v
),
w AS (
  SELECT CASE WHEN cents < q1 THEN q1
              WHEN cents > q3 THEN q3
              ELSE CAST(cents AS DOUBLE) END AS wv
  FROM v, q
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(wv * 4) AS HUGEINT) AS s4
  FROM w
)
SELECT n AS n_orders,
       (SELECT CAST(q1 * 4 AS BIGINT) FROM q) AS q1_qcents,
       (SELECT CAST(q3 * 4 AS BIGINT) FROM q) AS q3_qcents,
       CAST((1000000::HUGEINT * s4) // (4 * n) AS BIGINT)
         AS winsorized_mean_ucents
FROM m
""",
    tags=("analytics", "stats"),
    doc="90-degree robust-mean companion to a_trimmed_mean_price: winsorize "
    "order totals at the quartiles (clamp, don't drop), exact: quartiles "
    "at power-of-two fractions are bit-identical cross-engine (the "
    "documented percentile/quantile_cont equivalence) and interpolate to "
    "quarter-cents, so every clamped value ×4 is an exact integer — the "
    "sum folds without float rounding (quarter-integers are exact "
    "binary), and the mean is one integer floor-division to micro-cents.  "
    "1-row output",
)
def q_winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    )
    v = track_cached(v)  # feeds the quartile scan AND the clamp scan
    q = v.agg(
        F.expr("percentile(cents, 0.25D)").alias("q1"),
        F.expr("percentile(cents, 0.75D)").alias("q3"),
    )
    w = v.join(F.broadcast(q)).select(
        F.expr(
            "CASE WHEN cents < q1 THEN q1"
            " WHEN cents > q3 THEN q3"
            " ELSE CAST(cents AS DOUBLE) END"
        ).alias("wv"),
        "q1",
        "q3",
    )
    m = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(wv * 4) AS DECIMAL(38,0))").alias("s4"),
        F.expr("CAST(max(q1) * 4 AS BIGINT)").alias("q1_qcents"),
        F.expr("CAST(max(q3) * 4 AS BIGINT)").alias("q3_qcents"),
    )
    return m.select(
        F.col("n").alias("n_orders"),
        "q1_qcents",
        "q3_qcents",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * s4) div (4 * n) AS BIGINT)"
        ).alias("winsorized_mean_ucents"),
    )


# ------------------------------------------------ brand basket lift

#: pairs reported (the brand-pair universe is ≤ 25·24/2 = 300)
_BASKET_TOP = 15


@register(
    "a_brand_basket_lift",
    f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
cb AS (SELECT brand, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT brand_a, brand_b, c_ab,
       CAST((1000000::HUGEINT * c_ab * n_orders)
            // (ca.c::HUGEINT * cb2.c) AS BIGINT) AS lift_ppm
FROM pairs
JOIN cb ca ON ca.brand = pairs.brand_a
JOIN cb cb2 ON cb2.brand = pairs.brand_b
CROSS JOIN n
ORDER BY lift_ppm DESC, brand_a, brand_b LIMIT {_BASKET_TOP}
""",
    tags=("analytics", "association"),
    doc="market-basket lift between part brands co-purchased in one order: "
    "lift = P(a,b) / (P(a)P(b)) = N·c_ab / (c_a·c_b) in exact ppm over "
    "the distinct (order, brand) incidence — the token-PMI recipe "
    "(p_cooccur_pmi) moved to the retail grain.  The pair self-join is "
    "keyed by order (bounded by brands-per-order², ≤25² per order, never "
    "all-pairs over orders); the pair universe is ≤300 rows so the "
    "final ranking is a TakeOrdered over a catalog-bounded frame.  "
    f"{_BASKET_TOP}-row output",
)
def q_brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    ob = track_cached(
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), "brand")
        .distinct()
    )
    n_orders = ob.select("o").distinct().count()
    cb = ob.groupBy("brand").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = ob.select(F.col("o").alias("oa"), F.col("brand").alias("brand_a"))
    b = ob.select(F.col("o").alias("ob_"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, (F.col("oa") == F.col("ob_")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    ca = cb.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb2 = cb.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb2), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * c_ab * {n_orders})"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(_BASKET_TOP)
    )


# ---------------------------------------- new vs repeat revenue share

@register(
    "a_repeat_revenue_share",
    """
WITH f AS (
  SELECT o_custkey, min(epoch_us(o_orderdate)) AS first_us FROM orders
  GROUP BY o_custkey
),
o AS (
  SELECT year(o_orderdate) AS yr,
         CASE WHEN epoch_us(o_orderdate) = f.first_us THEN 0 ELSE 1 END
           AS is_repeat,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN f ON orders.o_custkey = f.o_custkey
)
SELECT CAST(yr AS INTEGER) AS yr,
       CAST(sum(CASE WHEN is_repeat = 0 THEN cents ELSE 0 END) AS BIGINT)
         AS new_cents,
       CAST(sum(CASE WHEN is_repeat = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS repeat_cents,
       CAST((1000000::HUGEINT
             * sum(CASE WHEN is_repeat = 1 THEN cents ELSE 0 END))
            // sum(cents) AS BIGINT) AS repeat_share_ppm
FROM o GROUP BY yr ORDER BY yr
""",
    tags=("analytics", "behavior"),
    doc="new-customer vs repeat revenue per order year in exact "
    "cents/ppm: an order is 'new' iff its date equals the customer's "
    "first order date (same-day ties all count as new — deterministic on "
    "both engines without an order-key argmin).  The revenue-weighted "
    "complement of a_repeat_purchase (event counts) and "
    "a_growth_accounting (user counts); one customer-grain min + one "
    "year fold.  7-row output",
)
def q_repeat_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("od_us"),
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    o = track_cached(o)  # feeds the first-order min AND the year fold
    f = o.groupBy("o_custkey").agg(F.min("od_us").alias("first_us"))
    j = o.join(f, "o_custkey").select(
        "yr",
        F.when(F.col("od_us") == F.col("first_us"), 0).otherwise(1).alias(
            "is_repeat"
        ),
        "cents",
    )
    return (
        j.groupBy("yr")
        .agg(
            F.sum(F.when(F.col("is_repeat") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("new_cents"),
            F.sum(F.when(F.col("is_repeat") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("repeat_cents"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * sum(CASE WHEN is_repeat = 1 THEN cents ELSE 0 END))"
                " div sum(cents) AS BIGINT)"
            ).alias("repeat_share_ppm"),
        )
        .select(F.col("yr").cast("int"), "new_cents", "repeat_cents", "repeat_share_ppm")
        .orderBy("yr")
    )


# ------------------------------------- value dispersion by priority

@register(
    "a_value_cv_by_priority",
    """
WITH v AS (
  SELECT o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         sum(cents::HUGEINT * cents) AS q
  FROM v GROUP BY priority
)
SELECT priority, n,
       CAST((1000000::HUGEINT * s) // n AS BIGINT) AS mean_ucents,
       CAST(floor(1000000 * sqrt(CAST(n AS DOUBLE)
                                 * CAST(n * q - s::HUGEINT * s AS DOUBLE)
                                 / nullif(n - 1, 0)) / nullif(s, 0)) AS BIGINT) AS cv_ppm
FROM m ORDER BY priority
""",
    tags=("analytics", "stats"),
    doc="coefficient of variation of order value per priority class in "
    "ppm: exact HUGEINT/DECIMAL(38,0) moment folds, then ONE "
    "correctly-rounded sqrt/divide chain per group floored to ppm (the "
    "r_segment_size_cv recipe on the order-value grain — identical "
    "expression order on both engines, so the doubles are bit-identical); "
    "the dispersion companion to a_q4_priority_lateness and "
    "a_priority_mix_drift.  5-row output",
)
def q_value_cv_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    m = v.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.expr("sum(CAST(cents AS DECIMAL(38,0)) * cents)").alias("q"),
    )
    return m.select(
        "priority",
        "n",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * s) div n AS BIGINT)"
        ).alias("mean_ucents"),
        F.expr(
            "CAST(floor(1000000 * sqrt(CAST(n AS DOUBLE)"
            " * CAST(n * q - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)"
            " / nullif(n - 1, 0)) / nullif(s, 0)) AS BIGINT)"
        ).alias("cv_ppm"),
    ).orderBy("priority")


# ------------------------------------------------- month-end effect

@register(
    "a_month_end_effect",
    """
WITH o AS (
  SELECT day(o_orderdate) AS dom,
         day(last_day(o_orderdate)) AS dim,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CASE WHEN dom > dim - 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_last3,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(CASE WHEN dom > dim - 3 THEN cents ELSE 0 END) AS BIGINT)
           AS last3_cents,
         CAST(sum(3000000 // dim) AS BIGINT) AS exp_micro
  FROM o
)
SELECT n_orders,
       CAST((1000000::HUGEINT * n_last3) // n_orders AS BIGINT)
         AS last3_order_ppm,
       CAST((1000000::HUGEINT * last3_cents) // total_cents AS BIGINT)
         AS last3_revenue_ppm,
       CAST(exp_micro // n_orders AS BIGINT) AS expected_ppm
FROM m
""",
    tags=("analytics", "timeseries"),
    doc="month-end loading effect: share of orders and of revenue landing "
    "in the last 3 days of their month vs the uniform expectation "
    "(per-order 3/days-in-month floored to micro BEFORE the mean — the "
    "quantize-before-fold rule), all exact ppm.  Spark day/last_day == "
    "DuckDB day/last_day under the UTC session tz.  The "
    "calendar-boundary companion to a_dow_seasonality_strength "
    "(weekday) and a_time_seasonality (hour).  1-row output",
)
def q_month_end_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofmonth(F.last_day("o_orderdate")).alias("dim"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    m = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("dom") > F.col("dim") - 3, 1).otherwise(0))
        .cast("long")
        .alias("n_last3"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("dom") > F.col("dim") - 3, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("last3_cents"),
        F.sum(F.expr("3000000 div dim")).cast("long").alias("exp_micro"),
    )
    return m.select(
        "n_orders",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_last3) div n_orders AS BIGINT)"
        ).alias("last3_order_ppm"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * last3_cents)"
            " div total_cents AS BIGINT)"
        ).alias("last3_revenue_ppm"),
        F.expr("CAST(exp_micro div n_orders AS BIGINT)").alias("expected_ppm"),
    )
