"""TPC-H query shapes added in round 3 — completes the 22-query suite.

The fixture is a TPC-H subset (no ``partsupp``, no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``l_comment``), so each
query keeps the REFERENCE SHAPE (the join/subquery/aggregate structure that
exercises the optimizer) with documented column proxies:

* supply cost        → ``min(l_extendedprice / l_quantity)`` over lineitem
* commit-date lateness → ``l_shipdate > o_orderdate + N days``
* ship mode          → ``l_linestatus``
* comment filters    → key-modulus / status predicates

Registration order: the first four queries (Q17, Q21, Q13, Q22 — the
correlated-scalar, double-exists, outer-histogram and anti-join+scalar
shapes) sit inside the driver's prefix-of-50 correctness window this round;
the remainder carry repo-side oracle parity (tests/test_oracle_parity.py)
and rotate into the window next round.

Cross-engine determinism: money in DECIMAL(18,2) → round(2) → DOUBLE;
DuckDB ``sum(BIGINT)`` casts back from HUGEINT; scalar thresholds derived
from exact decimal sums (never double-accumulation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

DEC = "decimal(18,2)"


def _dec(c):
    return F.col(c).cast(DEC)


def _money(col, alias):
    return F.round(F.sum(col), 2).cast("double").alias(alias)


# ------------------------------------------------------------ TPC-H Q17
# Small-quantity-order revenue: correlated scalar subquery (per-part avg).

@register(
    "a_q17_small_qty_revenue",
    """
WITH pq AS (
  SELECT l_partkey AS agg_pk, 0.2 * avg(l_quantity) AS qty_thresh
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON agg_pk = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_thresh
""",
    tags=("analytics", "tpch", "correlated-subquery"),
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity) gating a fact scan — rewritten as an aggregate-then-rejoin, "
    "which is exactly how Catalyst decorrelates it; the per-part avg frame "
    "is small (|part|) and broadcast",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pq = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    sel = (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(pq), li["l_partkey"] == F.col("agg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    return sel.agg(
        (F.round(F.sum(_dec("l_extendedprice")), 2).cast("double") / 7.0).alias("avg_yearly")
    )


# ------------------------------------------------------------ TPC-H Q21
# Suppliers who kept orders waiting: EXISTS + NOT EXISTS over self-joins.

@register(
    "a_q21_waiting_suppliers",
    """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
""",
    tags=("analytics", "tpch", "semi-join", "anti-join"),
    doc="TPC-H Q21 shape: the only-late-supplier-in-a-multi-supplier-order "
    "pattern — one left-semi (another supplier touched the order) and one "
    "left-anti (no OTHER supplier was late) against the same derived 'late' "
    "frame, then count per supplier.  Lateness proxy: shipped >90 days "
    "after order date (fixture has no l_receiptdate/l_commitdate); the "
    "derived frame is cached because it feeds three plan branches",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(F.broadcast(orders.select("o_orderkey", "o_orderdate")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    track_cached(late)
    l1, l2 = late.alias("l1"), li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ------------------------------------------------------------ TPC-H Q13
# Customer order-count distribution: outer join → double aggregation.

@register(
    "a_q13_order_count_histogram",
    """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON o_custkey = c_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
    tags=("analytics", "tpch", "outer-join"),
    doc="TPC-H Q13 shape: left-outer join with an ON-clause predicate "
    "(customers keep their zero-order row), per-customer count, then a "
    "histogram of the counts — two cascaded aggregations where the second "
    "input is already tiny.  Status filter proxies the comment NOT LIKE "
    "predicate (fixture orders have no o_comment)",
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_orderstatus") != "P"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ------------------------------------------------------------ TPC-H Q22
# Global sales opportunity: anti join + exact-decimal scalar threshold.

@register(
    "a_q22_idle_balances",
    """
WITH pos AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS avg_bal
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7)
)
SELECT c_nationkey % 10 AS cntrycode,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE c_nationkey % 10 IN (1, 3, 5, 7)
  AND c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
  )
GROUP BY 1
""",
    tags=("analytics", "tpch", "anti-join", "scalar-subquery"),
    doc="TPC-H Q22 shape: scalar-subquery threshold (average positive "
    "balance) + NOT EXISTS anti join against the fact table, grouped by "
    "country code.  Country code proxies as c_nationkey % 10 (fixture has "
    "no c_phone), and 'no orders' is scoped to the trailing fixture year "
    "(every fixture customer has SOME order — an unscoped anti join is "
    "vacuously empty).  The threshold is computed as exact-decimal sum / "
    "count — never a double accumulation — so both engines derive the "
    "identical IEEE double and borderline customers classify identically",
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    )
    in_codes = F.col("cntrycode").isin(1, 3, 5, 7)
    pos = (
        cust.filter((F.col("c_acctbal") > 0.0) & in_codes)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01 00:00:00").cast("timestamp_ntz")
    ).select("o_custkey")
    sel = (
        cust.filter(in_codes)
        .join(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    )
    return sel.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"), _money(_dec("c_acctbal"), "totacctbal")
    )


# ------------------------------------------------------------ TPC-H Q2
# Minimum-cost supplier: correlated min over the supply relation.

@register(
    "a_q2_min_cost_supplier",
    """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem
  WHERE l_quantity > 0
  GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supply, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size <= 15 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost) FROM supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
  )
""",
    tags=("analytics", "tpch", "correlated-subquery"),
    doc="TPC-H Q2 shape: correlated min-cost subquery over the supply "
    "relation, resolved as a window-min within the region-filtered frame "
    "(cheaper than Catalyst's decorrelated rejoin: one shuffle on "
    "ps_partkey, no second scan).  The fixture has no partsupp, so the "
    "supply relation derives from lineitem with unit cost "
    "min(l_extendedprice/l_quantity) — per-row IEEE division, identical in "
    "both engines; min() is order-insensitive so the derived costs are "
    "bit-stable",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    regional = (
        supply.join(
            F.broadcast(
                supp.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
                .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
                .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
                .select("s_suppkey", "s_name", "s_acctbal", "n_name")
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    best = regional.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return best.join(
        F.broadcast(part.select("p_partkey", "p_name")),
        F.col("ps_partkey") == F.col("p_partkey"),
    ).select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")


# ------------------------------------------------------------ TPC-H Q9
# Product-type profit by nation and year.

@register(
    "a_q9_product_profit",
    """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2)) * 0.1), 2) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    tags=("analytics", "tpch", "join"),
    doc="TPC-H Q9 shape: five-way star join with a LIKE filter on the part "
    "dimension, profit grouped by supplier nation and order year.  Supply "
    "cost proxies as 10%% of p_retailprice x quantity (no partsupp in the "
    "fixture); all money math in DECIMAL with one final round→double",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit(0.1).cast("decimal(2,1)")
    df = (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li["l_orderkey"] == F.col("o_orderkey"))
    )
    return df.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(_money(profit, "sum_profit"))


# ------------------------------------------------------------ TPC-H Q11
# Important stock: group-total vs global-total scalar fraction.

@register(
    "a_q11_important_stock",
    """
WITH scoped AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2)) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
),
tot AS (SELECT sum(val) AS total_val FROM scoped)
SELECT l_partkey AS ps_partkey,
       CAST(round(sum(val), 2) AS DOUBLE) AS part_value
FROM scoped, tot
GROUP BY l_partkey, total_val
HAVING sum(val) > total_val * 0.003
""",
    tags=("analytics", "tpch", "scalar-subquery"),
    doc="TPC-H Q11 shape: per-part value vs a global-total scalar threshold "
    "(HAVING sum > total * fraction) within one nation's supply — the "
    "global total broadcasts back over the per-part aggregate; the decimal "
    "sums keep the HAVING comparison exact on both engines.  Stock value "
    "proxies as extendedprice x quantity from lineitem (no partsupp)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scoped = (
        li.join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            (_dec("l_extendedprice") * _dec("l_quantity")).alias("val"),
        )
    )
    track_cached(scoped)
    per_part = scoped.groupBy("l_partkey").agg(F.sum("val").alias("sum_val"))
    tot = scoped.agg(F.sum("val").alias("total_val"))
    kept = per_part.join(F.broadcast(tot)).filter(
        F.col("sum_val") > F.col("total_val") * F.lit(0.003).cast("decimal(4,3)")
    )
    return kept.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.round(F.col("sum_val"), 2).cast("double").alias("part_value"),
    )


# ------------------------------------------------------------ TPC-H Q12
# Shipping classes: conditional priority counts per class.

@register(
    "a_q12_ship_priority_classes",
    """
SELECT l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    tags=("analytics", "tpch", "aggregation"),
    doc="TPC-H Q12 shape: conditional counts (urgent vs not) per shipping "
    "class over a lateness predicate joining fact to orders.  Ship mode "
    "proxies as l_linestatus and the receipt-after-commit predicate as "
    "shipped >60 days after order (fixture has neither column); DuckDB "
    "sum(int)→HUGEINT is cast back to BIGINT for dtype parity",
)
def q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = li.join(orders, li["l_orderkey"] == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return df.groupBy(F.col("l_linestatus").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


# ------------------------------------------------------------ TPC-H Q15
# Top supplier: revenue equal to the scalar max revenue.

@register(
    "a_q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    tags=("analytics", "tpch", "scalar-subquery"),
    doc="TPC-H Q15 shape: quarterly revenue per supplier, then select the "
    "supplier(s) hitting the scalar max — the classic view + scalar "
    "subquery, as an aggregate joined against its own broadcast max.  "
    "Revenue is rounded to 2 dp BEFORE the max comparison on both engines, "
    "so the equality is on identical doubles",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money(_dec("l_extendedprice") * (1 - _dec("l_discount")), "total_revenue")
    )
    track_cached(revenue)
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ------------------------------------------------------------ TPC-H Q16
# Part/supplier variety: distinct-count with a NOT IN exclusion.

@register(
    "a_q16_part_supplier_variety",
    """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
GROUP BY 1, 2, 3
""",
    tags=("analytics", "tpch", "distinct-agg", "anti-join"),
    doc="TPC-H Q16 shape: count(distinct supplier) per (brand, type, size) "
    "bucket with brand/type exclusions and a NOT IN supplier blacklist — "
    "the blacklist (complaint-comment proxy: suppkey % 7 = 0) resolves as "
    "a broadcast left-anti join; the distinct-agg shuffles once on the "
    "group key with partial distinct on the map side",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 0)
        .select("s_suppkey")
    )
    df = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
                li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), li["l_suppkey"] == F.col("s_suppkey"), "left_anti")
    )
    return df.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


# ------------------------------------------------------------ TPC-H Q18
# Large-volume customers: group-having over the fact, rejoined to dims.

@register(
    "a_q18_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS o_totalprice,
       CAST(round(sum_qty, 2) AS DOUBLE) AS total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    tags=("analytics", "tpch", "aggregation"),
    doc="TPC-H Q18 shape: group-by-orderkey HAVING sum(quantity) > "
    "threshold, then rejoin orders and customer for the report columns — "
    "the heavy aggregate runs first so only qualifying orderkeys join the "
    "dimensions; quantity summed in DECIMAL so the HAVING threshold is "
    "exact on both engines (threshold 120 tuned non-vacuous for the "
    "fixture's ~4 lineitems/order)",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 120)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(_dec("o_totalprice"), 2).cast("double").alias("o_totalprice"),
            F.round(F.col("sum_qty"), 2).cast("double").alias("total_qty"),
        )
    )


# ------------------------------------------------------------ TPC-H Q20
# Excess-supply suppliers: nested semi-join chain.

@register(
    "a_q20_excess_supply",
    """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'blue%' AND qty > 15
)
""",
    tags=("analytics", "tpch", "semi-join"),
    doc="TPC-H Q20 shape: suppliers who shipped more than a threshold of "
    "any 'blue%' part in a year — an aggregate over the fact, a broadcast "
    "join to the filtered part dim, then an IN (left-semi) against "
    "supplier.  The availqty>half-of-shipped predicate proxies as a flat "
    "qty threshold (no partsupp in the fixture)",
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue"))
    qualifying = (
        shipped.join(F.broadcast(part.select("p_partkey")),
                     F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 15)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_nationkey")
