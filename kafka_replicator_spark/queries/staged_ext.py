"""Staged-round extension queries: split-leakage coverage, Poisson
bootstrap, inactivity gaps, market-basket affinity, supplier overlap.

Reference parity: no analog in the reference engine — pipeline/analytics
surface on the shared corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, sampling
from kafka_replicator_spark.functions.hashing import portable_hash60, portable_hash60_sql
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: n-gram order of the split-leakage audit (matches cross-source overlap)
_COV_N = 8


@register(
    "p_ngram_coverage",
    f"""
WITH grams AS ({dedup.word_ngrams_sql(n=_COV_N)}),
assigned AS (
  SELECT h,
         CASE WHEN ({portable_hash60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100) < 98
              THEN 'train'
              WHEN ({portable_hash60_sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100) < 99
              THEN 'val' ELSE 'test' END AS split
  FROM grams
),
test_h AS (SELECT DISTINCT h FROM assigned WHERE split = 'test'),
train_h AS (SELECT DISTINCT h FROM assigned WHERE split = 'train'),
cov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_covered
  FROM test_h WHERE EXISTS (SELECT 1 FROM train_h WHERE train_h.h = test_h.h)
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_test_grams FROM test_h)
SELECT tot.n_test_grams, cov.n_covered,
       CASE WHEN tot.n_test_grams = 0 THEN 0
            ELSE (1000000 * cov.n_covered) // tot.n_test_grams END AS leakage_ppm
FROM tot, cov
""",
    tags=("pipeline", "dedup", "eval"),
    doc="train→test split-leakage audit: share of distinct test-split "
    "8-gram hashes also present in the train split (the within-corpus "
    "complement of p_contamination); split assignment is the deterministic "
    "hash of p_dataset_split, the semi join moves distinct 60-bit hashes "
    "only — 1 output row",
)
def q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = dedup.word_ngrams(docs, n=_COV_N)
    bucket = portable_hash60(
        F.concat_ws("|", F.lit("split"), F.col("doc_id").cast("string"))
    ) % 100
    assigned = grams.select(
        "h",
        F.when(bucket < 98, "train").when(bucket < 99, "val").otherwise("test").alias("split"),
    )
    test_h = assigned.where(F.col("split") == "test").select("h").distinct()
    train_h = assigned.where(F.col("split") == "train").select("h").distinct()
    cov = test_h.join(train_h, "h", "left_semi").agg(
        F.count(F.lit(1)).alias("n_covered")
    )
    tot = test_h.agg(F.count(F.lit(1)).alias("n_test_grams"))
    return tot.join(F.broadcast(cov)).select(
        "n_test_grams",
        "n_covered",
        F.expr(
            "CASE WHEN n_test_grams = 0 THEN 0"
            " ELSE (1000000 * n_covered) div n_test_grams END"
        ).alias("leakage_ppm"),
    )


@register(
    "p_poisson_bootstrap",
    sampling.poisson_bootstrap_sql(),
    tags=("pipeline", "sampling"),
    doc="deterministic Poisson(1) bootstrap replicates (hash-inverted CDF, "
    "Python-literal thresholds on both engines): per-replicate resampled "
    "doc/token totals for error bars on corpus statistics; map-only + one "
    "replicate-grain aggregation, no RNG state, no global n",
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.poisson_bootstrap(load_table(spark, sf_dir, "documents"))


@register(
    "a_inactivity_gaps",
    """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
),
gaps AS (
  SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS gap_us
  FROM e
)
SELECT CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(sum(gap_us) // count(gap_us) AS BIGINT) AS avg_gap_us,
       round(quantile_cont(gap_us, 0.25), 6) AS p25_us,
       round(quantile_cont(gap_us, 0.5), 6) AS p50_us,
       round(quantile_cont(gap_us, 0.75), 6) AS p75_us
FROM gaps
""",
    tags=("analytics", "events"),
    doc="inter-event inactivity gap distribution: per-user ordered lag "
    "(user-sized window partitions), exact integer mean and sort-based "
    "quartiles at power-of-two fractions — 1 output row",
)
def q_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.select((F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"))
    return gaps.agg(
        F.count("gap_us").alias("n_gaps"),
        F.expr("sum(gap_us) div count(gap_us)").alias("avg_gap_us"),
        F.round(F.expr("percentile(gap_us, 0.25D)"), 6).alias("p25_us"),
        F.round(F.expr("percentile(gap_us, 0.5D)"), 6).alias("p50_us"),
        F.round(F.expr("percentile(gap_us, 0.75D)"), 6).alias("p75_us"),
    )


@register(
    "a_brand_affinity",
    """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
nb AS (SELECT brand, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, CAST(count(*) AS BIGINT) AS n_both
  FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.brand_a, p.brand_b, p.n_both, na.n AS n_a, nb2.n AS n_b,
       (1000000 * p.n_both * tot.n_orders) // (na.n * nb2.n) AS lift_ppm
FROM pairs p
JOIN nb na ON na.brand = p.brand_a
JOIN nb nb2 ON nb2.brand = p.brand_b
CROSS JOIN tot
""",
    tags=("analytics", "basket"),
    doc="market-basket brand affinity: order-level brand co-occurrence "
    "lift in exact integer ppm; the fact stream collapses to DISTINCT "
    "(order, brand) before the self-join (fan-out bounded by brands per "
    "order), the part dimension broadcasts — brand-pair output",
)
def q_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from kafka_replicator_spark.cacheutil import track_cached

    ob = track_cached(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    tot = ob.select("o").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    nb = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n"))
    a = ob.select("o", F.col("brand").alias("brand_a"))
    b = ob.select("o", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "o")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = nb.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    nb2 = nb.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb2), "brand_b")
        .join(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr("(1000000 * n_both * n_orders) div (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
    )


@register(
    "a_supplier_part_overlap",
    """
WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS n_parts FROM sp GROUP BY s),
pairs AS (
  SELECT a.s AS supp_a, b.s AS supp_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s
)
SELECT p.supp_a, p.supp_b, p.n_shared,
       (1000000 * p.n_shared) // (da.n_parts + db.n_parts - p.n_shared)
         AS jaccard_ppm
FROM pairs p
JOIN deg da ON da.s = p.supp_a
JOIN deg db ON db.s = p.supp_b
WHERE p.n_shared >= 2
""",
    tags=("analytics", "basket"),
    doc="supplier catalog overlap: supplier pairs sharing >= 2 distinct "
    "parts with exact-ppm Jaccard of their part sets; the self-join blocks "
    "on the part key (fan-out = suppliers per part), the fact stream "
    "collapses to DISTINCT (supplier, part) first",
)
def q_supplier_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    from kafka_replicator_spark.cacheutil import track_cached

    sp = track_cached(sp)
    deg = sp.groupBy("s").agg(F.count(F.lit(1)).alias("n_parts"))
    a = sp.select(F.col("p"), F.col("s").alias("supp_a"))
    b = sp.select(F.col("p"), F.col("s").alias("supp_b"))
    pairs = (
        a.join(b, "p")
        .where(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )
    da = deg.select(F.col("s").alias("supp_a"), F.col("n_parts").alias("na"))
    db = deg.select(F.col("s").alias("supp_b"), F.col("n_parts").alias("nb"))
    return (
        pairs.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "n_shared",
            F.expr("(1000000 * n_shared) div (na + nb - n_shared)").alias(
                "jaccard_ppm"
            ),
        )
    )
