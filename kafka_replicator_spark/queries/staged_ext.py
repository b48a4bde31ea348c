"""Staged-round extension queries: split-leakage coverage, Poisson
bootstrap, inactivity gaps, market-basket affinity, supplier overlap.

Reference parity: no analog in the reference engine — pipeline/analytics
surface on the shared corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, packing, sampling, sketches
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
  SELECT h, {packing.split_assign_sql("doc_id")} AS split
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
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    grams = dedup.word_ngrams(docs, n=_COV_N)
    # the 8-gram explode feeds both split branches — cache it, or the
    # dominant cost of the query runs once per derived frame
    assigned = track_cached(
        grams.select("h", packing.split_assign_col("doc_id").alias("split"))
    )
    # test_h feeds the semi join AND the totals branch
    test_h = track_cached(
        assigned.where(F.col("split") == "test").select("h").distinct()
    )
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
       CAST((1000000::HUGEINT * p.n_both * tot.n_orders)
         // (na.n::HUGEINT * nb2.n) AS BIGINT) AS lift_ppm
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
            # DECIMAL(38,0) lift before the x1e6 ppm multiply (int64 wraps
            # silently once n_both*n_orders > ~9e12)
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * n_both * n_orders)"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b)"
            ).alias("lift_ppm"),
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


#: vocabulary size of the OOV-rate audit (sized to the synthetic corpus's
#: small closed vocabulary; a production run uses the tokenizer's V)
_OOV_V = 32


@register(
    "p_oov_rate",
    f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok LIMIT {_OOV_V}
  )
),
per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY source),
oov AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_oov
  FROM toks WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.tok = toks.tok)
  GROUP BY source
)
SELECT per.source, per.n_tokens,
       coalesce(oov.n_oov, 0) AS n_oov,
       (1000000 * coalesce(oov.n_oov, 0)) // per.n_tokens AS oov_ppm
FROM per LEFT JOIN oov USING (source)
""",
    tags=("pipeline", "quality"),
    doc="out-of-vocabulary rate per source against the distributed top-V "
    "vocabulary (tokenizer/vocab sizing dashboard): TakeOrdered top-k, "
    "V-row broadcast anti join, exact integer ppm — per-source output",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.hashing import spread

    docs = load_table(spark, sf_dir, "documents")
    toks = track_cached(
        spread(docs.select("source", F.explode(F.split("text", " ")).alias("tok")))
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(_OOV_V)
        .select("tok")
    )
    per = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_tokens"))
    oov = (
        toks.join(F.broadcast(vocab), "tok", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return per.join(oov, "source", "left").select(
        "source",
        "n_tokens",
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        F.expr("(1000000 * coalesce(n_oov, 0)) div n_tokens").alias("oov_ppm"),
    )


@register(
    "a_ab_assignment",
    f"""
WITH e AS (
  SELECT CAST({portable_hash60_sql("'exp1|' || CAST(user_id AS VARCHAR)")} % 2 AS INTEGER) AS arm,
         user_id, event_type, value
  FROM events
),
agg AS (
  SELECT
    CAST(count(DISTINCT CASE WHEN arm = 0 THEN user_id END) AS BIGINT) AS users_control,
    CAST(count(DISTINCT CASE WHEN arm = 1 THEN user_id END) AS BIGINT) AS users_treatment,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN arm = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
    CAST(sum(CASE WHEN arm = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(round(sum(CASE WHEN arm = 0 AND event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
         AS DOUBLE) AS revenue_control,
    CAST(round(sum(CASE WHEN arm = 1 AND event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
         AS DOUBLE) AS revenue_treatment
  FROM e
)
SELECT users_control, users_treatment, n0 AS events_control, n1 AS events_treatment,
       c0 AS purchases_control, c1 AS purchases_treatment,
       revenue_control, revenue_treatment,
       (1000000 * c0) // n0 AS conv_control_ppm,
       (1000000 * c1) // n1 AS conv_treatment_ppm,
       round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
             / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                           * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                           * (1.0 / n0 + 1.0 / n1)), 0), 6) AS z_score
FROM agg
""",
    tags=("analytics", "events", "eval"),
    doc="deterministic A/B experiment readout: users hash into two arms "
    "(pure function of identity — assignment survives reruns and engines), "
    "per-arm conversion in exact integer ppm and a two-proportion z-score "
    "as one fixed double expression over exact counts; one aggregation "
    "pass, 1 output row",
)
def q_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        (
            portable_hash60(
                F.concat_ws("|", F.lit("exp1"), F.col("user_id").cast("string"))
            )
            % 2
        ).cast("int").alias("arm"),
        "user_id",
        "event_type",
        "value",
    )
    is_p = F.col("event_type") == "purchase"
    dec0 = F.lit(0).cast("decimal(18,2)")
    agg = e.agg(
        F.count_distinct(F.when(F.col("arm") == 0, F.col("user_id"))).alias("users_control"),
        F.count_distinct(F.when(F.col("arm") == 1, F.col("user_id"))).alias("users_treatment"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when((F.col("arm") == 0) & is_p, 1).otherwise(0)).alias("c0"),
        F.sum(F.when((F.col("arm") == 1) & is_p, 1).otherwise(0)).alias("c1"),
        F.round(
            F.sum(F.when((F.col("arm") == 0) & is_p, F.col("value").cast("decimal(18,2)")).otherwise(dec0)),
            2,
        ).cast("double").alias("revenue_control"),
        F.round(
            F.sum(F.when((F.col("arm") == 1) & is_p, F.col("value").cast("decimal(18,2)")).otherwise(dec0)),
            2,
        ).cast("double").alias("revenue_treatment"),
    )
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (
        F.col("c0").cast("double") / F.col("n0")
        - F.col("c1").cast("double") / F.col("n1")
    ) / F.nullif(
        F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))), F.lit(0.0)
    )
    return agg.select(
        "users_control",
        "users_treatment",
        F.col("n0").alias("events_control"),
        F.col("n1").alias("events_treatment"),
        F.col("c0").alias("purchases_control"),
        F.col("c1").alias("purchases_treatment"),
        "revenue_control",
        "revenue_treatment",
        F.expr("(1000000 * c0) div n0").alias("conv_control_ppm"),
        F.expr("(1000000 * c1) div n1").alias("conv_treatment_ppm"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "p_simhash_eval",
    f"""
WITH truth AS (
  SELECT doc_a, doc_b FROM ({dedup.jaccard_pairs_sql(threshold=0.5)})
),
pred AS (
  SELECT doc_a, doc_b FROM ({dedup.simhash_near_pairs_sql()})
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_both
  FROM truth WHERE EXISTS (SELECT 1 FROM pred
                           WHERE pred.doc_a = truth.doc_a AND pred.doc_b = truth.doc_b)
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM pred)
SELECT nt.n_truth, np.n_pred, ov.n_both,
       CASE WHEN np.n_pred = 0 THEN 0
            ELSE (1000000 * ov.n_both) // np.n_pred END AS precision_ppm,
       CASE WHEN nt.n_truth = 0 THEN 0
            ELSE (1000000 * ov.n_both) // nt.n_truth END AS recall_ppm
FROM nt, np, ov
""",
    tags=("pipeline", "dedup", "eval"),
    doc="SimHash-vs-exact-Jaccard evaluation: precision/recall of the "
    "banded SimHash candidate set against Jaccard >= 0.5 ground truth — "
    "the detector-quality dashboard a fuzzy-dedup rollout publishes; both "
    "pair sets are bucketed plans, the overlap is a pair-key semi join",
)
def q_simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    sh = track_cached(dedup.word_ngrams(docs))
    truth = track_cached(
        dedup.jaccard_pairs(docs, threshold=0.5, shingles=sh).select("doc_a", "doc_b")
    )
    pred = track_cached(dedup.simhash_near_pairs(docs).select("doc_a", "doc_b"))
    n_both = truth.join(pred, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_both")
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    np_ = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    return (
        nt.join(F.broadcast(np_))
        .join(F.broadcast(n_both))
        .select(
            "n_truth",
            "n_pred",
            "n_both",
            F.expr(
                "CASE WHEN n_pred = 0 THEN 0 ELSE (1000000 * n_both) div n_pred END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN n_truth = 0 THEN 0 ELSE (1000000 * n_both) div n_truth END"
            ).alias("recall_ppm"),
        )
    )


#: outliers reported per label by p_centroid_outliers
_OUTLIER_K = 3


@register(
    "p_centroid_outliers",
    f"""
WITH dims AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(list_transform(embedding::DOUBLE[],
                               x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS q
  FROM embeddings
),
cent AS (
  SELECT label, dim,
         CAST(floor(sum(q) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS m
  FROM dims GROUP BY label, dim
),
dist AS (
  SELECT dims.vec_id, dims.label,
         CAST(sum((dims.q - cent.m) * (dims.q - cent.m)) AS BIGINT) AS d2
  FROM dims JOIN cent ON cent.label = dims.label AND cent.dim = dims.dim
  GROUP BY dims.vec_id, dims.label
),
ranked AS (
  SELECT label, vec_id, d2,
         row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id ASC) AS r
  FROM dist
)
SELECT CAST(label AS INTEGER) AS label, vec_id,
       CAST(r AS INTEGER) AS outlier_rank, d2 AS sq_dist_micro2
FROM ranked WHERE r <= {_OUTLIER_K}
""",
    tags=("pipeline", "similarity", "quality"),
    doc="noisy-label detection: the 3 vectors farthest from their own "
    "label centroid (exact integer micro-unit squared L2, the kmeans "
    "convention); centroid means are label x dim grain, the rank window "
    "is keyed per label — label-count-bounded output",
)
def q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.hashing import spread

    emb = load_table(spark, sf_dir, "embeddings")
    dims = track_cached(
        spread(emb).select(
            "vec_id",
            "label",
            F.posexplode(
                F.expr(
                    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))"
                )
            ).alias("dim", "q"),
        )
    )
    cent = dims.groupBy("label", "dim").agg(
        F.floor(F.sum("q") / F.count(F.lit(1)).cast("double") + F.lit(0.5))
        .cast("long")
        .alias("m")
    )
    dist = (
        dims.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("q") - F.col("m")) * (F.col("q") - F.col("m"))).alias("d2"))
    )
    from pyspark.sql import Window as W

    r = F.row_number().over(
        W.partitionBy("label").orderBy(F.col("d2").desc(), F.col("vec_id").asc())
    )
    return (
        dist.withColumn("r", r)
        .where(F.col("r") <= _OUTLIER_K)
        .select(
            F.col("label").cast("int").alias("label"),
            "vec_id",
            F.col("r").cast("int").alias("outlier_rank"),
            F.col("d2").cast("long").alias("sq_dist_micro2"),
        )
    )


@register(
    "p_per_source_sample",
    sampling.per_source_sample_sql(k=10),
    tags=("pipeline", "sampling"),
    doc="per-source WOR sample (10 smallest portable hashes per source): "
    "hash-threshold prefilter confines the rank window to ~4k rows per "
    "source with the sources-scale under-fill guard (the temperature_mix "
    "two-phase pattern) — output bit-identical to a full per-source rank",
)
def q_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.per_source_sample(load_table(spark, sf_dir, "documents"), k=10)


@register(
    "p_histogram_quantiles",
    sketches.histogram_quantiles_sql(),
    tags=("pipeline", "sketch"),
    doc="mergeable equi-width histogram sketch over order prices with "
    "interpolated p50/p90 estimates (exact-integer bucket math, fixed "
    "double estimate expression) and the exact p50 as the in-row audit — "
    "counts merge by addition, unlike exact percentiles; the cumulative "
    "window runs on the 32-row histogram frame",
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sketches.histogram_quantiles(load_table(spark, sf_dir, "lineitem"))



@register(
    "p_source_lang_entropy",
    """
WITH c AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM c GROUP BY source),
terms AS (
  SELECT c.source,
         CAST(round((CAST(c.n AS DOUBLE) / tot.n_docs)
                    * round(ln(CAST(c.n AS DOUBLE) / tot.n_docs), 9), 9)
              AS DECIMAL(28,9)) AS term
  FROM c JOIN tot USING (source)
)
SELECT tot.source, tot.n_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM c WHERE c.source = tot.source) AS n_langs,
       round(-CAST((SELECT sum(term) FROM terms WHERE terms.source = tot.source)
                   AS DOUBLE), 6) AS entropy_nats
FROM tot
""",
    tags=("pipeline", "quality"),
    doc="per-source language-mix entropy (source purity: 0 = monolingual, "
    "ln(k) = uniform over k languages): ln re-quantized to 9 dp before the "
    "share multiply, terms folded as DECIMAL — (source x lang)-grain "
    "aggregation only",
)
def q_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    c = track_cached(
        docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("source").agg(
        F.sum("n").alias("n_docs"), F.count(F.lit(1)).alias("n_langs")
    )
    share = F.col("n") / F.col("n_docs")
    term = F.round(share * F.round(F.log(share), 9), 9).cast("decimal(28,9)")
    ent = (
        c.join(F.broadcast(tot.select("source", "n_docs")), "source")
        .select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.round(-F.sum("term").cast("double"), 6).alias("entropy_nats"))
    )
    return tot.join(F.broadcast(ent), "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "entropy_nats",
    )


@register(
    "p_props_profile",
    """
WITH x AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
),
b AS (SELECT k // 10 AS bucket, k FROM x WHERE k IS NOT NULL),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) - (SELECT count(k) FROM x) AS BIGINT) AS n_missing
  FROM events
)
SELECT b.bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(min(b.k) AS BIGINT) AS min_k, CAST(max(b.k) AS BIGINT) AS max_k,
       tot.n_events, tot.n_missing
FROM b CROSS JOIN tot
GROUP BY b.bucket, tot.n_events, tot.n_missing
""",
    tags=("analytics", "events", "audit"),
    doc="semi-structured payload profile: the events.props JSON field "
    "extracted (r_x3's extraction surface at analytics grain), bucketed "
    "histogram with per-bucket extrema and corpus-wide missing count — "
    "JSON parse is a scan-time projection, one aggregation after",
)
def q_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    ev = load_table(spark, sf_dir, "events")
    x = track_cached(
        ev.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
    )
    tot = x.agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)) - F.count("k")).alias("n_missing"),
    )
    b = x.where(F.col("k").isNotNull()).select(F.expr("k div 10").alias("bucket"), "k")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .join(F.broadcast(tot))
    )


#: buckets of the length-drift CDF grid
_DRIFT_BUCKETS = 32


@register(
    "p_length_drift",
    f"""
WITH v AS (SELECT source, n_chars FROM documents),
ext AS (
  SELECT CAST(min(n_chars) AS BIGINT) AS mn, CAST(max(n_chars) AS BIGINT) AS mx FROM v
),
b AS (
  SELECT source,
         ((n_chars - ext.mn) * {_DRIFT_BUCKETS}) // (ext.mx - ext.mn + 1) AS bucket
  FROM v CROSS JOIN ext
),
h AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY source, bucket),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_docs FROM h GROUP BY source),
grid AS (SELECT CAST(unnest(range({_DRIFT_BUCKETS})) AS BIGINT) AS bucket),
cdf AS (
  SELECT tot.source, grid.bucket,
         (1000000 * CAST(coalesce(sum(h.n), 0) AS BIGINT)) // tot.n_docs AS cdf_ppm
  FROM tot CROSS JOIN grid
  LEFT JOIN h ON h.source = tot.source AND h.bucket <= grid.bucket
  GROUP BY tot.source, grid.bucket, tot.n_docs
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(max(abs(a.cdf_ppm - b.cdf_ppm)) AS BIGINT) AS ks_ppm
  FROM cdf a JOIN cdf b ON a.bucket = b.bucket AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, ks_ppm FROM pairs WHERE ks_ppm >= 100000
""",
    tags=("pipeline", "quality", "audit"),
    doc="distribution-drift audit: KS-style statistic (max CDF gap on a "
    "32-bucket global grid, exact integer ppm) between every source pair's "
    "document-length distribution, reporting pairs drifting >= 10% — the "
    "data-drift alarm a corpus refresh pipeline runs; CDFs are "
    "(source x 32)-grain, the pair join is grid-keyed",
)
def q_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    v = docs.select("source", "n_chars")
    ext = v.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    b = v.join(F.broadcast(ext)).select(
        "source",
        sketches.equiwidth_bucket("n_chars", "mn", "mx", _DRIFT_BUCKETS).alias(
            "bucket"
        ),
    )
    h = track_cached(
        b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = h.groupBy("source").agg(F.sum("n").alias("n_docs"))
    grid = spark.range(_DRIFT_BUCKETS).select(F.col("id").alias("gbucket"))
    cdf = (
        tot.join(F.broadcast(grid))
        .join(h, (h.source == tot.source) & (h.bucket <= F.col("gbucket")), "left")
        .groupBy(tot.source.alias("source"), F.col("gbucket"), "n_docs")
        .agg(
            F.expr("(1000000 * CAST(coalesce(sum(n), 0) AS BIGINT)) div n_docs").alias(
                "cdf_ppm"
            )
        )
    )
    a = cdf.select(
        F.col("source").alias("source_a"), "gbucket", F.col("cdf_ppm").alias("ca")
    )
    bb = cdf.select(
        F.col("source").alias("source_b"), "gbucket", F.col("cdf_ppm").alias("cb")
    )
    pairs = (
        a.join(bb, "gbucket")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.max(F.abs(F.col("ca") - F.col("cb"))).cast("long").alias("ks_ppm"))
    )
    return pairs.where(F.col("ks_ppm") >= 100000)


@register(
    "a_returns_rate_by_brand",
    """
WITH j AS (
  SELECT p.p_brand AS brand, l.l_returnflag, CAST(l.l_quantity AS DECIMAL(18,2)) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT brand,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       (1000000 * CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT))
         // count(*) AS return_ppm,
       CAST(round(sum(CASE WHEN l_returnflag = 'R' THEN q ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
            AS DOUBLE) AS returned_qty
FROM j GROUP BY brand
""",
    tags=("analytics", "relational"),
    doc="return rate per brand (the product-quality ranking behind TPC-H "
    "Q10's customer view): broadcast part dimension, one aggregation, "
    "exact integer ppm rate + DECIMAL quantity fold — brand-grain output",
)
def q_returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
    )
    is_r = F.col("l_returnflag") == "R"
    dec0 = F.lit(0).cast("decimal(18,2)")
    return j.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(F.when(is_r, 1).otherwise(0)).alias("n_returned"),
        F.expr(
            "(1000000 * CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT))"
            " div count(1)"
        ).alias("return_ppm"),
        F.round(F.sum(F.when(is_r, F.col("q")).otherwise(dec0)), 2)
        .cast("double")
        .alias("returned_qty"),
    )


@register(
    "p_jaccard_decile_histogram",
    f"""
WITH pairs AS ({dedup.jaccard_pairs_sql(threshold=0.0)}),
b AS (
  SELECT least(CAST(floor(jaccard * 10) AS BIGINT), 9) AS decile FROM pairs
),
h AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs FROM b GROUP BY decile),
tot AS (SELECT sum(n_pairs) AS t FROM h)
SELECT decile, n_pairs,
       (1000000 * n_pairs) // CAST(t AS BIGINT) AS share_ppm
FROM h, tot
""",
    tags=("pipeline", "dedup"),
    doc="similarity-mass histogram: exact Jaccard of every shingle-sharing "
    "candidate pair bucketed by decile — the threshold-tuning curve a "
    "dedup rollout reads before committing to a cutoff; pairs stay "
    "shingle-blocked, output bounded at 10 rows",
)
def q_jaccard_decile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    sh = track_cached(dedup.word_ngrams(docs))
    pairs = dedup.jaccard_pairs(docs, threshold=0.0, shingles=sh)
    b = pairs.select(
        F.least(F.floor(F.col("jaccard") * 10).cast("long"), F.lit(9)).alias(
            "decile"
        )
    )
    h = track_cached(b.groupBy("decile").agg(F.count(F.lit(1)).alias("n_pairs")))
    tot = h.agg(F.sum("n_pairs").alias("t"))
    return h.join(F.broadcast(tot)).select(
        "decile",
        "n_pairs",
        F.expr("(1000000 * n_pairs) div t").alias("share_ppm"),
    )


@register(
    "p_source_gini",
    """
WITH per AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
ranked AS (
  SELECT toks, CAST(row_number() OVER (ORDER BY toks, source) AS BIGINT) AS i
  FROM per
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(toks) AS BIGINT) AS t,
         CAST(sum(i * toks) AS BIGINT) AS it
  FROM ranked
)
SELECT n AS n_sources, t AS total_tokens,
       round(2.0 * it / (n * CAST(t AS DOUBLE)) - (n + 1.0) / n, 6) AS gini
FROM m
""",
    tags=("pipeline", "sampling", "audit"),
    doc="corpus-balance Gini coefficient over per-source token mass (0 = "
    "perfectly balanced mix, →1 = one source dominates) — the one-number "
    "input to mixing decisions; the rank window runs on the source-count-"
    "sized frame, the coefficient is one fixed double expression over "
    "exact integer moments",
)
def q_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.expr("CAST(sum(size(split(text, ' '))) AS BIGINT)").alias("toks"))
    )
    ranked = per.select(
        "toks",
        F.row_number()
        .over(Window.orderBy("toks", "source"))
        .cast("long")
        .alias("i"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("toks").alias("t"),
        F.sum(F.col("i") * F.col("toks")).alias("it"),
    )
    return m.select(
        F.col("n").alias("n_sources"),
        F.col("t").alias("total_tokens"),
        F.round(
            2.0 * F.col("it") / (F.col("n") * F.col("t").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "p_hapax_share",
    """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY source, tok)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       (1000000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
         AS hapax_ppm
FROM counts GROUP BY source
""",
    tags=("pipeline", "quality"),
    doc="hapax-legomena share per source (types seen exactly once — the "
    "productive-vocabulary signal; boilerplate-heavy domains collapse "
    "toward 0): one explode + one (source, type)-grain aggregation, exact "
    "integer ppm, source-grain output",
)
def q_hapax_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.hashing import spread

    toks = spread(
        load_table(spark, sf_dir, "documents").select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.expr(
            "(1000000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))"
            " div count(1)"
        ).alias("hapax_ppm"),
    )


@register(
    "a_repeat_purchase",
    """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
  WHERE event_type = 'purchase'
),
per_user AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY user_id),
gaps AS (
  SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS gap_us
  FROM p
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM per_user) AS n_buyers,
       (SELECT CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) FROM per_user)
         AS n_repeat_buyers,
       (SELECT (1000000 * CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
        FROM per_user) AS repeat_ppm,
       (SELECT round(quantile_cont(gap_us, 0.5), 6) FROM gaps WHERE gap_us IS NOT NULL)
         AS median_repurchase_gap_us
""",
    tags=("analytics", "events"),
    doc="repeat-purchase readout: buyer counts, repeat share in exact "
    "integer ppm, and the median inter-purchase gap (exact 0.5 quantile) "
    "— the retention KPI next to a_user_rfm; purchase stream collapses to "
    "user grain, gap window is per-user",
)
def q_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    p = track_cached(
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.expr("ts div 1000").alias("ts_us"), "event_id")
    )
    per_user = p.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    buyers = per_user.agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_repeat_buyers"),
        F.expr(
            "(1000000 * CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT))"
            " div count(1)"
        ).alias("repeat_ppm"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = p.select((F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")).where(
        F.col("gap_us").isNotNull()
    )
    med = gaps.agg(
        F.round(F.expr("percentile(gap_us, 0.5D)"), 6).alias(
            "median_repurchase_gap_us"
        )
    )
    return buyers.join(F.broadcast(med))
