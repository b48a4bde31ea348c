"""Curation-stage queries (quality gate, PII scrub, sampling, dup
clustering).  Registered SECOND — right after the replicator core — so the
driver's correctness window (which verifies a prefix of the registry) covers
them on their first round out; the families registered later all carry green
CORRECTNESS_r01 rows already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import curation, dedup, similarity
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@register(
    "p_dup_clusters",
    dedup.duplicate_clusters_sql(k=16, n=3, bands=4),
    tags=("pipeline", "dedup"),
    doc="near-dup clustering: connected components over the LSH pair graph "
    "via iterative min-label propagation (oracle: recursive CTE); emits the "
    "total keep/drop map with canonical survivors",
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.duplicate_clusters(_docs(spark, sf_dir))


@register(
    "p_quality_rules",
    curation.gopher_quality_sql(),
    tags=("pipeline", "text"),
    doc="Gopher-style heuristic quality gate: word count, mean word length, "
    "stopword presence, most-common-bigram repetition — per-rule flags plus "
    "the conjunction",
)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.gopher_quality(_docs(spark, sf_dir))


@register(
    "p_pii_scrub",
    curation.pii_scrub_sql(),
    tags=("pipeline", "text"),
    doc="PII detect + redact (emails/phones/IPv4) over deterministically "
    "augmented text; counts per doc + md5 of the redacted output",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pii_scrub(_docs(spark, sf_dir))


@register(
    "p_stratified_sample",
    curation.stratified_sample_sql(),
    tags=("pipeline", "sampling"),
    doc="deterministic hash-gated stratified sample (per-language permille "
    "rates) — reproducible training-mix resampling, no RNG state",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.stratified_sample(_docs(spark, sf_dir))


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@register(
    "p_kmeans_centroids",
    similarity.kmeans_train_sql(k=8, iters=2),
    tags=("pipeline", "similarity"),
    doc="Lloyd's k-means (2 rounds, k=8) in pure DataFrame ops: exact "
    "integer-micro centroid sums, in-order fold distances; integer-only "
    "model output (oracle: unrolled-iteration SQL)",
)
def q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.kmeans_train(_emb(spark, sf_dir), k=8, iters=2)


@register(
    "p_ivf_topk_trained",
    similarity.ivf_topk_trained_sql(probe_ids=[0, 1, 2, 3, 4, 5, 6, 7], k=5),
    tags=("pipeline", "similarity"),
    doc="IVF top-k over TRAINED k-means centroids (nprobe=1): the "
    "end-to-end trained flavor of p_ivf_topk",
)
def q_ivf_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk_trained(_emb(spark, sf_dir), probe_ids=[0, 1, 2, 3, 4, 5, 6, 7], k=5)


@register(
    "p_curate_batch",
    curation.curate_batch_sql(),
    tags=("pipeline", "text"),
    doc="composed batch curation: exact dedup (min-id winner) -> Gopher "
    "quality gate -> PII scrub; the batch twin of the streaming intake "
    "(streaming/curation_stream.py)",
)
def q_curate_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    gated = curation.gopher_quality(deduped, keep=("text",)).filter(F.col("passes") == 1)
    return curation.pii_scrub(gated)


@register(
    "p_contamination",
    dedup.contamination_sql(benchmark_sources=("src0", "src1"), n=4),
    tags=("pipeline", "dedup"),
    doc="benchmark decontamination: per training doc, the fraction of its "
    "word 4-grams that appear in the held-out benchmark slice "
    "(test-set-leakage check); equi-join on gram hash, no pair enumeration",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.contamination(_docs(spark, sf_dir), benchmark_sources=("src0", "src1"), n=4)


@register(
    "p_versioned_history",
    """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
)
SELECT user_id, event_id, event_type, ts_us AS valid_from,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
       CAST(lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
            AS BIGINT) AS is_current
FROM e
""",
    tags=("pipeline", "temporal"),
    doc="SCD2 temporal versioning: each keyed change event gets a validity "
    "range (valid_from/valid_to open interval, is_current) — the "
    "time-travel flavor of the checkpoint LWW (A6 keeps only the winner)",
)
def q_versioned_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.operators.temporal import versioned_history

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    return versioned_history(
        ev, key_cols=["user_id"], ts_col="ts_us", order_cols=["event_id"]
    ).select(
        "user_id", "event_id", "event_type",
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        "is_current",
    )


# p_media_frames registers here (not in pipeline.py) because its oracle is
# new this round — it needs a slot inside the driver's verification window;
# the rest of the multimodal family carries round-1 green rows.
from kafka_replicator_spark.functions import multimodal  # noqa: E402


@register(
    "p_media_frames",
    multimodal.media_frames_oracle_sql(),
    tags=("pipeline", "multimodal"),
    doc="video frame-sampling plumbing (1→N bounded batch explosion).  Frames "
    "are deterministic payload byte windows, so the oracle reproduces them "
    "via substring and compares sha256 digests (the corpus is ASCII, so "
    "VARCHAR slicing equals byte slicing; DuckDB 1.0 has no BLOB substring)",
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = multimodal.sample_frames(multimodal.synthesize_media(_docs(spark, sf_dir)))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("long").alias("frame_len"),
        F.sha2("frame_bytes", 256).alias("frame_sha"),
    )


_EMBED_PROBES = [1, 2, 3, 4]


@register(
    "p_media_embed_topk",
    multimodal.media_embed_topk_sql(_EMBED_PROBES, k=5),
    tags=("pipeline", "multimodal", "similarity"),
    doc="multimodal retrieval end-to-end: media payload → Arrow-batched "
    "embedding stub (mapInPandas, the slot a CLIP/wav2vec encoder plugs "
    "into) → broadcast brute-force cosine top-k.  Embeddings are "
    "md5-derived thousandths so the DuckDB oracle reproduces the vectors "
    "bit-for-bit and the cosine fold is exact at 6 dp",
)
def q_media_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.media_embed_topk(_docs(spark, sf_dir), _EMBED_PROBES, k=5)


def _hll_oracle() -> str:
    from kafka_replicator_spark.functions import sketches

    inner = sketches.hll_estimate_sql(
        key_expr="event_id::VARCHAR", group_expr="event_type", table="events"
    )
    return f"""
WITH hll AS ({inner}),
exact AS (
  SELECT event_type, count(DISTINCT event_id::VARCHAR) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT hll.grp AS event_type, reg_sum, empty_buckets, hll_estimate, exact_distinct,
       round(abs(hll_estimate - exact_distinct) / exact_distinct * 100, 2) AS rel_err_pct
FROM hll JOIN exact ON hll.grp = exact.event_type
"""


@register(
    "p_hll_distinct",
    _hll_oracle(),
    tags=("pipeline", "sketch", "aggregation"),
    doc="cross-engine-deterministic HyperLogLog: per-event-type distinct "
    "event_id estimate from 256 registers over the portable md5 hash, "
    "register sum kept exact in int64 so partial-agg order can't change "
    "the estimate; paired with the exact distinct count as an audit "
    "(raw estimator, no ln() small-range correction — see "
    "functions/sketches.py)",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import sketches

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").cast("string").alias("eid")
    )
    est = sketches.hll_estimate(ev, F.col("eid"), ["event_type"])
    exact = ev.groupBy("event_type").agg(F.countDistinct("eid").alias("exact_distinct"))
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "reg_sum",
        "empty_buckets",
        "hll_estimate",
        "exact_distinct",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            * 100,
            2,
        ).alias("rel_err_pct"),
    )




from kafka_replicator_spark.functions.sketches import cms_heavy_hitters_sql  # noqa: E402


@register(
    "p_cms_heavy_hitters",
    cms_heavy_hitters_sql(top_n=20, w=16),
    tags=("pipeline", "sketch", "text"),
    doc="count-min-sketch heavy hitters over the corpus token stream: "
    "4×1024 integer counters from the portable hash family, read back for "
    "the true top-20 tokens with exact counts as audit.  Pure int64 "
    "arithmetic end to end (no floats), so the estimate — including the "
    "collision overcount — is bit-identical across engines; sketches merge "
    "by elementwise addition (functions/sketches.py).  Width 16 here: the "
    "fixture vocabulary is 31 tokens, so the production 4x1024 geometry "
    "would be collision-free and the overcount audit vacuous",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import sketches
    from kafka_replicator_spark.functions.hashing import spread

    toks = spread(_docs(spark, sf_dir)).select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    from kafka_replicator_spark.cacheutil import track_cached
    tok_counts = track_cached(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    sketch = sketches.cms_sketch(tok_counts, key_col="tok", cnt_col="cnt", w=16)
    # Top-k cut via distributed TakeOrdered, never a single-partition
    # row_number over the vocabulary-scale count frame (the guarded
    # small-side rank pattern, cf. textprof.zipf_slope).
    top = tok_counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(20)
    est = sketches.cms_estimate(sketch, top.select("tok"), key_col="tok", w=16)
    return top.join(est, "tok").select(
        F.col("tok").alias("token"),
        F.col("cnt").cast("long").alias("exact_cnt"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("cnt")).cast("long").alias("overcount"),
    )



@register(
    "a_bloom_semi_join",
    """
WITH neg AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders WHERE o_custkey IN (SELECT c_custkey FROM neg)
GROUP BY o_orderpriority
""",
    tags=("analytics", "join", "bloom"),
    doc="bloom-prefiltered semi join (operators/bloom.py): negative-balance "
    "customers fold into a 2^16-bit filter of OR-aggregated int64 blocks; "
    "a pure column predicate drops non-matching orders BEFORE the exact "
    "semi join, so the shuffle sees ~selectivity+fp of the fact side.  "
    "Result is bit-identical to the plain semi join (no false negatives; "
    "the exact join kills false positives) — the explicit form of Spark's "
    "AQE runtime bloom filter",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders")
    neg = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    picked = bloom_semi_join(orders, neg, "o_custkey", "c_custkey")
    return picked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )
