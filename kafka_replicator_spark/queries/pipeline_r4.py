"""Round-4 query registrations: corpus curation statistics (boilerplate,
DSIR, BPE), the PQ/SemDeDup tiers of the embedding family, and the skew
machinery (operators/skew.py) surfaced as oracle-checked queries.

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has no
token- or embedding-level surface — these extend the training-data-pipeline
family grafted onto the same documents/embeddings corpus.  The skew queries
exercise the same two-phase/salted shapes its per-partition workers imply at
Spark scale (reference pkg/compaction/compactor.go runs one worker per
partition; a 1000-executor shuffle needs explicit skew control instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import corpus, similarity
from kafka_replicator_spark.operators.skew import salted_agg, salted_join
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


@register(
    "p_boiler_ngrams",
    corpus.boiler_ngrams_sql(),
    tags=("pipeline", "quality"),
    doc="RefinedWeb-style boilerplate share: corpus document-frequency of "
    "4-gram shingles, per-document boilerplate ppm in exact integers; the "
    "high-df boiler set is broadcast back (functions/corpus.py)",
)
def q_boiler_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.boiler_ngrams(load_table(spark, sf_dir, "documents"))


@register(
    "p_dsir_weights",
    corpus.dsir_weights_sql(),
    tags=("pipeline", "sampling"),
    doc="DSIR hashed-unigram importance weights (Xie et al. 2023): "
    "target-vs-raw bucket LM log-ratio, DECIMAL-exact per-doc fold "
    "(functions/corpus.py)",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.dsir_weights(load_table(spark, sf_dir, "documents"))


@register(
    "p_bpe_merges",
    corpus.bpe_merges_sql(),
    tags=("pipeline", "tokenizer"),
    doc="BPE vocab-induction round 1: corpus-weighted adjacent-char pair "
    "counts over the collapsed vocabulary, deterministic top-20 "
    "(functions/corpus.py)",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.bpe_merges(load_table(spark, sf_dir, "documents"))


@register(
    "p_pq_topk",
    similarity.pq_topk_sql([0, 1, 2, 3], k=5),
    tags=("pipeline", "similarity"),
    doc="product-quantization ADC top-k over int8-quantized vectors — "
    "exact BIGINT distances, deterministic codebooks; the memory-scale ANN "
    "tier (functions/similarity.py)",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.pq_topk(load_table(spark, sf_dir, "embeddings"), [0, 1, 2, 3], k=5)


@register(
    "p_semantic_dedup",
    similarity.semantic_dedup_sql(),
    tags=("pipeline", "dedup"),
    doc="SemDeDup (Abbas et al. 2023): coarse clusters confine the "
    "pairwise cosine scan; lowest-id representative survives "
    "(functions/similarity.py)",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.semantic_dedup(load_table(spark, sf_dir, "embeddings"))


# ------------------------------------------------------------ skew surface

#: floor(value*1000) — IEEE-identical in both engines, so the skew-safe
#: aggregates stay exact BIGINTs (the money convention for a DOUBLE input).
_MILLI = "CAST(floor(value * 1000) AS BIGINT)"


@register(
    "a_salted_agg",
    f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_MILLI}) AS BIGINT) AS value_milli_sum,
       CAST(min({_MILLI}) AS BIGINT) AS value_milli_min,
       CAST(max({_MILLI}) AS BIGINT) AS value_milli_max
FROM events GROUP BY event_type
""",
    tags=("analytics", "skew"),
    doc="two-phase salted aggregation (operators/skew.py salted_agg): "
    "pre-aggregate on (key, salt) so a hot key never lands on one reducer; "
    "oracle is the plain GROUP BY — the salt must be invisible in the result",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("milli")
    )
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs=[
            ("milli", "count", "n"),
            ("milli", "sum", "value_milli_sum"),
            ("milli", "min", "value_milli_min"),
            ("milli", "max", "value_milli_max"),
        ],
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("value_milli_sum").cast("long").alias("value_milli_sum"),
        F.col("value_milli_min").cast("long").alias("value_milli_min"),
        F.col("value_milli_max").cast("long").alias("value_milli_max"),
    )


@register(
    "a_salted_join",
    f"""
WITH dim AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(d.n_users) AS BIGINT) AS n_users,
       CAST(sum({_MILLI.replace('value', 'e.value')}) AS BIGINT) AS value_milli_sum
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
""",
    tags=("analytics", "skew"),
    doc="salted replicated join (operators/skew.py salted_join): the hot "
    "fact key spreads across n_salts reducers, the dim side replicates per "
    "salt; oracle is the plain join — salting must not change the result",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.floor(F.col("value") * 1000).cast("long").alias("milli")
    )
    dim = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))
    joined = salted_join(ev, dim, "event_type")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("n_users").cast("long").alias("n_users"),
        F.sum("milli").cast("long").alias("value_milli_sum"),
    )


@register(
    "a_dedup_first_event",
    """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_dups
  FROM events
)
SELECT user_id, event_type,
       CAST(ts_us AS BIGINT) AS first_ts_us,
       CAST(event_id AS BIGINT) AS first_event_id,
       CAST(n_dups AS BIGINT) AS n_dups
FROM ranked WHERE rn = 1
""",
    tags=("analytics", "dedup"),
    doc="batch shape of streaming dropDuplicatesWithinWatermark keyed "
    "(user_id, event_type) (streaming/curation_stream.py:44): first "
    "occurrence by (event-time, event_id) survives, duplicate count kept; "
    "one keyed shuffle, no window",
)
def q_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    return ev.groupBy("user_id", "event_type").agg(
        F.min("ts_us").cast("long").alias("first_ts_us"),
        F.min_by("event_id", F.struct("ts_us", "event_id")).cast("long").alias("first_event_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )


@register(
    "p_cooccur_pmi",
    corpus.cooccur_pmi_sql(),
    tags=("pipeline", "text"),
    doc="top-20 word pairs by PMI within a ±2 co-occurrence window "
    "(word2vec/GloVe-style preprocessing): exact integer pair counts, "
    "vocabulary-keyed marginal joins, deterministic rounded-PMI cut "
    "(functions/corpus.py)",
)
def q_cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.cooccur_pmi(load_table(spark, sf_dir, "documents"))


@register(
    "p_ivf_multiprobe",
    similarity.ivf_topk_multiprobe_sql([0, 1, 2, 3], k=5),
    tags=("pipeline", "similarity"),
    doc="IVF search with nprobe=2 — the recall knob over ivf_topk's "
    "nprobe=1 boundary misses; one extra broadcast row per probe cell, "
    "still a single corpus pass (functions/similarity.py)",
)
def q_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk_multiprobe(
        load_table(spark, sf_dir, "embeddings"), [0, 1, 2, 3], k=5
    )


_HLL_UNION_ORACLE = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), hashed AS (
  SELECT source,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) >> 52 AS bucket,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) & ((1::BIGINT << 52) - 1) AS w
  FROM toks
), regs AS (
  SELECT source, bucket,
         max(CASE WHEN w = 0 THEN 52 ELSE 53 - length(bin(w)) END) AS r
  FROM hashed GROUP BY source, bucket
), merged AS (
  SELECT bucket, max(r) AS r FROM regs GROUP BY bucket
), per AS (
  SELECT CAST(sum(1::BIGINT << (53 - r)) AS BIGINT) AS s_nonempty, count(*) AS nb
  FROM merged
)
SELECT 'all' AS grp,
       CAST(s_nonempty + (256 - nb) * (1::BIGINT << 53) AS BIGINT) AS reg_sum,
       CAST(256 - nb AS BIGINT) AS empty_buckets,
       round(4.2399330249068963e+20 / (s_nonempty + (256 - nb) * (1::BIGINT << 53)), 4) AS hll_estimate,
       (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM toks) AS exact_distinct
FROM per
"""


@register(
    "p_hll_union",
    _HLL_UNION_ORACLE,
    tags=("pipeline", "sketch"),
    doc="HLL union via register max-merge (functions/sketches.py): "
    "per-source register tables merge with bucket-wise max — the sketch "
    "mergeability contract as a query — and the union estimate is read "
    "out through the identical exact-int64 arithmetic, with the exact "
    "distinct count as an in-query audit",
)
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import sketches
    from kafka_replicator_spark.functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens_col()).alias("tok"))
    per_source = sketches.hll_registers(toks, F.col("tok"), ["source"])
    merged = (
        per_source.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .withColumn("grp", F.lit("all"))
    )
    est = sketches.hll_estimate_from_registers(merged, ["grp"])
    exact = toks.agg(F.countDistinct("tok").alias("exact_distinct"))
    return est.join(F.broadcast(exact)).select(
        "grp", "reg_sum", "empty_buckets", "hll_estimate",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


@register(
    "p_ngram_novelty",
    corpus.ngram_novelty_sql(),
    tags=("pipeline", "dedup"),
    doc="per-document n-gram novelty vs all earlier doc_ids (corpus growth "
    "curves): first-occurrence is min(doc_id) per hashed gram — an "
    "aggregation, not a sequential scan — integer-ppm output "
    "(functions/corpus.py)",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.ngram_novelty(load_table(spark, sf_dir, "documents"))
