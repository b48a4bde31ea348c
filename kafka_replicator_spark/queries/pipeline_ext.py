"""Training-pipeline operators added in round 3 (sequence packing, TF-IDF).

Separate module so the round-4 rotation can hoist these into the driver's
prefix-of-50 correctness window without touching the round-1-verified
families (see queries/__init__.all_queries for the ordering contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import (
    dedup,
    packing,
    sampling,
    scoring,
    similarity,
    sketches,
    text,
    udtfs,
)
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


@register(
    "p_pack_sequences",
    packing.pack_sequences_sql(budget=256),
    tags=("pipeline", "packing"),
    doc="training-batch sequence packing: greedy close-before-exceed walk "
    "over per-source token counts (same boundary machinery as the segment "
    "rollover planner, operators/egress.py); oracle replays the recurrence "
    "as a recursive CTE",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.pack_sequences(load_table(spark, sf_dir, "documents"), budget=256)


@register(
    "p_tfidf_top_terms",
    packing.tfidf_top_terms_sql(k=3),
    tags=("pipeline", "text"),
    doc="top-3 TF-IDF terms per document with smoothed idf and a rounded-"
    "score + lexicographic deterministic cut",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


@register(
    "p_unigram_logprob",
    scoring.unigram_logprob_sql(),
    tags=("pipeline", "quality"),
    doc="CCNet-style corpus unigram-LM scoring: vocabulary aggregation + "
    "token-key hash join + decimal-exact per-document logprob fold "
    "(functions/scoring.py)",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scoring.unigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "p_prefix_dedup",
    dedup.prefix_duplicates_sql(),
    tags=("pipeline", "dedup"),
    doc="exact prefix-containment dedup by sorted adjacency (Lee et al. "
    "2022 substring-dedup family): one range shuffle + partition-local "
    "windows + a broadcast boundary stitch (functions/dedup.py)",
)
def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.prefix_duplicates(load_table(spark, sf_dir, "documents"))


@register(
    "p_quantized_topk",
    similarity.quantized_topk_sql(probe_ids=[0, 1, 2, 3], k=5),
    tags=("pipeline", "similarity"),
    doc="int8 symmetric quantization + exact integer dot-product top-k — "
    "the quantized scale path of the ANN family; floor(x+0.5) quantizer is "
    "bit-identical across engines so scores are exact BIGINTs",
)
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.quantized_topk(
        load_table(spark, sf_dir, "embeddings"), probe_ids=[0, 1, 2, 3], k=5
    )


@register(
    "p_corpus_mix",
    packing.corpus_mix_sql(),
    tags=("pipeline", "mixing"),
    doc="token-budget corpus mixing: per-source domain weights split a "
    "global budget, hash-priority sampling fills each share with the "
    "close-before-exceed rule (functions/packing.py)",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.corpus_mix(load_table(spark, sf_dir, "documents"))


@register(
    "p_incremental_dedup",
    dedup.incremental_dedup_sql(),
    tags=("pipeline", "dedup"),
    doc="incremental corpus refresh: incoming batch deduped against the "
    "historical corpus via its content-hash + LSH-band index — two hash "
    "semi-joins, the corpus text is never re-read (functions/dedup.py)",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.incremental_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "p_udtf_tokenize",
    udtfs.tokenize_lateral_sql(),
    tags=("pipeline", "udtf"),
    doc="Python UDTF surface (§2.10): LATERAL table function emitting one "
    "row per token with position/length/stopword flag; the 1-to-N "
    "extension point the reference lacks (functions/udtfs.py)",
)
def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return udtfs.tokenize_lateral(spark, load_table(spark, sf_dir, "documents"))


@register(
    "p_dup_spans",
    dedup.dup_spans_sql(w=8),
    tags=("pipeline", "dedup"),
    doc="exact duplicated-span detection: per-document fraction of sliding "
    "8-token window hashes that repeat corpus-wide (Lee et al. 2022 "
    "substring-dedup family, window-hash flavour; functions/dedup.py)",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dup_spans(load_table(spark, sf_dir, "documents"), w=8)


@register(
    "p_pps_sample",
    sampling.pps_sample_sql(n=10),
    tags=("pipeline", "sampling"),
    doc="deterministic probability-proportional-to-size Poisson sample "
    "(~10 docs/language, inclusion prob ∝ n_chars) — exact-integer hash "
    "gate, no RNG; map-only after a broadcast per-group total "
    "(functions/sampling.py)",
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.pps_sample(load_table(spark, sf_dir, "documents"), n=10)


@register(
    "p_kmv_overlap",
    sampling.kmv_overlap_sql(n=3, k=128),
    tags=("pipeline", "sketches"),
    doc="pairwise cross-source overlap from KMV bottom-k sketches "
    "(k=128 minimum 60-bit hashes of distinct 3-gram shingles) with the "
    "exact-intersection audit; integer-ppm Jaccard, sketch state bounded "
    "at sources×k rows at any corpus size (functions/sampling.py)",
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.kmv_overlap(load_table(spark, sf_dir, "documents"), n=3, k=128)


@register(
    "p_oph_jaccard",
    sketches.oph_jaccard_sql(
        key_expr="shingle",
        group_expr="source",
        table=f"({sampling._source_shingles_sql(3)})",
    ),
    tags=("pipeline", "sketches"),
    doc="pairwise source Jaccard from one-permutation-MinHash registers "
    "(64 bucket-minima of the portable hash over distinct 3-gram "
    "shingles; Li et al. 2012) — the batch shape of the streaming "
    "register maintenance in streaming/sketch_stream.py; integer-ppm "
    "output, register state bounded at groups×64 rows",
)
def q_oph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    sh = sampling.source_shingles(load_table(spark, sf_dir, "documents"), n=3)
    regs = sketches.oph_registers(sh, F.col("shingle"), ["source"], b=64)
    return sketches.oph_jaccard_from_registers(regs, "source", b=64)


@register(
    "p_inverted_index",
    text.inverted_index_sql(max_postings=8),
    tags=("pipeline", "text"),
    doc="corpus inverted index: per-token document/collection frequencies "
    "and capped deterministic doc:tf postings — output bounded by "
    "vocabulary, postings capped at 8 (functions/text.py)",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.inverted_index(load_table(spark, sf_dir, "documents"), max_postings=8)


@register(
    "a_interval_join",
    """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events),
v AS (SELECT user_id, us, value FROM ev WHERE event_type = 'view'),
b AS (SELECT user_id, us, value FROM ev WHERE event_type = 'purchase')
SELECT v.user_id, v.us AS view_us, b.us AS buy_us,
       v.value AS view_value, b.value AS buy_value
FROM v JOIN b ON v.user_id = b.user_id
              AND b.us > v.us AND b.us <= v.us + 3600000000
""",
    tags=("analytics", "streaming"),
    doc="event-time interval join (batch shape of streaming/joins."
    "interval_join): attribute each purchase to views within the hour "
    "before it; the same operator runs watermarked on two live streams "
    "(tests/test_stream_join.py)",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kafka_replicator_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        "value",
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_time", F.col("value").alias("view_value")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_time", F.col("value").alias("buy_value")
    )
    j = interval_join(views, buys, on=["user_id"], max_delay="60 minutes")
    return j.select(
        F.col("l.user_id").alias("user_id"),
        F.unix_micros(F.col("l.event_time")).alias("view_us"),
        F.unix_micros(F.col("r.event_time")).alias("buy_us"),
        "view_value",
        "buy_value",
    )
