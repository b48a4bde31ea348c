"""Round-5 query registrations: per-document distributional text statistics
(functions/textstats.py) — repetition signals, unigram entropy, and
curriculum (difficulty-quantile) bucketing.

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has no
token-level surface — these extend the training-data-pipeline family on the
documents corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import sampling, scoring, textstats
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "p_doc_repetition",
    textstats.doc_repetition_sql(),
    tags=("pipeline", "quality"),
    doc="Gopher duplicate-bigram fraction + top-bigram occupancy per doc, "
    "as explode + groupBy(doc, gram) — the scale path of the per-row "
    "repetition guard in gopher_quality (holds for book-length docs)",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_repetition(_docs(spark, sf_dir))


@register(
    "p_doc_entropy",
    textstats.doc_entropy_sql(),
    tags=("pipeline", "quality"),
    doc="per-document unigram Shannon entropy (nats), integer-count form "
    "with a DECIMAL fold — document-internal repetitiveness score needing "
    "no corpus pass (complements unigram_logprob's corpus-model surprise)",
)
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_entropy(_docs(spark, sf_dir))


@register(
    "p_curriculum_buckets",
    textstats.curriculum_buckets_sql(),
    tags=("pipeline", "sampling"),
    doc="curriculum tiers: exact NTILE(4) by type-token ratio via "
    "repartitionByRange + partition-local rank + broadcast offset stitch "
    "(no single-partition global window); per-tier size and averages",
)
def q_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.curriculum_buckets(_docs(spark, sf_dir))


@register(
    "p_bigram_logprob",
    scoring.bigram_logprob_sql(),
    tags=("pipeline", "quality"),
    doc="add-one-smoothed corpus bigram-LM average log-probability per doc "
    "(CCNet's KenLM slot reduced to the distributable count model); "
    "distinct-bigram-per-doc pre-aggregation keeps the stats join off the "
    "occurrence stream",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scoring.bigram_logprob(_docs(spark, sf_dir))


@register(
    "p_quality_classifier",
    scoring.quality_classifier_sql(),
    tags=("pipeline", "quality"),
    doc="hashed-BoW linear classifier gate (the DCLM/FineWeb classifier-"
    "filtering slot, deterministic stand-in weights); exact integer "
    "milli-unit scoring, single doc-keyed shuffle, no vocabulary join",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scoring.quality_classifier(_docs(spark, sf_dir))


@register(
    "p_temperature_mix",
    sampling.temperature_mix_sql(),
    tags=("pipeline", "sampling"),
    doc="temperature-based domain mixing (quota per source ∝ n^(1/T), "
    "T=2 flattens toward small domains); integer-exact quotas, hash-order "
    "deterministic fill, source-partitioned window — no RNG, no global sort",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.temperature_mix(_docs(spark, sf_dir))
