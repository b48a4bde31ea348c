"""Corpus-profiling query registrations (functions/textprof.py): readability,
vocabulary growth, Zipf fit, perplexity profile, language-ID confusion —
plus the similarity/dedup/sampling additions of the same build round
(label-blocked kNN graph, embedding stats, MinHash containment, epoch plan).

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has no
token-level surface — these extend the training-data-pipeline family on the
documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import textprof
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "p_readability",
    textprof.readability_sql(),
    tags=("pipeline", "quality"),
    doc="vowel-group syllable heuristic readability: syllable totals, "
    "monosyllable share, FORCAST-style grade in exact integer milli-units; "
    "map-only column math (a scan-time projection at 100 TB)",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.readability(_docs(spark, sf_dir))


@register(
    "p_vocab_growth",
    textprof.vocab_growth_sql(),
    tags=("pipeline", "quality"),
    doc="Heaps'-law vocabulary growth per source: tokens, types, pointwise "
    "exponent ln(types)/ln(tokens) — domain saturation signal for corpus "
    "mixing; one explode + one partial-aggregated groupBy(source)",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.vocab_growth(_docs(spark, sf_dir))


@register(
    "p_zipf_slope",
    textprof.zipf_slope_sql(),
    tags=("pipeline", "quality"),
    doc="Zipf's-law OLS fit (ln freq vs ln rank) over the distributed "
    "top-k vocabulary; window confined to the k surviving rows, regression "
    "moments folded as DECIMAL for order-independent exactness",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.zipf_slope(_docs(spark, sf_dir))


@register(
    "p_perplexity_profile",
    textprof.perplexity_profile_sql(),
    tags=("pipeline", "quality"),
    doc="per-source surprise-bucket histogram of bigram-LM perplexity "
    "(CCNet-style source quality dashboard); builds on the add-one bigram "
    "LM, per-doc perplexities folded as DECIMAL",
)
def q_perplexity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.perplexity_profile(_docs(spark, sf_dir))


@register(
    "p_lang_confusion",
    textprof.lang_confusion_sql(),
    tags=("pipeline", "quality"),
    doc="language-ID confusion matrix (marker heuristic vs labels) with "
    "per-label routing shares via a broadcast totals join — |langs|^2 "
    "output rows at any corpus size",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.lang_confusion(_docs(spark, sf_dir))
