"""Lexical-statistics query registrations (functions/lexstats.py):
Kneser-Ney bigram LM, term burstiness, tokenizer fertility, RAKE keywords.

Reference parity: no analog in the reference engine — LLM-pipeline surface
on the documents table (the LM tier above p_bigram_logprob, plus the
lexical curation diagnostics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import lexstats
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@register(
    "p_kneser_ney",
    lexstats.kneser_ney_bigram_sql(),
    tags=("pipeline", "quality", "lm"),
    doc="Kneser-Ney-smoothed bigram probabilities (d = 3/4) for the top-50 "
    "corpus bigrams: continuation counts, context totals and type counts "
    "all derive from ONE bigram-count frame; the probability is an exact "
    "integer ppm over the common denominator, and the k-row top side "
    "broadcasts past the vocab-scale stats frames",
)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexstats.kneser_ney_bigram(_docs(spark, sf_dir))


@register(
    "p_term_burstiness",
    lexstats.term_burstiness_sql(),
    tags=("pipeline", "quality"),
    doc="Fano-factor burstiness (variance/mean of per-doc counts, zeros "
    "included) for the top-20 terms — the Church-Gale content-word signal; "
    "exact integer ppm from S/S2/N, one explode + two count-grain "
    "aggregations",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexstats.term_burstiness(_docs(spark, sf_dir))


@register(
    "p_token_fertility",
    lexstats.token_fertility_sql(),
    tags=("pipeline", "quality"),
    doc="tokenizer fertility per (source, lang): chars per token in exact "
    "milli-units — the compression-ratio dashboard a tokenizer change "
    "ships with; one aggregation, source x lang output",
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexstats.token_fertility(_docs(spark, sf_dir))


@register(
    "p_rake_keywords",
    lexstats.rake_keywords_sql(),
    tags=("pipeline", "quality"),
    doc="RAKE keyword extraction (degree/frequency word scores summed per "
    "stopword-free phrase, top-20): word scores quantize to integer ppm "
    "BEFORE the phrase fold so every sum is order-free; per-doc prefix-sum "
    "window assigns phrase ids on doc-sized partitions",
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexstats.rake_keywords(_docs(spark, sf_dir))
