"""Training-pipeline operators added in round 3 (sequence packing, TF-IDF).

Separate module so the round-4 rotation can hoist these into the driver's
prefix-of-50 correctness window without touching the round-1-verified
families (see queries/__init__.all_queries for the ordering contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import packing
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
