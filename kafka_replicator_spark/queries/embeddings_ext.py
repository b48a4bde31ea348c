"""Embedding-diagnostics query registrations (functions/similarity.py):
covariance/correlation matrix, dimension-truncation recall.

Reference parity: no analog in the reference engine — LLM-pipeline surface
on the embeddings table (the pre-PCA / Matryoshka-truncation audits that
precede any index build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import similarity
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: probes of the truncation audit (matches the ANN eval probes)
_TRUNC_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


@register(
    "p_embedding_covariance",
    similarity.embedding_covariance_sql(n_dims=8),
    tags=("pipeline", "similarity"),
    doc="covariance + correlation matrix over the first 8 embedding "
    "dimensions: micro-unit quantization makes the moment sums exact "
    "BIGINTs, the matrix entries are fixed double expressions over them; "
    "one explode + one vec-keyed self-join + pair-grain aggregation, "
    "dims^2/2 output rows",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_covariance(
        load_table(spark, sf_dir, "embeddings"), n_dims=8
    )


@register(
    "p_dim_truncation_recall",
    similarity.dim_truncation_recall_sql(_TRUNC_PROBES, k=5, trunc=32),
    tags=("pipeline", "similarity", "eval"),
    doc="Matryoshka truncation audit: per-probe overlap between exact "
    "top-5 under the first 32 dims and under the full 64 — the retrieval "
    "price of dimension truncation; both rankings are broadcast-probe "
    "brute force (corpus never shuffles), exact integer ppm recall",
)
def q_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.dim_truncation_recall(
        load_table(spark, sf_dir, "embeddings"), _TRUNC_PROBES, k=5, trunc=32
    )


@register(
    "p_pca_power",
    similarity.pca_power_iteration_sql(n_dims=8, n_iter=3),
    tags=("pipeline", "similarity"),
    doc="dominant principal component via 3 fixed power iterations over "
    "the quantized covariance matrix: each iteration is a dims^2-row "
    "matrix-vector join with 9-dp re-quantized DECIMAL folds and a "
    "broadcast 1-row normalizer — engine-independent trajectory, no "
    "driver-side linear algebra; dims output rows",
)
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.pca_power_iteration(
        load_table(spark, sf_dir, "embeddings"), n_dims=8, n_iter=3
    )
