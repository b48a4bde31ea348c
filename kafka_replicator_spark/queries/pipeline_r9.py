"""Round-9 pipeline queries.

First entry: the auto-scaled two-level SemDeDup (VERDICT r08 #4) — the
fixed ``coarse_factor=16`` variant measured 22.8x wall at 100x corpus
because per-cell fine scans grow as C/G when G is constant while C ∝ N;
``coarse_factor=None`` derives G = floor(sqrt(C)+0.5) from a one-job count
of the fine set on BOTH engines (IEEE sqrt is correctly rounded, an exact
half is impossible for integer C), holding the assignment at ~N^1.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.similarity import semantic_dedup_2level_sql
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


@register(
    "p_semantic_dedup_auto",
    semantic_dedup_2level_sql(coarse_factor=None),
    tags=("pipeline", "dedup"),
    doc="SemDeDup over the two-level IVF assignment with the coarse factor "
    "auto-scaled as G = floor(sqrt(C)+0.5) from the fine-centroid count — "
    "the fixed-G variant's per-cell scans grow as C/G (superlinear past "
    "30x corpus, measured); sqrt-scaling holds N^1.5 at any size, and the "
    "oracle derives the identical G from the same count",
)
def q_semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    return similarity.semantic_dedup_2level(
        load_table(spark, sf_dir, "embeddings"), coarse_factor=None
    )
