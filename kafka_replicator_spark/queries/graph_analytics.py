"""Graph-analytics query registrations over the label-blocked kNN similarity
graph (functions/graph.py): triangle census, degree distribution,
common-neighbor link prediction.

The similarity graph is the dedup/curation workhorse (duplicate clusters,
PageRank representatives); this family adds the structural diagnostics a
pipeline runs on that graph — how clustered is it, how are degrees
distributed, which near-miss pairs does the kNN cutoff hide.

Reference parity: no analog in the reference engine (segment-grain only);
part of the LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import graph, similarity
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

_EDGES_CTE = (
    "SELECT vec_id, neighbor_id FROM ("
    + similarity.label_knn_graph_sql()
    + ") knn"
)


def _undirected_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    edges = similarity.label_knn_graph(emb).select("vec_id", "neighbor_id")
    # the canonical edge frame feeds 2-3 plan branches in every consumer
    return track_cached(graph.undirect(edges))


@register(
    "p_triangle_census",
    graph.triangle_stats_sql(_EDGES_CTE),
    tags=("pipeline", "graph"),
    doc="global triangle census + clustering coefficient of the kNN "
    "similarity graph: degree-ordered edge orientation bounds the wedge "
    "join at O(m^1.5) (the distributed triangle-count plan); 1 output row, "
    "exact integer ppm coefficient",
)
def q_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.triangle_stats(_undirected_knn(spark, sf_dir))


@register(
    "p_degree_histogram",
    graph.degree_histogram_sql(_EDGES_CTE),
    tags=("pipeline", "graph"),
    doc="degree distribution of the kNN similarity graph with exact ppm "
    "shares — the hub/skew diagnostic before any per-node graph pass; "
    "two aggregations, max-degree-bounded output",
)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.degree_histogram(_undirected_knn(spark, sf_dir))


@register(
    "p_link_prediction",
    graph.common_neighbor_candidates_sql(_EDGES_CTE, min_common=2),
    tags=("pipeline", "graph", "similarity"),
    doc="common-neighbor link prediction on the kNN graph: non-adjacent "
    "pairs sharing >= 2 neighbors, scored by count and exact-ppm "
    "neighborhood Jaccard — the near-miss pairs the kNN cutoff hides; "
    "wedge join through bounded-degree centers, anti-join against edges",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.common_neighbor_candidates(_undirected_knn(spark, sf_dir), min_common=2)
