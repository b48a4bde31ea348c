"""Round-8 feature properties that need a Spark session — cross-variant
equivalences the oracle gate cannot express (it checks each query against
its own SQL, not queries against each other)."""


def test_2level_assignment_degenerates_to_flat(spark, sf_dir):
    """With coarse_factor=1 the coarse set IS the fine set: each fine
    centroid coarse-assigns to itself (cos(x,x) is the argmax), so a
    vector's candidate list collapses to exactly its nearest fine centroid
    — the two-level assignment must reproduce the flat one bit-for-bit,
    near-dup counts and all."""
    from kafka_replicator_spark.functions.similarity import (
        semantic_dedup,
        semantic_dedup_2level,
    )
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    flat = semantic_dedup(emb).toPandas().sort_values("vec_id").reset_index(drop=True)
    two = (
        semantic_dedup_2level(emb, coarse_factor=1)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert flat.equals(two)
