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


def test_dedup_quality_order_invariance(spark, sf_dir):
    """Exact dedup and the Gopher gate COMMUTE on this corpus by
    construction: quality flags are pure functions of the text, so every
    member of a content-hash group passes or fails together, and the
    min-id survivor is the same whichever stage runs first.  The composed
    funnel relies on this (it runs dedup first); pin the algebra so a
    future quality rule that peeks at non-text columns (breaking
    commutativity) fails loudly here instead of silently reordering the
    funnel."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_replicator_spark.functions.curation import gopher_quality
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")

    def dedup_first():
        surv = docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
        q = gopher_quality(surv.drop("_rn")).filter(F.col("passes") == 1)
        return {r["doc_id"] for r in q.select("doc_id").collect()}

    def quality_first():
        q = gopher_quality(docs, keep=("text",)).filter(F.col("passes") == 1)
        surv = (
            docs.join(q.select("doc_id"), "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
        )
        return {r["doc_id"] for r in surv.select("doc_id").collect()}

    a, b = dedup_first(), quality_first()
    assert a == b and len(a) > 0
