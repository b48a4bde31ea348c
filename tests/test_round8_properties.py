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


def test_mix_budget_sweep_is_monotone(spark, sf_dir):
    """A larger token budget can only ADD picks: for every source, both
    n_selected and tok_selected must be non-decreasing in the budget —
    the hash-priority ranking is budget-independent, so the selected set
    at budget b is a prefix of the set at b' > b (the reproducible-mix
    guarantee the corpus_mix docstring promises)."""
    from kafka_replicator_spark.queries import all_queries

    rows = (
        all_queries()["a_mix_budget_sensitivity"]
        .fn(spark, sf_dir)
        .collect()
    )
    by_source: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["budget"])):
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, seq in by_source.items():
        for a, b in zip(seq, seq[1:]):
            assert a["n_selected"] <= b["n_selected"], (source, a, b)
            assert a["tok_selected"] <= b["tok_selected"], (source, a, b)


def test_ivf_2level_shuffle_fallback_matches_broadcast(spark, sf_dir):
    """VERDICT r09 #3: the per-cell fine table broadcasts only under
    ``broadcast_fine_limit``; past it the join falls back to a shuffle on
    coarse_id (a broadcast growing with C ∝ N is itself a scale ceiling).
    The fallback had never executed anywhere — force it with limit=0 and
    assert (a) bit-identical assignments to the broadcast path and (b) no
    BroadcastExchange whose build side carries the fine-embedding column."""
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.similarity import ivf_assign_2level
    from kafka_replicator_spark.plans.explain import broadcast_build_columns
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bcast = (
        ivf_assign_2level(emb, coarse_factor=4)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    release_cached()
    shuffled_df = ivf_assign_2level(emb, coarse_factor=4, broadcast_fine_limit=0)
    # (b) the fine table (fe rides along) must not build a broadcast side;
    # the coarse-centroid broadcasts (ce) are legitimate and stay
    for cols in broadcast_build_columns(shuffled_df):
        assert not any(c.startswith("fe") for c in cols), cols
    shuffled = shuffled_df.toPandas().sort_values("vec_id").reset_index(drop=True)
    release_cached()
    assert bcast.equals(shuffled)
