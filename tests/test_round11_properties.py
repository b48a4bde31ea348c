"""Round-11 feature properties that need a Spark session — the trained
fixed-K IVFPQ path (VERDICT r10 #1) invariants the oracle gate cannot
express."""

from pyspark.sql import functions as F


def test_ivf_assign_trained_complete_and_bounded(spark, sf_dir):
    """The trained assignment is TOTAL (every vector gets a cell — unlike
    ivf_assign_2level's documented zero-fine-member drop contract) and the
    cell ids are exactly the trained cluster ids [0, K)."""
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.similarity import ivf_assign_trained
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    k = 8
    assigned = ivf_assign_trained(emb, n_clusters=k, iters=1)
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("nd"),
        F.min("centroid_id").alias("lo"),
        F.max("centroid_id").alias("hi"),
    ).collect()[0]
    n_corpus = emb.count()
    release_cached()
    assert stats["n"] == n_corpus == stats["nd"]
    assert 0 <= stats["lo"] and stats["hi"] <= k - 1


def test_ivf_pq_rerank_trained_plan_shape(spark, sf_dir):
    """The trained IVFPQ chain must stay linear-shaped: no
    CartesianProduct, no corpus-grain broadcast build (the k-means model
    and codebooks are the only cluster/code-grain frames allowed to
    broadcast), and every unbounded window partitions on a
    high-cardinality key (probe_id / vec_id).  One global window is
    allowed: kmeans_train's k-row init rank runs AFTER a LIMIT k, so its
    input is bounded metadata, never the corpus."""
    from kafka_replicator_spark.functions.similarity import ivf_pq_rerank
    from kafka_replicator_spark.plans.explain import (
        broadcast_build_columns,
        physical_plan,
        window_partition_specs,
    )
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # same discipline as the stride-path pin: disable auto-broadcast while
    # building the plan so the estimate-driven tiny-corpus broadcast cannot
    # mask a structural corpus-side build
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = ivf_pq_rerank(
            emb,
            [0, 1, 2, 3],
            k=5,
            shortlist=10,
            coarse_codebook="trained",
            n_clusters=8,
            train_iters=2,
            code_limit=64,
        )
        plan = physical_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "CartesianProduct" not in plan
    banned = {"e", "qe", "sub", "me", "vec_id"}
    for cols in broadcast_build_columns(df):
        bases = {c.split("#")[0].strip() for c in cols}
        assert not (bases & banned), cols
    specs = window_partition_specs(df)
    empty = [s for s in specs if not s]
    assert len(empty) <= 1, specs  # only the bounded k-row init rank
    for spec in specs:
        if spec:
            assert any("probe_id" in c or "vec_id" in c for c in spec), spec


def test_filter_aware_beats_naive_postfilter(spark, sf_dir):
    """The closing of p_ivfpq_label_filtered's documented failure mode
    (VERDICT r10 #4): on the same ~10%-selective label filter the naive
    post-filter STARVES (at least one probe returns < k results) while
    the prefilter arm returns exactly k for EVERY probe, and the
    oversample/prefilter arms' recall is >= naive's per probe (they rank
    over supersets of naive's qualifying candidates)."""
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.queries.pipeline_r11 import _FA_K

    rows = all_queries()["p_ivfpq_filter_aware"].fn(spark, sf_dir).collect()
    release_cached()
    by_arm = {}
    for r in rows:
        by_arm.setdefault(r["arm"], {})[r["probe_id"]] = r
    naive, over, pre = by_arm["naive"], by_arm["oversample"], by_arm["prefilter"]
    assert any(r["n_results"] < _FA_K for r in naive.values())
    assert all(r["n_results"] == _FA_K for r in pre.values())
    for pid, n in naive.items():
        assert over[pid]["recall_ppm"] >= n["recall_ppm"], pid
        assert pre[pid]["n_results"] >= n["n_results"], pid


def test_ivf_pq_rerank_trained_matches_oracle_rowcount(spark, sf_dir):
    """k results per probe whenever the probe's cell holds >= k
    non-probe members — with K=8 over the test corpora every cell does."""
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.similarity import ivf_pq_rerank
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3]
    got = (
        ivf_pq_rerank(
            emb, probes, k=5, shortlist=10, coarse_codebook="trained", n_clusters=8
        )
        .groupBy("probe_id")
        .count()
        .collect()
    )
    release_cached()
    assert {r["probe_id"] for r in got} == set(probes)
    assert all(r["count"] == 5 for r in got)
