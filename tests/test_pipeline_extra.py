"""Approximate-aggregate surface + LSH/IVF recall sanity (operators whose
outputs are approximate by design get bounded-error checks, not oracles)."""

from pyspark.sql import functions as F

from kafka_replicator_spark.functions import similarity
from kafka_replicator_spark.sources.tables import load_table


def test_approx_count_distinct_within_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.count_distinct("l_partkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15


def test_percentile_approx_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50")
    ).collect()[0]["p50"]
    lo, hi = li.approxQuantile("l_extendedprice", [0.4, 0.6], 0.01)
    assert lo <= approx <= hi


def test_ann_recall_against_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3]
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, probes, k=5).collect()
    }
    ann = {
        (r["probe_id"], r["neighbor_id"])
        for r in similarity.ann_topk(emb, probes, k=5, n_planes=2).collect()
    }
    # 2 hyperplanes -> 4 buckets: candidates ~N/4; recall must be non-trivial
    assert len(ann & exact) >= len(probes)  # >= 1 true neighbor per probe on average


def test_ivf_partition_is_complete(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = similarity.ivf_assign(emb, centroid_stride=100)
    assert assigned.count() == emb.count()  # every vector lands in exactly one cell
    assert assigned.select("vec_id").distinct().count() == emb.count()
