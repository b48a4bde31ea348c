"""Round-4 operator invariants: boilerplate shares, DSIR weighting, BPE
counting, PQ recall, SemDeDup keep-set structure, and salted-vs-plain
equivalence (the salt must never be visible in a result).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import corpus, similarity
from kafka_replicator_spark.operators.skew import salted_agg
from kafka_replicator_spark.plans.explain import has_broadcast_join
from kafka_replicator_spark.sources.tables import load_table


def test_boiler_ppm_bounded_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = corpus.boiler_ngrams(docs).cache()
    assert out.count() == docs.count()  # every doc reports, even n-gram-free
    bad = out.filter(
        (F.col("boiler_ppm") < 0)
        | (F.col("boiler_ppm") > 1_000_000)
        | (F.col("n_boiler") > F.col("n_ngrams"))
    )
    assert bad.count() == 0


def test_boiler_set_join_broadcasts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert has_broadcast_join(corpus.boiler_ngrams(docs))


def test_dsir_prefers_target_like_docs(spark, sf_dir):
    """Mean weight of the target domain's own documents must exceed the
    complement's — the defining property of importance weighting."""
    docs = load_table(spark, sf_dir, "documents")
    w = corpus.dsir_weights(docs, target_source="src0").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = dict(
        w.groupBy(F.col("source") == "src0")
        .agg(F.avg("dsir_logweight"))
        .collect()
    )
    assert means[True] > means[False]


def test_bpe_pairs_are_adjacent_bigrams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = corpus.bpe_merges(docs, k=10).collect()
    assert len(rows) == 10
    assert all(len(r["pair"]) == 2 for r in rows)
    cnts = [r["cnt"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert cnts == sorted(cnts, reverse=True)


def test_pq_adc_exact_for_codebook_members(spark, sf_dir):
    """A candidate that IS a codebook vector assigns to itself in every
    subspace (self-distance 0 beats everything, id tie-break included), so
    its ADC distance must EQUAL the exact quantized L2 to the probe — the
    approximation error is exactly zero on codebook members.  (The synthetic
    embeddings are near-random, so a recall-overlap assertion against exact
    top-5 would be testing noise; this is the sound invariant.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3]
    stride = 25
    # k large enough to rank every candidate, so codebook members appear
    pq = similarity.pq_topk(emb, probes, k=10_000, code_stride=stride).collect()
    q = similarity.quantize_embeddings(emb).select("vec_id", "qe")
    pr = q.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), F.col("qe").alias("pq")
    )
    exact = (
        q.join(F.broadcast(pr), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("pq", "qe", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
            ),
        )
        .collect()
    )
    exact_d = {(r["probe_id"], r["neighbor_id"]): r["d"] for r in exact}
    checked = 0
    for r in pq:
        if r["neighbor_id"] % stride == 0:
            assert r["adc_dist"] == exact_d[(r["probe_id"], r["neighbor_id"])], (
                f"probe {r['probe_id']} codebook member {r['neighbor_id']}: "
                f"ADC {r['adc_dist']} != exact {exact_d[(r['probe_id'], r['neighbor_id'])]}"
            )
            checked += 1
    assert checked >= 4 * (500 // stride - 1)  # every codebook member, every probe


def test_semantic_dedup_keeps_cluster_minimum(spark, sf_dir):
    """The lowest vec_id of every cluster can have no lower-id neighbor, so
    it must always be kept; total rows are preserved."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.semantic_dedup(emb).cache()
    assert out.count() == emb.count()
    mins = out.groupBy("centroid_id").agg(F.min("vec_id").alias("vec_id"))
    dropped_min = out.join(mins, ["centroid_id", "vec_id"]).filter(F.col("kept") == 0)
    assert dropped_min.count() == 0


def test_salted_agg_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("milli")
    )
    plain = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("milli").alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"])
        for r in salted_agg(
            ev, keys=["event_type"], aggs=[("milli", "count", "n"), ("milli", "sum", "s")]
        ).collect()
    }
    assert plain == salted


def test_new_similarity_ops_broadcast(spark, sf_dir):
    """Codebooks/probes/centroid sets must broadcast — a shuffled corpus
    side in any of these would be the 100 TB bottleneck."""
    emb = load_table(spark, sf_dir, "embeddings")
    assert has_broadcast_join(similarity.pq_topk(emb, [0, 1, 2, 3], k=5))
    assert has_broadcast_join(similarity.ivf_topk_multiprobe(emb, [0, 1, 2, 3], k=5))
    assert has_broadcast_join(similarity.semantic_dedup(emb))


def test_multiprobe_recall_superset_of_nprobe1(spark, sf_dir):
    """nprobe=2's candidate set contains nprobe=1's, so its top-k cosine at
    each rank is >= the nprobe=1 value (recall can only improve)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3]
    one = {(r["probe_id"], r["rank"]): r["cos_sim"]
           for r in similarity.ivf_topk(emb, probes, k=3).collect()}
    two = {(r["probe_id"], r["rank"]): r["cos_sim"]
           for r in similarity.ivf_topk_multiprobe(emb, probes, k=3).collect()}
    for key, cos1 in one.items():
        assert two[key] >= cos1 - 1e-9, f"{key}: multiprobe regressed {two[key]} < {cos1}"


def test_ngram_novelty_first_doc_fully_novel(spark, sf_dir):
    """The lowest doc_id can only contain first occurrences; novel counts
    never exceed totals; the corpus-wide sum of novel grams equals the
    number of distinct grams."""
    docs = load_table(spark, sf_dir, "documents")
    out = corpus.ngram_novelty(docs).cache()
    first = out.orderBy("doc_id").first()
    assert first["novelty_ppm"] == 1_000_000
    assert out.filter(F.col("n_novel") > F.col("n_ngrams")).count() == 0
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    distinct_grams = (
        corpus.boiler_ngrams(docs)  # same hashed-shingle stream
        .agg(F.sum("n_ngrams"))
        .collect()[0][0]
    )
    assert total_novel <= distinct_grams
