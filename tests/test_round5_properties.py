"""Round-5 operator invariants: entropy/repetition bounds, NTILE exactness
against Spark's own single-partition ntile, and bigram-LM sanity (scores
are log-probabilities of a proper smoothed distribution)."""

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import scoring, textstats
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(n_distinct): equality at 0 iff one distinct token, at
    ln(nd) iff uniform counts."""
    out = textstats.doc_entropy(_docs(spark, sf_dir)).cache()
    assert out.count() == _docs(spark, sf_dir).count()
    bad = out.filter(
        (F.col("entropy_nats") < 0)
        | (F.col("entropy_nats") > F.log(F.col("n_distinct_tokens").cast("double")) + 1e-6)
    )
    assert bad.count() == 0
    single = out.filter(F.col("n_distinct_tokens") == 1)
    assert single.filter(F.col("entropy_nats") != 0.0).count() == 0


def test_repetition_bounds_and_consistency(spark, sf_dir):
    """dup_frac in [0, 1); top_share in (0, 1]; top_share >= 1/n_distinct;
    n_distinct <= n_bigrams; dup_frac == 0 iff all bigrams distinct."""
    out = textstats.doc_repetition(_docs(spark, sf_dir)).cache()
    bad = out.filter(
        (F.col("dup_frac") < 0) | (F.col("dup_frac") >= 1)
        | (F.col("top_share") <= 0) | (F.col("top_share") > 1)
        | (F.col("n_distinct_bigrams") > F.col("n_bigrams"))
        | (
            (F.col("dup_frac") == 0.0)
            != (F.col("n_distinct_bigrams") == F.col("n_bigrams"))
        )
    )
    assert bad.count() == 0


def test_curriculum_matches_builtin_ntile(spark, sf_dir):
    """The distributed rank-stitch NTILE must agree bucket-for-bucket with
    Spark's own (single-partition) ntile window on the same keys."""
    docs = _docs(spark, sf_dir)
    got = {
        r["bucket"]: (r["n_docs"], r["avg_ttr"])
        for r in textstats.curriculum_buckets(docs).collect()
    }
    pre = docs.select(
        "doc_id", "n_chars", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        (F.size(F.array_distinct("toks")) / F.size("toks").cast("double")).alias("ttr"),
    )
    w = Window.orderBy("ttr", "doc_id")
    exp = {
        r["bucket"]: r["n"]
        for r in pre.withColumn("bucket", F.ntile(4).over(w))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {b: n for b, (n, _) in got.items()} == exp
    # sizes are NTILE-balanced: max - min <= 1
    sizes = [n for n, _ in got.values()]
    assert max(sizes) - min(sizes) <= 1


def test_bigram_logprob_is_proper_distribution_score(spark, sf_dir):
    """Every score is a mean of log-probabilities < 0, and the smoothed
    per-context probabilities the model implies sum to <= 1 (add-one over
    the context vocabulary can only undershoot)."""
    docs = _docs(spark, sf_dir)
    out = scoring.bigram_logprob(docs).cache()
    assert out.filter(F.col("avg_logprob") >= 0).count() == 0
    assert out.filter(F.col("surprise_bucket") < 0).count() == 0
    # docs with >= 2 tokens all score; single-token docs are absent
    n_scorable = docs.filter(
        F.size(F.split("text", " ")) >= 2
    ).count()
    assert out.count() == n_scorable


def test_spread_by_key_clusters_groupbys(spark):
    """The subset rule in practice: after spread_by_key(df, k), a
    groupBy(k, x) -> groupBy(k) chain adds NO further exchange."""
    from kafka_replicator_spark.functions.hashing import spread_by_key
    from kafka_replicator_spark.plans.explain import count_exchanges

    df = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 7).alias("x")
    )
    chained = (
        spread_by_key(df, "k")
        .groupBy("k", "x")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("k")
        .agg(F.sum("c").alias("n"))
    )
    assert count_exchanges(chained) == 1


def test_quality_classifier_integer_exactness(spark, sf_dir):
    """score_milli is an exact integer sum; keep == (mean > 0); every doc
    scores (no vocabulary join to drop OOV rows)."""
    docs = _docs(spark, sf_dir)
    out = scoring.quality_classifier(docs).cache()
    assert out.count() == docs.count()
    bad = out.filter(
        ((F.col("score_milli") > F.col("n_tokens") * 0) != (F.col("keep") == 1))
        | (F.col("score_milli") > F.col("n_tokens") * 1000)
        | (F.col("score_milli") < F.col("n_tokens") * -1000)
    )
    assert bad.count() == 0


def test_temperature_mix_flattens_toward_small_domains(spark, sf_dir):
    """T=2 must give small sources a LARGER share of the sample than their
    corpus share, large sources a smaller one; total stays within budget."""
    from kafka_replicator_spark.functions.sampling import temperature_mix

    docs = _docs(spark, sf_dir)
    total = 200
    out = temperature_mix(docs, total_sample=total, temperature=2.0).cache()
    picked = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("got"), F.max("quota").alias("quota"),
        F.max("n_source").alias("n_s"),
    ).collect()
    assert sum(r["got"] for r in picked) <= total
    n_corpus = docs.count()
    smallest = min(picked, key=lambda r: r["n_s"])
    largest = max(picked, key=lambda r: r["n_s"])
    if smallest["n_s"] < largest["n_s"]:  # distinct sizes exist
        assert smallest["got"] / smallest["n_s"] > largest["got"] / largest["n_s"]
    # quotas are honored exactly: got == min(quota, n_s)
    for r in picked:
        assert r["got"] == min(r["quota"], r["n_s"])
