"""Property tests for the round-3 operators: invariants that must hold on
ANY input, independent of the oracle comparison.

* prefix dedup — after dropping flagged docs, no surviving text is a
  proper prefix (or equal-text duplicate) of another survivor;
* corpus mix — every source stays within its token budget under the
  close-before-exceed rule, and the picked set is a hash-priority prefix;
* quantized top-k — quantized vectors are int8-ranged and all-zero
  vectors survive (scale null-guard).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.dedup import prefix_duplicates
from kafka_replicator_spark.functions.packing import corpus_mix
from kafka_replicator_spark.functions.similarity import quantize_embeddings

TOKENS = ["alpha", "beta", "gamma", "delta", "eps"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(TOKENS), min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_prefix_dedup_survivors_are_prefix_free(spark_global, docs):
    spark = spark_global
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], schema="doc_id long, text string"
    )
    flags = {r["doc_id"]: r["is_prefix_dup"] for r in prefix_duplicates(df).collect()}
    # reconstruct the augmented corpus exactly as the operator does
    aug = {i: t for i, t in enumerate(docs)}
    for i, t in enumerate(docs):
        if i % 7 == 0:
            aug[i + 100_000] = t[: max(8, len(t) // 2)]
    survivors = sorted(
        (t, i) for i, t in aug.items() if flags[i] == 0
    )
    # no survivor is a prefix of (or equal to) any other survivor
    for (t1, i1), (t2, i2) in zip(survivors, survivors[1:]):
        assert not t2.startswith(t1), (t1, i1, t2, i2)
    # every dropped doc IS a prefix of some other doc (or an equal-text dup)
    for i, dup in flags.items():
        if dup:
            t = aug[i]
            others = [v for j, v in aug.items() if j != i]
            assert any(o.startswith(t) for o in others), (i, t)


def test_corpus_mix_budgets_respected(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    budget = 20_000
    docs = load_table(spark, sf_dir, "documents")
    picked = corpus_mix(docs, budget_tokens=budget)
    rows = picked.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    import math

    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    src_w = {s: 1 + int(s[3:]) % 3 for s in sources}
    w_total = sum(src_w.values())
    for s, rs in by_src.items():
        src_budget = math.floor(budget * src_w[s] / w_total)
        rs.sort(key=lambda r: r["pick_rank"])
        # close-before-exceed: every pick starts below the budget; all but
        # the last stay within it entirely
        for r in rs[:-1]:
            assert r["cum_tokens"] - r["n_tokens"] < src_budget
        last = rs[-1]
        assert last["cum_tokens"] - last["n_tokens"] < src_budget
        # ranks are a dense prefix (hash-priority sample is a prefix cut)
        assert [r["pick_rank"] for r in rs] == list(range(1, len(rs) + 1))


def test_quantize_embeddings_int8_range_and_zero_guard(spark):
    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25]),
            (2, [0.0, 0.0, 0.0]),  # all-zero: scale null-guarded
            (3, [3.0]),
        ],
        schema="vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for vid, r in rows.items():
        assert all(-127 <= q <= 127 for q in r["qe"]), r
    assert rows[2]["qe"] == [0, 0, 0]
    assert rows[2]["scale"] == 0.0
    assert rows[3]["qe"] == [127]


@pytest.fixture(scope="module")
def spark_global(spark):
    # hypothesis forbids function-scoped fixtures inside @given; alias the
    # session Spark at module scope (same pattern as test_greedy_properties)
    return spark


def test_hll_registers_merge_distributively(spark, sf_dir):
    """The property that makes HLL scale-correct: registers computed over a
    UNION equal the elementwise max of registers computed over the parts —
    so partial sketches from any partitioning merge without re-reading data,
    and the estimate is independent of how the input was split.
    """
    from kafka_replicator_spark.functions.sketches import hll_estimate, hll_registers
    from kafka_replicator_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("event_id").cast("string").alias("eid")
    )
    a = ev.filter(F.col("eid").cast("long") % 2 == 0)
    b = ev.filter(F.col("eid").cast("long") % 2 == 1)
    merged_parts = (
        hll_registers(a, F.col("eid"), ["event_type"])
        .unionByName(hll_registers(b, F.col("eid"), ["event_type"]))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("r"))
    )
    whole = hll_registers(ev, F.col("eid"), ["event_type"])
    assert merged_parts.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged_parts).count() == 0

    # estimates agree with the single-pass query too
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in hll_estimate(ev, F.col("eid"), ["event_type"]).collect()
    }
    assert len(est) == 5 and all(v > 0 for v in est.values())


def test_cms_never_underestimates_and_merges_additively(spark, sf_dir):
    """CMS guarantees estimate >= true count for EVERY key (min of sums
    that each include the key's own mass), and part-sketches sum to the
    whole sketch — the two properties that make it a safe distributed
    counter at any scale.
    """
    from kafka_replicator_spark.functions.sketches import cms_estimate, cms_sketch
    from kafka_replicator_spark.sources.tables import load_table

    W = 16
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).cache()
    sketch = cms_sketch(counts, key_col="tok", cnt_col="cnt", w=W).cache()

    est = cms_estimate(sketch, counts.select("tok"), key_col="tok", w=W)
    under = est.join(counts, "tok").filter(F.col("cms_estimate") < F.col("cnt"))
    assert under.count() == 0

    a = counts.filter(F.length("tok") % 2 == 0)
    b = counts.filter(F.length("tok") % 2 == 1)
    merged = (
        cms_sketch(a, key_col="tok", cnt_col="cnt", w=W)
        .unionByName(cms_sketch(b, key_col="tok", cnt_col="cnt", w=W))
        .groupBy("i", "b")
        .agg(F.sum("counter").alias("counter"))
    )
    assert merged.exceptAll(sketch).count() == 0
    assert sketch.exceptAll(merged).count() == 0


def test_bloom_semi_join_exact_even_with_heavy_false_positives(spark, sf_dir):
    """Shrink the filter to 64 bits so false positives are guaranteed; the
    operator must still return exactly the plain semi join (no false
    negatives by construction, FPs removed by the exact join).
    """
    from kafka_replicator_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_semi_join,
    )
    from kafka_replicator_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    neg = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    got = bloom_semi_join(orders, neg, "o_custkey", "c_custkey", m_bits=64)
    exp = orders.join(
        neg.select(F.col("c_custkey").alias("o_custkey")).dropDuplicates(),
        "o_custkey",
        "left_semi",
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # at 64 bits the filter saturates, so the prefilter passes MORE than the
    # true matches (real FPs) — the final exact join does the correctness work
    blocks = bloom_build(neg, "c_custkey", m_bits=64)
    passed = orders.filter(
        bloom_might_contain(F.col("o_custkey"), blocks, m_bits=64)
    ).count()
    assert passed > exp.count()
