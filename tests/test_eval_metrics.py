"""Property tests for the round-5 eval/audit operators: rank-sum AUC vs a
brute-force pairwise oracle, Wilson interval sanity, sorted-neighborhood
recall of exact duplicates, dup-span extent merging, vocab-coverage
competition pro-rating, and RRF contribution math.
"""

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, evalstats


# ------------------------------------------------------------- AUC

@given(
    data=st.lists(
        st.tuples(st.integers(-5, 5), st.booleans()), min_size=2, max_size=40
    ).filter(lambda d: any(y for _, y in d) and any(not y for _, y in d))
)
@settings(max_examples=12, deadline=None)
def test_auc_matches_pairwise_bruteforce(spark_global, data):
    """Rank-sum AUC (with tie correction) must equal the brute-force
    pairwise P(score_pos > score_neg) + 0.5·P(tie), floored to ppm."""
    spark = spark_global
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    expected = (1_000_000 * Fraction(2 * wins + ties, 2 * len(pos) * len(neg))).__floor__()

    scored = spark.createDataFrame(
        [(s, int(y)) for s, y in data], "s long, y int"
    )
    row = evalstats.auc_rank_sum(scored, "s", "y").collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc_ppm"] == expected


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# ----------------------------------------------------------- Wilson

def test_wilson_interval_sanity(spark):
    rows = [("a", 100, 10), ("b", 10, 1), ("c", 50, 0), ("d", 20, 20)]
    df = spark.createDataFrame(rows, "g string, n_docs long, n_dup long")
    out = {r["g"]: r for r in evalstats.wilson_interval(df, "n_docs", "n_dup").collect()}
    for g, n, k in rows:
        lo, hi = out[g]["p_lo"], out[g]["p_hi"]
        assert 0.0 <= lo <= hi <= 1.0
        # the interval must contain the point estimate
        assert lo <= k / n <= hi
    # more data, same rate → tighter interval
    assert out["a"]["p_hi"] - out["a"]["p_lo"] < out["b"]["p_hi"] - out["b"]["p_lo"]


# ----------------------------------------- sorted-neighborhood recall

def test_sorted_neighborhood_finds_exact_dups(spark):
    """Identical texts sort adjacent, so every exact-duplicate pair must be
    an SNM candidate with jaccard 1."""
    texts = [
        ("alpha beta gamma delta epsilon zeta", 0),
        ("alpha beta gamma delta epsilon zeta", 1),
        ("one two three four five six seven", 2),
        ("totally different words here now ok", 3),
    ]
    docs = spark.createDataFrame(
        [(i, t) for t, i in texts], "doc_id long, text string"
    )
    out = dedup.sorted_neighborhood_pairs(docs, w=2, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out.collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)]["jaccard"] == 1.0
    assert pairs[(0, 1)]["rank_dist"] == 1


# --------------------------------------------- dup-span extent merge

def test_dup_span_extents_merges_overlapping_windows(spark):
    """A 10-token run shared by two docs yields ONE merged span covering
    exactly 10 tokens in each (three overlapping 8-windows merged) —
    driving the SHIPPED dedup.dup_span_extents on a synthetic corpus."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = spark.createDataFrame(
        [
            (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
            (2, "v1 v2 v3 v4 v5 v6 v7 v8 " + shared),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.dup_span_extents(docs, w=8).collect()}
    for d in (1, 2):
        assert got[d]["n_spans"] == 1, got
        assert got[d]["covered_tokens"] == 10, got
        assert got[d]["longest_span"] == 10, got


# ------------------------------------------------- vocab coverage

def test_vocab_coverage_competition_prorating(spark):
    """k cutting through a tie group pro-rates — driving the SHIPPED
    vocab_coverage_frame: corpus 'a'×7 'b'×5 'c'×5 'd'×1; k=2 lands inside
    the count-5 tie group → covered = 7 + 1×5 = 12 of 18."""
    from kafka_replicator_spark.queries.pipeline_audits import vocab_coverage_frame

    text = " ".join(["a"] * 7 + ["b"] * 5 + ["c"] * 5 + ["d"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["k"]: r for r in vocab_coverage_frame(docs, [1, 2, 4]).collect()}
    assert out[1]["covered_tokens"] == 7
    assert out[2]["covered_tokens"] == 12  # 7 + pro-rated 1 of the {b,c} tie
    assert out[4]["covered_tokens"] == 18
    assert out[4]["coverage_ppm"] == 1_000_000
    assert out[2]["n_vocab"] == 4


# ----------------------------------------------------------- RRF

def test_rrf_contributions_exact(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    out = all_queries()["p_rrf_fusion"].fn(spark, sf_dir).collect()
    assert out, "fusion produced no rows"
    for r in out:
        exp = 0
        if r["bm25_rank"] > 0:
            exp += 1_000_000 // (60 + r["bm25_rank"])
        if r["quality_rank"] > 0:
            exp += 1_000_000 // (60 + r["quality_rank"])
        assert r["rrf_micro"] == exp
    # output ordered by fused score desc
    scores = [r["rrf_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)
