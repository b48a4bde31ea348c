"""Semantics of functions/textstats.py on hand-built inputs (cross-engine
parity at sf0.001 is covered by test_oracle_parity's sweep)."""

import math

from kafka_replicator_spark.functions import textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_doc_repetition_counts(spark):
    """'a b a b a' has bigrams [ab, ba, ab, ba]: 4 slots, 2 distinct,
    dup_frac = top_share = 0.5; a single-token doc emits no row."""
    docs = _docs(spark, [(1, "a b a b a", 9), (2, "solo", 4)])
    rows = {r["doc_id"]: r for r in textstats.doc_repetition(docs).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert r["n_bigrams"] == 4 and r["n_distinct_bigrams"] == 2
    assert r["dup_frac"] == 0.5 and r["top_share"] == 0.5


def test_doc_repetition_unique_doc(spark):
    """All-distinct bigrams: dup_frac 0, top_share 1/(n-1)."""
    docs = _docs(spark, [(1, "v w x y z", 9)])
    r = textstats.doc_repetition(docs).collect()[0]
    assert r["n_bigrams"] == 4 and r["n_distinct_bigrams"] == 4
    assert r["dup_frac"] == 0.0 and r["top_share"] == 0.25


def test_doc_entropy_known_values(spark):
    """'a a b b' → H = ln 2; a constant doc → H = 0; a uniform doc of n
    distinct tokens → H = ln n."""
    docs = _docs(spark, [(1, "a a b b", 7), (2, "x x x x", 7), (3, "p q r s", 7)])
    rows = {r["doc_id"]: r for r in textstats.doc_entropy(docs).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct_tokens"] == 2
    assert abs(rows[1]["entropy_nats"] - round(math.log(2), 6)) < 1e-9
    assert rows[2]["entropy_nats"] == 0.0
    assert abs(rows[3]["entropy_nats"] - round(math.log(4), 6)) < 1e-9


def test_curriculum_ntile_balance(spark):
    """n=10, k=4 → NTILE sizes (3, 3, 2, 2); tiers ordered by difficulty:
    bucket 1 holds the lowest-TTR (most repetitive) docs."""
    rows = []
    for i in range(10):
        # i+1 distinct tokens padded to 12 tokens → ttr strictly increasing
        toks = [f"t{j}" for j in range(i + 1)]
        text = " ".join((toks * 12)[:12])
        rows.append((i, text, len(text)))
    out = {
        r["bucket"]: r for r in textstats.curriculum_buckets(_docs(spark, rows)).collect()
    }
    assert [out[b]["n_docs"] for b in (1, 2, 3, 4)] == [3, 3, 2, 2]
    assert out[1]["avg_ttr"] < out[2]["avg_ttr"] < out[3]["avg_ttr"] < out[4]["avg_ttr"]


def test_curriculum_fewer_docs_than_buckets(spark):
    """n=3 < k=4: NTILE degenerates to one doc per bucket 1..3."""
    rows = [(i, " ".join(f"t{j}" for j in range(i + 1)) + " t0 t0 t0", 20) for i in range(3)]
    out = textstats.curriculum_buckets(_docs(spark, rows)).collect()
    assert sorted(r["bucket"] for r in out) == [1, 2, 3]
    assert all(r["n_docs"] == 1 for r in out)
