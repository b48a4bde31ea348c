"""Sequence packing + TF-IDF: greedy semantics, edge cases, plan shape."""

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.packing import pack_sequences, tfidf_top_terms
from kafka_replicator_spark.plans.explain import count_exchanges, has_broadcast_join


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, src, " ".join(["w"] * n)) for i, (src, n) in enumerate(rows)],
        schema="doc_id long, source string, text string",
    )


def test_pack_closes_before_exceeding_budget(spark):
    # tokens: 100, 100, 100 with budget 250 → packs [0,0], [1]
    df = _docs(spark, [("a", 100), ("a", 100), ("a", 100)])
    got = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, budget=250).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_pack_exact_fit_stays_in_pack(spark):
    # 100 + 150 == 250 exactly fits budget 250; the next doc opens pack 1
    df = _docs(spark, [("a", 100), ("a", 150), ("a", 10)])
    got = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, budget=250).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_oversize_doc_packs_alone(spark):
    df = _docs(spark, [("a", 10), ("a", 999), ("a", 10), ("a", 10)])
    rows = {r["doc_id"]: r for r in pack_sequences(df, budget=100).collect()}
    assert [rows[i]["pack_id"] for i in range(4)] == [0, 1, 2, 2]
    assert rows[1]["pack_docs"] == 1 and rows[1]["pack_tokens"] == 999


def test_packing_is_per_source(spark):
    df = _docs(spark, [("a", 60), ("b", 60), ("a", 60), ("b", 60)])
    rows = pack_sequences(df, budget=100).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["pack_id"])
    # each source packs independently from pack 0
    assert sorted(by_src["a"]) == [0, 1] and sorted(by_src["b"]) == [0, 1]


def test_pack_budget_validated(spark):
    df = _docs(spark, [("a", 10)])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)


def test_pack_plan_no_per_source_window(spark, sf_dir):
    """Round 9 replaced the per-source rank window (a whole-source
    single-task sort at corpus scale) with the grouped range-prefix
    stitch: the plan gains bounded exchanges (range partition + the
    (__pid, source)-keyed local window + the boundary walk's source
    shuffle of ~16 B/row metadata + per-pack stats), but NO window may
    partition on [source] alone over the document grain, and the
    boundary arrays still come back broadcast."""
    from kafka_replicator_spark.plans.explain import window_partition_specs
    from kafka_replicator_spark.sources.tables import load_table

    df = pack_sequences(load_table(spark, sf_dir, "documents"), budget=256)
    assert has_broadcast_join(df)
    specs = window_partition_specs(df)
    assert specs and ["source"] not in specs, specs
    assert count_exchanges(df) <= 8


def test_tfidf_rare_term_outranks_common(spark):
    docs = spark.createDataFrame(
        [(1, "s", "rare common"), (2, "s", "common common common")],
        schema="doc_id long, source string, text string",
    )
    top = tfidf_top_terms(docs, k=1).filter(F.col("doc_id") == 1).collect()
    assert top[0]["term"] == "rare"  # equal tf: df=1 outscores df=2


def test_tfidf_deterministic_tie_break(spark):
    docs = spark.createDataFrame(
        [(1, "s", "bb aa")], schema="doc_id long, source string, text string"
    )
    rows = tfidf_top_terms(docs, k=2).orderBy("rank").collect()
    assert [r["term"] for r in rows] == ["aa", "bb"]  # equal score → term asc
