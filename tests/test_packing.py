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


def _reference_pack(rows, budget):
    """Pure-python whole-source close-before-exceed walk (the pre-r10
    single-pandas-group semantics): rows = [(doc_id, source, n_tokens)]."""
    import collections

    by_src = collections.defaultdict(list)
    for d, s, n in rows:
        by_src[s].append((d, n))
    out = {}
    for s, docs in by_src.items():
        docs.sort()
        base, start, pid = 0, 0, -1
        csum = []
        t = 0
        for _, n in docs:
            t += n
            csum.append(t)
        i = 0
        while i < len(docs):
            pid += 1
            # last row that still fits; at least the start row (oversize)
            e = i
            while e + 1 < len(docs) and csum[e + 1] <= base + budget:
                e += 1
            if csum[i] > base + budget:
                e = i  # oversize packs alone
            else:
                e = i
                while e + 1 < len(docs) and csum[e + 1] <= base + budget:
                    e += 1
            for j in range(i, e + 1):
                out[(docs[j][0], s)] = pid
            base = csum[e]
            i = e + 1
    return out


@pytest.mark.parametrize("partitions", [1, 2, 7, 32])
def test_pack_assign_matches_whole_source_walk(spark, partitions):
    """The sharded (source, __pid)-slice walk with driver-chained entry
    state must be bit-identical to walking each source start-to-finish in
    one group (VERDICT r09 #1).  The corpus mixes oversize docs, 1-token
    docs, and budget-exact runs so slice boundaries fall mid-pack, at
    closes, and inside oversize packs."""
    import random

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.packing import pack_assign

    rng = random.Random(42)
    rows = []
    doc = 0
    for s in ("s0", "s1", "s2"):
        for _ in range(rng.randint(40, 120)):
            r = rng.random()
            n = 999 if r < 0.08 else (1 if r < 0.3 else rng.randint(10, 120))
            rows.append((doc, s, n))
            doc += 1
    budget = 256
    expected = _reference_pack(rows, budget)
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        (r["doc_id"], r["source"]): r["pack_id"]
        for r in pack_assign(df, budget).collect()
    }
    release_cached()
    assert got == expected


def test_pack_boundary_walk_group_key_includes_pid(spark, sf_dir):
    """VERDICT r09 #1 pin: no whole-source pandas group in the pack plan —
    every FlatMapGroupsInPandas grouping key must include the stitch's
    __pid (each group is one range-partition slice of a source, never the
    source itself)."""
    import re

    from kafka_replicator_spark.plans.explain import physical_plan
    from kafka_replicator_spark.sources.tables import load_table

    df = pack_sequences(load_table(spark, sf_dir, "documents"), budget=256)
    plan = physical_plan(df)
    # the formatted plan carries each node's grouping keys as the FIRST
    # bracketed list on the Arguments: line of its detail section
    groups = re.findall(
        r"\(\d+\) FlatMapGroupsInPandas\s*\nInput[^\n]*\nArguments: \[([^\]]*)\]",
        plan,
    )
    assert groups, plan  # the boundary walk is pandas-backed
    for g in groups:
        assert "__pid" in g, f"whole-source pandas group: [{g}]\n{plan}"
