"""Operator invariants for the profiling / frontier / graph additions:
skyline vs brute-force dominance, kNN graph vs numpy, containment and
epoch-plan identities, readability arithmetic, Zipf fit vs numpy."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, sampling, similarity, textprof
from kafka_replicator_spark.functions.frontier import skyline_2d


# ------------------------------------------------------------------ skyline

def _brute_skyline(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2]) for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_matches_brute_force_with_ties(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), float(rng.integers(0, 40)) / 2.0, int(rng.integers(1, 20)))
        for i in range(300)
    ]
    # inject exact duplicates and same-price ties
    rows += [(1000, rows[0][1], rows[0][2]), (1001, 5.0, 19), (1002, 5.0, 19)]
    df = spark.createDataFrame(rows, schema="id long, cost double, size long")
    got = sorted(
        (r["id"], r["cost"], r["size"])
        for r in skyline_2d(df, "cost", "size", partitions=5).collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_single_partition_degenerate(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], schema="id long, cost double, size long")
    assert skyline_2d(df, "cost", "size").count() == 1


# ---------------------------------------------------------------- kNN graph

def test_label_knn_graph_matches_numpy(spark):
    rng = np.random.default_rng(11)
    n, dim = 40, 8
    vecs = rng.normal(size=(n, dim)).astype("float32")
    labels = [int(i % 3) for i in range(n)]
    rows = [(int(i), [float(x) for x in vecs[i]], labels[i]) for i in range(n)]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>, label int")
    got = {
        (r["vec_id"], r["nn_rank"]): (r["neighbor_id"], r["d2"])
        for r in similarity.label_knn_graph(df, k=2).collect()
    }
    micro = np.floor(vecs.astype("float64") * 1e6 + 0.5).astype("int64")
    for i in range(n):
        cands = [
            (int(((micro[i] - micro[j]) ** 2).sum()), j)
            for j in range(n)
            if j != i and labels[j] == labels[i]
        ]
        cands.sort()
        for rank, (d2, j) in enumerate(cands[:2], start=1):
            assert got[(i, rank)] == (j, d2)


def test_embedding_stats_centroid_cancellation(spark):
    v = [1.0, -2.0, 3.0, 0.5]
    rows = [(0, v, 1), (1, [-x for x in v], 1)]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>, label int")
    out = similarity.embedding_stats(df).collect()[0]
    assert out["n_vectors"] == 2
    assert out["centroid_norm"] == 0.0  # vectors cancel exactly
    norm = round(math.sqrt(sum(int(math.floor(x * 1e6 + 0.5)) ** 2 for x in v)) / 1e6, 6)
    assert out["avg_norm"] == pytest.approx(norm, abs=1e-6)


# -------------------------------------------------------------- containment

def test_containment_identical_docs_score_one(spark):
    text = " ".join(f"tok{i}" for i in range(40))
    longer = text + " " + " ".join(f"extra{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, longer)], schema="doc_id long, text string"
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in dedup.minhash_containment(df).collect()}
    pair = out[(1, 2)]
    assert pair["containment_a"] == 1.0 and pair["containment_b"] == 1.0
    # if LSH surfaced the prefix-contained pair, the short side must be 1.0
    for key in [(1, 3), (2, 3)]:
        if key in out:
            assert out[key]["containment_a"] == 1.0
            assert out[key]["containment_b"] < 1.0


def test_containment_bounds_on_corpus(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    out = dedup.minhash_containment(load_table(spark, sf_dir, "documents")).collect()
    assert out, "corpus has near-duplicates; containment must surface some"
    for r in out:
        assert 0.0 < r["containment_a"] <= 1.0 and 0.0 < r["containment_b"] <= 1.0
        assert max(r["containment_a"], r["containment_b"]) >= 0.5


# --------------------------------------------------------------- epoch plan

def test_epoch_plan_identities(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sampling.epoch_plan(docs).collect()
    assert rows
    target = rows[0]["target_tokens"]
    for r in rows:
        assert r["target_tokens"] == target  # uniform budget
        assert r["epochs"] == target // r["n_tokens"]
        resid = target - r["epochs"] * r["n_tokens"]
        assert 0 <= resid < r["n_tokens"]
        assert r["residual_ppm"] == (1_000_000 * resid) // r["n_tokens"]


# -------------------------------------------------------------- readability

def test_readability_known_words(spark):
    df = spark.createDataFrame(
        [(1, "the cat banana xyz")], schema="doc_id long, text string"
    )
    r = textprof.readability(df).collect()[0]
    # syllables: the=1, cat=1, banana=3, xyz=1 (floor at 1) -> 6
    assert r["n_words"] == 4 and r["n_syllables"] == 6
    assert r["avg_syllables_milli"] == 1500
    assert r["mono_ratio"] == 0.75
    assert r["forcast_milli"] == 20000 - (15000 * 3) // 4


# --------------------------------------------------------------- Zipf slope

def test_zipf_slope_matches_numpy(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = textprof.zipf_slope(docs).collect()[0]
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"), F.asc("t"))
        .limit(textprof.ZIPF_TOPK)
        .collect()
    )
    x = np.round(np.log(np.arange(1, len(toks) + 1)), 9)
    y = np.round(np.log([r["count"] for r in toks]), 9)
    slope = (len(x) * (x * y).sum() - x.sum() * y.sum()) / (
        len(x) * (x * x).sum() - x.sum() ** 2
    )
    assert got["n_terms"] == len(toks)
    assert got["zipf_slope"] == pytest.approx(slope, abs=1e-5)
    assert got["zipf_slope"] < 0  # frequencies decrease with rank


# ---------------------------------------------------------------- pagerank

def test_pagerank_matches_hand_computation(spark):
    from kafka_replicator_spark.functions.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 1)], schema="vec_id long, neighbor_id long"
    )
    got = {r["node"]: r["pagerank"] for r in pagerank_fixed(edges, n_iter=2).collect()}

    def step(pr, out):
        contrib = {}
        for s, d in [(0, 1), (1, 0), (2, 1)]:
            contrib[d] = contrib.get(d, 0.0) + round(pr[s] / out[s], 9)
        return {n: round(0.15 + 0.85 * contrib.get(n, 0.0), 9) for n in pr}

    pr = {0: 1.0, 1: 1.0, 2: 1.0}
    out = {0: 1, 1: 1, 2: 1}
    for _ in range(2):
        pr = step(pr, out)
    assert got == {n: round(v, 6) for n, v in pr.items()}
    # node 2 has no in-edges: settles at the base score
    assert got[2] == 0.15


# --------------------------------------------------------- length quantiles

def test_length_quantiles_interpolation(spark):
    from kafka_replicator_spark.functions.textprof import length_quantiles

    df = spark.createDataFrame(
        [(i, "x", "s", n) for i, n in enumerate([1, 2, 3, 4])],
        schema="doc_id long, text string, source string, n_chars long",
    )
    r = length_quantiles(df).collect()[0]
    assert (r["p25"], r["p50"], r["p75"]) == (1.75, 2.5, 3.25)
    assert (r["min_chars"], r["max_chars"], r["n_docs"]) == (1, 4, 4)


# ----------------------------------------------------- cross-source overlap

def test_cross_source_overlap_identical_sources(spark):
    from kafka_replicator_spark.functions.dedup import cross_source_overlap

    text = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"v{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, text, "sa"), (2, text, "sb"), (3, other, "sc")],
        schema="doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in cross_source_overlap(df).collect()}
    assert out[("sa", "sb")]["overlap_coeff"] == 1.0
    assert ("sa", "sc") not in out and ("sb", "sc") not in out


def test_dedup_best_quality_survivor(spark):
    from kafka_replicator_spark.functions.dedup import dedup_best_quality

    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(5, text), (2, text), (9, "solo doc here")],
        schema="doc_id long, text string",
    )
    out = {r["survivor_id"]: r["n_copies"] for r in dedup_best_quality(df).collect()}
    assert out == {2: 2, 9: 1}  # equal quality -> min id survives


# ---------------------------------------------------------------- winnowing

def test_winnowing_guarantee_and_density(spark):
    from kafka_replicator_spark.functions.dedup import WINNOW_N, WINNOW_W, winnowing

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    a = " ".join(rng.choice(vocab, 60))
    b = " ".join(rng.choice(vocab, 60))
    shared = " ".join(rng.choice(vocab, WINNOW_W + WINNOW_N - 1))  # guarantee length
    df = spark.createDataFrame(
        [(1, a + " " + shared + " " + b), (2, shared)],
        schema="doc_id long, text string",
    )
    fps = {}
    for r in winnowing(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    # any match of >= w+n-1 tokens must share at least one fingerprint
    assert fps[1] & fps[2]
    # selection stores a fraction of the hash stream (2/(w+1) expected)
    n_grams = len((a + " " + shared + " " + b).split()) - (WINNOW_N - 1)
    assert len(fps[1]) < n_grams / 2


# ---------------------------------------------------------- span corruption

def test_span_corruption_mask_bounds(spark, sf_dir):
    from kafka_replicator_spark.functions.textprof import SPAN_LEN, span_corruption
    from kafka_replicator_spark.sources.tables import load_table

    rows = span_corruption(load_table(spark, sf_dir, "documents")).collect()
    assert rows
    assert any(r["n_spans"] > 0 for r in rows)
    for r in rows:
        # union of spans: at least one masked token per span start, at most
        # SPAN_LEN each, never beyond the document
        if r["n_spans"]:
            assert r["n_spans"] <= r["n_masked"] <= min(
                SPAN_LEN * r["n_spans"], r["n_tokens"]
            )
        else:
            assert r["n_masked"] == 0
        assert r["mask_ppm"] == (1_000_000 * r["n_masked"]) // r["n_tokens"]


def test_coreset_covers_all_cells(spark, sf_dir):
    from kafka_replicator_spark.functions.similarity import coreset_select
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = coreset_select(emb).collect()
    assert sum(r["n_members"] for r in out) == emb.count()
    for r in out:
        assert -1.0 <= r["rep_cos"] <= 1.0


# -------------------------------------------------- split and shard planner

def test_dataset_split_partitions_corpus(spark, sf_dir):
    from kafka_replicator_spark.functions.packing import dataset_split
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = dataset_split(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    splits = {r["split"] for r in rows}
    assert "train" in splits and splits <= {"train", "val", "test"}
    # the hash split must heavily favor train at 98/1/1
    n_train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    assert n_train > 0.9 * docs.count()


def test_shard_plan_boundaries(spark, sf_dir):
    from kafka_replicator_spark.functions.packing import shard_plan
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(shard_plan(docs, shard_tokens=2000).collect(), key=lambda r: r["shard_id"])
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # shards are contiguous in doc-id order
    for prev, cur in zip(rows, rows[1:]):
        assert prev["last_doc"] < cur["first_doc"]
    # every document starts in the shard its exclusive prefix lands in, so
    # a shard never BEGINS beyond the budget boundary: its first doc starts
    # at < (shard_id+1) * budget; totals can overshoot by at most one doc
    cum = 0
    for r in rows:
        assert cum // 2000 == r["shard_id"]
        cum += r["n_tokens"]


# ------------------------------------------------ ts-encoding resilience

def test_event_queries_survive_ts_encoding_flip(spark, sf_dir, tmp_path):
    """The driver has shipped events.ts as timestamp[us] AND TIMESTAMP(NANOS)
    across corpus builds (CLAUDE.md); load_table normalizes both to
    epoch-nanos LONG.  The behavioral-analytics queries must produce
    identical rows on either encoding."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_replicator_spark.queries import all_queries

    alt = tmp_path / "sf_alt"
    alt.mkdir()
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), alt / f)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    i = t.schema.get_field_index("ts")
    t2 = t.set_column(
        i, pa.field("ts", pa.timestamp("ns")), t.column("ts").cast(pa.timestamp("ns"))
    )
    pq.write_table(t2, alt / "events.parquet")

    qs = all_queries()
    for n in ["a_decayed_value", "a_markov_transitions", "a_weekly_active_users"]:
        a = sorted(map(tuple, qs[n].fn(spark, str(sf_dir)).collect()))
        b = sorted(map(tuple, qs[n].fn(spark, str(alt)).collect()))
        assert a == b, f"{n}: results differ across ts encodings"


# ------------------------------------------------------------ prefix stitch

def test_range_prefix_stitch_folds(spark):
    from kafka_replicator_spark.functions.stitch import range_prefix_stitch

    rng = np.random.default_rng(5)
    rows = [(int(i), int(rng.integers(1, 100))) for i in range(200)]
    df = spark.createDataFrame(rows, schema="k long, v long")
    for agg, fold in [("sum", sum), ("max", max)]:
        tagged, prefix = range_prefix_stitch(df, "k", "v", agg=agg, partitions=7)
        pids = {r["k"]: r["__pid"] for r in tagged.collect()}
        pre = {r["__pid"]: r["__prefix"] for r in prefix.collect()}
        by_pid = {}
        for k, v in rows:
            by_pid.setdefault(pids[k], []).append(v)
        for pid in sorted(by_pid):
            earlier = [v for p in by_pid if p < pid for v in by_pid[p]]
            expected = (fold(earlier) if earlier else (0 if agg == "sum" else None))
            assert pre[pid] == expected, (agg, pid)


def test_range_prefix_stitch_extra_sum_col(spark):
    from kafka_replicator_spark.functions.stitch import range_prefix_stitch

    rng = np.random.default_rng(7)
    rows = [
        (int(i), int(rng.integers(1, 100)), int(rng.integers(1, 1000)))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, schema="k long, v long, w long")
    tagged, prefix = range_prefix_stitch(
        df, "k", "v", agg="sum", partitions=5, extra_sum_col="w"
    )
    pids = {r["k"]: r["__pid"] for r in tagged.collect()}
    pre = {r["__pid"]: (r["__prefix"], r["__sprefix"]) for r in prefix.collect()}
    by_pid_v, by_pid_w = {}, {}
    for k, v, w in rows:
        by_pid_v.setdefault(pids[k], []).append(v)
        by_pid_w.setdefault(pids[k], []).append(w)
    for pid in sorted(by_pid_v):
        ev = sum(v for p in by_pid_v if p < pid for v in by_pid_v[p])
        ew = sum(w for p in by_pid_w if p < pid for w in by_pid_w[p])
        assert pre[pid] == (ev, ew), pid
