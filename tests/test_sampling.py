"""Property tests for the deterministic sampling family
(functions/sampling.py) and the duplicated-span detector
(functions/dedup.dup_spans) — invariants the oracle-parity gate cannot
see (edge-case corpora, determinism, sketch-size bounds).
"""

from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, sampling


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, schema="doc_id long, text string, lang string, source string, n_chars long"
    )


# ------------------------------------------------------------------ PPS

def test_pps_heavy_doc_always_included(spark):
    # one doc carries >= 1/n of the group's weight -> inclusion prob 1
    rows = [(0, "x", "en", "s0", 1_000_000)] + [
        (i, "x", "en", "s0", 10) for i in range(1, 40)
    ]
    got = sampling.pps_sample(_docs(spark, rows), n=2).toPandas()
    assert 0 in set(got["doc_id"])


def test_pps_sample_is_deterministic_subset(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sampling.pps_sample(docs, n=10).toPandas().sort_values("doc_id")
    b = sampling.pps_sample(docs, n=10).toPandas().sort_values("doc_id")
    assert list(a["doc_id"]) == list(b["doc_id"])
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert set(a["doc_id"]) <= all_ids
    # roughly n per group, never wildly more than the whole group
    per_grp = a.groupby("grp").size()
    assert (per_grp <= 40).all() and per_grp.sum() >= 5


def test_pps_zero_weight_never_included(spark):
    rows = [(0, "x", "en", "s0", 0)] + [(i, "x", "en", "s0", 100) for i in range(1, 10)]
    got = sampling.pps_sample(_docs(spark, rows), n=3).toPandas()
    assert 0 not in set(got["doc_id"])


# ------------------------------------------------------------------ KMV

def test_kmv_identical_sources_full_overlap(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text + f" tail{i % 3}", "en", src, 60) for src in ("a", "b") for i in range(6)]
    got = sampling.kmv_overlap(_docs(spark, rows), n=3, k=16).toPandas()
    row = got[(got.sa == "a") & (got.sb == "b")].iloc[0]
    assert row.jacc_est_ppm == 1_000_000
    assert row.jacc_ppm == 1_000_000


def test_kmv_disjoint_sources_zero_overlap(spark):
    rows = [
        (0, "aa bb cc dd ee ff gg hh", "en", "a", 20),
        (1, "ii jj kk ll mm nn oo pp", "en", "b", 20),
    ]
    got = sampling.kmv_overlap(_docs(spark, rows), n=3, k=16).toPandas()
    row = got.iloc[0]
    assert row.n_both == 0 and row.jacc_est_ppm == 0
    assert row.n_inter == 0 and row.jacc_ppm == 0


def test_kmv_sketch_bounded_at_k(spark, sf_dir):
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = 32
    got = sampling.kmv_overlap(docs, n=3, k=k).toPandas()
    assert (got.k_used <= k).all()
    # sources here have >> k shingles, so the merged sketch is full
    assert (got.k_used == k).all()
    assert (got.n_both <= got.k_used).all()


# ------------------------------------------------------------ dup spans

def test_dup_spans_exact_copy_is_all_duplicate(spark):
    text = " ".join(f"w{i}" for i in range(20))
    uniq = " ".join(f"u{i}" for i in range(20))
    rows = [(0, text, "en", "s", 20), (1, text, "en", "s", 20), (2, uniq, "en", "s", 20)]
    got = dedup.dup_spans(_docs(spark, rows), w=8).toPandas().set_index("doc_id")
    assert got.loc[0, "dup_ppm"] == 1_000_000
    assert got.loc[1, "dup_ppm"] == 1_000_000
    assert got.loc[2, "dup_ppm"] == 0
    assert got.loc[2, "n_windows"] == 13  # 20 - 8 + 1


def test_dup_spans_short_docs_absent(spark):
    rows = [(0, "only three words", "en", "s", 16),
            (1, " ".join(f"w{i}" for i in range(9)), "en", "s", 18)]
    got = dedup.dup_spans(_docs(spark, rows), w=8).toPandas()
    assert set(got["doc_id"]) == {1}


def test_dup_spans_counts_within_doc_repeats(spark):
    span = " ".join(f"r{i}" for i in range(8))
    text = span + " mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 " + span
    rows = [(0, text, "en", "s", len(text))]
    got = dedup.dup_spans(_docs(spark, rows), w=8).toPandas()
    assert got.iloc[0]["n_dup"] >= 2  # the repeated span hashes twice


# ------------------------------------------------- temperature mix prefilter

def _tmix_rows(n_big=400, n_small=5):
    rows = [(i, f"doc body {i} alpha beta", "en", "web", 20) for i in range(n_big)]
    rows += [(10_000 + i, f"rare doc {i}", "en", "books", 12) for i in range(n_small)]
    return rows


def test_temperature_mix_prefilter_matches_full_rank(spark, monkeypatch):
    """The hash prefilter must not change output vs a full per-source rank
    (forced by an always-pass threshold via a huge cushion)."""
    from kafka_replicator_spark.cacheutil import release_cached

    docs = _docs(spark, _tmix_rows())
    got = sampling.temperature_mix(docs, total_sample=50).toPandas()
    monkeypatch.setattr(sampling, "_PREFILTER_CUSHION", 1 << 40)  # thr caps at 2^60
    full = sampling.temperature_mix(docs, total_sample=50).toPandas()
    release_cached()
    key = ["doc_id", "source", "n_source", "quota", "sample_rank"]
    assert sorted(map(tuple, got[key].values.tolist())) == sorted(
        map(tuple, full[key].values.tolist())
    )
    assert len(got) > 0


def test_temperature_mix_underfill_falls_back_exactly(spark, monkeypatch):
    """Force the prefilter to keep nothing (margin=cushion=0 → thr=0): the
    sources-scale guard must detect every source under-filled and re-rank
    from the full table — output unchanged."""
    from kafka_replicator_spark.cacheutil import release_cached

    docs = _docs(spark, _tmix_rows())
    expected = None
    for margin, cushion in ((4, 64), (0, 0)):
        monkeypatch.setattr(sampling, "_PREFILTER_MARGIN", margin)
        monkeypatch.setattr(sampling, "_PREFILTER_CUSHION", cushion)
        out = sampling.temperature_mix(docs, total_sample=50).toPandas()
        rows = sorted(map(tuple, out.values.tolist()))
        if expected is None:
            expected = rows
        else:
            assert rows == expected
    release_cached()
