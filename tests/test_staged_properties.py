"""Property tests for the data-quality / time-series / graph / lexical
operator families added after the round-4 window filled (the
_STAGED_NEXT_ROUND registry block)."""

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import graph, lexstats, profiling


# ---------------------------------------------------------------- graph


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], schema="vec_id long, neighbor_id long"
    )


def test_triangle_census_known_graph(spark):
    # K4 on {0..3} (4 triangles) + pendant path 3-4-5 (0 triangles)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = graph.undirect(_edges(spark, k4 + [(3, 4), (4, 5), (4, 3)]))
    row = graph.triangle_stats(e).collect()[0]
    assert row.n_nodes == 6 and row.n_edges == 8
    assert row.n_triangles == 4
    # wedges: deg 3,3,3,4,2,1 -> 3+3+3+6+1+0 = 16; clustering = 3*4/16
    assert row.n_wedges == 16
    assert row.clustering_ppm == 750000


def test_triangle_census_matches_bruteforce_on_knn(spark, sf_dir):
    from kafka_replicator_spark.functions import similarity
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = graph.undirect(
        similarity.label_knn_graph(emb).select("vec_id", "neighbor_id")
    ).cache()
    got = graph.triangle_stats(e).collect()[0]
    edges = {(r.u, r.v) for r in e.collect()}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # closed wedges: center u with adjacent leaf pair v<w that is itself an
    # edge — each triangle counted once per vertex, i.e. exactly 3 times
    closed = sum(
        1 for u in adj for v in adj[u] for w in adj[u] if v < w and w in adj[v]
    )
    assert got.n_triangles * 3 == closed
    e.unpersist()


def test_common_neighbors_known_graph(spark):
    # square 0-1-2-3-0: diagonals (0,2) and (1,3) share 2 neighbors each
    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = graph.undirect(_edges(spark, sq))
    rows = {
        (r.u, r.v): (r.n_common, r.jaccard_ppm)
        for r in graph.common_neighbor_candidates(e, min_common=2).collect()
    }
    assert rows == {(0, 2): (2, 1000000), (1, 3): (2, 1000000)}


def test_degree_histogram_shares_sum(spark):
    e = graph.undirect(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]))
    rows = graph.degree_histogram(e).collect()
    assert sum(r.n_nodes for r in rows) == 4
    assert all(0 < r.share_ppm <= 1000000 for r in rows)


# ---------------------------------------------------------------- lexical


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )


def test_kneser_ney_matches_python_reference(spark):
    texts = ["x y x z x y", "y x y z"]
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.n1fw, r.n1bw, r.prob_ppm)
        for r in lexstats.kneser_ney_bigram(_docs(spark, texts)).collect()
    }
    # python reference
    from collections import Counter

    bigrams = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    c1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for (a, b), c in bigrams.items():
        c1[a] += c
        n1fw[a] += 1
        n1bw[b] += 1
    n_types = len(bigrams)
    for (a, b), c in bigrams.items():
        num = (4 * c - 3) * n_types + 3 * n1fw[a] * n1bw[b]
        den = 4 * c1[a] * n_types
        assert got[(a, b)] == (c, c1[a], n1fw[a], n1bw[b], 1_000_000 * num // den)


def test_kneser_ney_context_mass_below_one(spark):
    # Σ_w2 P(w2|w1) over OBSERVED continuations stays < 1 (the discount
    # reserves mass for unseen continuations)
    texts = ["a b a c a b a d", "b a b c"]
    rows = lexstats.kneser_ney_bigram(_docs(spark, texts)).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.w1, 0)
        by_ctx[r.w1] += r.prob_ppm
    for w1, mass in by_ctx.items():
        assert mass <= 1_000_000, (w1, mass)


def test_rake_scores_hand_checked(spark):
    # stopwords include 'of' and 'the'; phrases: "deep learning", "deep net"
    rows = {
        r.phrase: (r.n_words, r.n_occurrences, r.score_ppm)
        for r in lexstats.rake_keywords(
            _docs(spark, ["deep learning of the deep net"])
        ).collect()
    }
    # deep: freq 2, degree 2+2=4 -> 2.0; learning: 1/2 -> 2.0; net: 1/2 -> 2.0
    assert rows["deep learning"] == (2, 1, 4_000_000)
    assert rows["deep net"] == (2, 1, 4_000_000)


def test_burstiness_uniform_vs_bursty(spark):
    # 'u' spread one-per-doc (VMR < 1); 'b' concentrated in one doc (VMR > 1)
    texts = ["u b b b b", "u", "u", "u"]
    rows = {
        r.tok: r.vmr_ppm
        for r in lexstats.term_burstiness(_docs(spark, texts)).collect()
    }
    assert rows["b"] > 1_000_000  # bursty
    assert rows["u"] < 1_000_000  # under-dispersed


def test_token_fertility_exact(spark):
    docs = _docs(spark, ["ab cd", "efg"])  # 5+3 chars, 2+1 tokens
    r = {(x.source, x.lang): x for x in lexstats.token_fertility(docs).collect()}
    row = r[("src", "en")]
    assert (row.sum_chars, row.sum_tokens) == (8, 3)
    assert row.chars_per_token_milli == 8000 // 3


# ---------------------------------------------------------------- profiling


def test_benford_digit_extraction_rounding_edges(spark):
    # 999.995 rounds to 100000 cents -> leading digit 1; 0 and negatives drop
    orders = spark.createDataFrame(
        [(999.995,), (0.004,), (12.34,), (91.0,)], schema="o_totalprice double"
    )
    rows = {r.digit: r.n for r in profiling.benford_digits(orders).collect()}
    assert rows == {1: 2, 9: 1}


def test_uniqueness_audit_counts_dup_rows(spark):
    t = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], schema="event_id long"
    )
    tables = dict.fromkeys([n for n, _ in profiling.CANDIDATE_KEYS], t)
    tables["documents"] = t.withColumnRenamed("event_id", "doc_id")
    tables["embeddings"] = t.withColumnRenamed("event_id", "vec_id")
    tables["orders"] = t.withColumnRenamed("event_id", "o_orderkey")
    tables["lineitem"] = t.withColumnRenamed("event_id", "l_orderkey").withColumn(
        "l_linenumber", F.lit(1)
    )
    rows = {r.table_name: r for r in profiling.uniqueness_audit(tables).collect()}
    ev = rows["events"]
    assert (ev.n_rows, ev.n_keys, ev.n_dup_rows) == (4, 3, 2)


# ---------------------------------------------------------------- embeddings


def test_truncation_recall_is_total_at_full_dim(spark, sf_dir):
    from kafka_replicator_spark.functions import similarity
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.dim_truncation_recall(emb, [0, 1, 2], k=3, trunc=64).collect()
    assert len(out) == 3
    assert all(r.recall_ppm == 1_000_000 for r in out)


def test_embedding_covariance_diagonal_is_variance(spark, sf_dir):
    from kafka_replicator_spark.functions import similarity
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.embedding_covariance(emb, n_dims=4).collect()
    assert len(rows) == 10  # 4*5/2 upper-triangle pairs
    for r in rows:
        if r.dim_i == r.dim_j:
            assert r.covariance >= 0
            assert r.correlation == pytest.approx(1.0, abs=1e-6)
        assert -1.0 - 1e-9 <= r.correlation <= 1.0 + 1e-9


# ------------------------------------------------------- staged batch 2


def test_poisson_bootstrap_mass_and_determinism(spark, sf_dir):
    from kafka_replicator_spark.functions import sampling
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r.replicate: r for r in sampling.poisson_bootstrap(docs).collect()}
    b = {r.replicate: r for r in sampling.poisson_bootstrap(docs).collect()}
    assert a.keys() == b.keys() and len(a) == 3
    n = docs.count()
    for rep, row in a.items():
        # deterministic across runs
        assert (row.n_draws, row.n_docs_kept, row.n_tokens_drawn) == (
            b[rep].n_draws,
            b[rep].n_docs_kept,
            b[rep].n_tokens_drawn,
        )
        # Poisson(1): E[draws] = n, sd = sqrt(n); allow 5 sigma
        assert abs(row.n_draws - n) <= 5 * max(1, int(n**0.5)), (rep, row)
        assert 0 < row.n_docs_kept <= n


def test_pca_power_unit_norm_and_positive_eigenvalue(spark, sf_dir):
    from kafka_replicator_spark.functions import similarity
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.pca_power_iteration(emb, n_dims=8, n_iter=3).collect()
    assert len(rows) == 8
    nrm2 = sum(r.loading**2 for r in rows)
    assert nrm2 == pytest.approx(1.0, abs=1e-3)
    lam = rows[0].eigenvalue
    assert lam > 0
    # eigenvalue bounded by the covariance trace
    cov = {
        (r.dim_i, r.dim_j): r.covariance
        for r in similarity.embedding_covariance(emb, n_dims=8).collect()
    }
    trace = sum(v for (i, j), v in cov.items() if i == j)
    assert lam <= trace + 1e-6


def test_ab_arms_partition_users(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    row = all_queries()["a_ab_assignment"].fn(spark, sf_dir).collect()[0]
    total = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.users_control + row.users_treatment == total
    assert row.events_control + row.events_treatment == load_table(
        spark, sf_dir, "events"
    ).count()


def test_simhash_eval_bounds(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    row = all_queries()["p_simhash_eval"].fn(spark, sf_dir).collect()[0]
    assert row.n_both <= min(row.n_truth, row.n_pred)
    assert 0 <= row.precision_ppm <= 1_000_000
    assert 0 <= row.recall_ppm <= 1_000_000


def test_centroid_outliers_ranked_per_label(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    rows = all_queries()["p_centroid_outliers"].fn(spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        rs.sort(key=lambda r: r.outlier_rank)
        assert [r.outlier_rank for r in rs] == list(range(1, len(rs) + 1))
        d2s = [r.sq_dist_micro2 for r in rs]
        assert d2s == sorted(d2s, reverse=True)


def test_oov_rate_bounds(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    for r in all_queries()["p_oov_rate"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0 <= r.oov_ppm <= 1_000_000  # == 1e6 when a source is fully OOV


def test_per_source_sample_equals_full_rank(spark, sf_dir):
    from pyspark.sql import Window

    from kafka_replicator_spark.functions import sampling
    from kafka_replicator_spark.functions.hashing import portable_hash60
    from kafka_replicator_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.source, r.doc_id): r.sample_rank
        for r in sampling.per_source_sample(docs, k=4).collect()
    }
    # reference: full unfiltered per-source rank
    full = (
        docs.select(
            "source", "doc_id", portable_hash60(F.col("text")).alias("h")
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("source").orderBy("h", "doc_id")
            ),
        )
        .filter(F.col("rnk") <= 4)
        .collect()
    )
    exp = {(r.source, r.doc_id): r.rnk for r in full}
    assert got == exp


def test_histogram_counts_merge_by_addition(spark, sf_dir):
    # the sketch state (bucket counts under fixed min/max) merges by pure
    # addition: histogram(all) == histogram(part1) + histogram(part2)
    from pyspark.sql import Window

    from kafka_replicator_spark.functions.sketches import HIST_BUCKETS
    from kafka_replicator_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v"),
        "l_orderkey",
    )
    mn, mx = li.agg(F.min("v"), F.max("v")).collect()[0]
    bucket = F.expr(f"((v - {mn}) * {HIST_BUCKETS}) div ({mx} - {mn} + 1)")

    def hist(df):
        return {
            r.b: r.c
            for r in df.select(bucket.alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    whole = hist(li)
    h1 = hist(li.where(F.col("l_orderkey") % 2 == 0))
    h2 = hist(li.where(F.col("l_orderkey") % 2 == 1))
    merged = {b: h1.get(b, 0) + h2.get(b, 0) for b in set(h1) | set(h2)}
    assert merged == whole


def test_histogram_estimates_bounded_by_bucket_width(spark, sf_dir):
    from kafka_replicator_spark.functions import sketches
    from kafka_replicator_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = {r.quantile_pct: r for r in sketches.histogram_quantiles(li).collect()}
    mn, mx = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).collect()[0]
    width = (mx - mn) / sketches.HIST_BUCKETS
    p50 = rows[50]
    assert p50.exact_value is not None
    assert abs(p50.est_value - p50.exact_value) <= width + 1e-6
    assert mn <= rows[90].est_value <= mx + 1e-6


def test_growth_accounting_ledger_consistency(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    rows = {r.week: r for r in all_queries()["a_growth_accounting"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"(ts div 1000) div {7 * 86_400_000_000}").alias("week")
    ).distinct()
    wau = {r.week: r.n for r in ev.groupBy("week").agg(F.count(F.lit(1)).alias("n")).collect()}
    total_users = ev.select("user_id").distinct().count()
    # every user is new exactly once
    assert sum(r.n_new for r in rows.values()) == total_users
    # each week's actives decompose exactly into new + retained + resurrected
    # (a churn-only ledger row has zero actives by construction)
    for week, r in rows.items():
        assert r.n_new + r.n_retained + r.n_resurrected == wau.get(week, 0), week
    # churn ledger: actives(w) - retained(w+1) == churned(w+1) for interior weeks
    weeks = sorted(rows)
    for w0, w1 in zip(weeks, weeks[1:]):
        if w1 == w0 + 1:
            assert wau[w0] - rows[w1].n_retained == rows[w1].n_churned, (w0, w1)


def test_top_event_paths_cover_all_users(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    rows = all_queries()["a_top_event_paths"].fn(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: (-r.n_users, r.path))
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # the corpus is small enough that 20 paths cover every user or not —
    # either way counts can never exceed the user total
    assert sum(r.n_users for r in rows) <= n_users


def test_cohort_ltv_matrix_invariants(spark, sf_dir):
    from decimal import Decimal

    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    rows = all_queries()["a_cohort_ltv"].fn(spark, sf_dir).collect()
    by_cell = {(r.cohort, r.week_index): r for r in rows}
    # week 0: every cohort member is active (their first event is there)
    for (cohort, wi), r in by_cell.items():
        if wi == 0:
            assert r.n_active == r.cohort_size, (cohort, r)
        assert r.n_active <= r.cohort_size
    # total matrix revenue == total purchase revenue
    ev = load_table(spark, sf_dir, "events")
    total = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2))
        .collect()[0][0]
    )
    got = round(sum(Decimal(str(r.revenue)) for r in rows), 2)
    assert got == total


def test_shipping_lag_quartiles_ordered(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    r = all_queries()["a_shipping_lag"].fn(spark, sf_dir).collect()[0]
    assert r.min_days <= r.p25_days <= r.p50_days <= r.p75_days <= r.max_days
    assert r.min_days <= r.avg_days <= r.max_days
    assert r.n_lineitems > 0


def test_interval_merge_matches_bruteforce(spark):
    from hypothesis import given, settings, strategies as st

    from kafka_replicator_spark.queries.analytics_ts import INTERVAL_US

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            # seconds spread far beyond the 1800 s interval so islands split
            st.tuples(st.integers(0, 3), st.integers(0, 20_000)),
            min_size=1,
            max_size=25,
        )
    )
    def check(evts):
        # brute force: per user, merge [t, t+L) intervals on a number line
        by_user = {}
        for u, t in evts:
            by_user.setdefault(u, []).append((t, t + INTERVAL_US // 1_000_000))
        exp = {}
        for u, ivs in by_user.items():
            ivs.sort()
            islands = []
            for s, e in ivs:
                if islands and s <= islands[-1][1]:
                    islands[-1][1] = max(islands[-1][1], e)
                else:
                    islands.append([s, e])
            exp[u] = (
                len(islands),
                sum(e - s for s, e in islands),
                max(e - s for s, e in islands),
            )
        # run the query's merge logic on a synthetic events frame (seconds
        # scaled to micros so the 30-min interval constant applies)
        from kafka_replicator_spark.queries import all_queries
        import pyspark.sql.functions as F

        rows = [
            (i, int(t * 1_000_000) * 1000, u, "view", 0.0, "{}")
            for i, (u, t) in enumerate(evts)
        ]
        df = spark.createDataFrame(
            rows,
            schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        )
        # drive the same operator body directly (bypassing load_table)
        from pyspark.sql import Window

        iv = df.select(
            "user_id",
            F.expr("ts div 1000").alias("s"),
            (F.expr("ts div 1000") + INTERVAL_US).alias("e"),
        )
        prev = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
            Window.unboundedPreceding, -1
        )
        run = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        marked = iv.withColumn(
            "new_island",
            F.when(F.col("s") > F.coalesce(F.max("e").over(prev), F.lit(-1)), 1).otherwise(0),
        )
        islands = marked.withColumn("island_id", F.sum("new_island").over(run))
        merged = islands.groupBy("user_id", "island_id").agg(
            F.min("s").alias("st"), F.max("e").alias("en")
        )
        got = {
            r.user_id: (r.n, r.cov, r.mx)
            for r in merged.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("en") - F.col("st")).alias("cov"),
                F.max(F.col("en") - F.col("st")).alias("mx"),
            )
            .collect()
        }
        exp_us = {
            u: (n, c * 1_000_000, m * 1_000_000) for u, (n, c, m) in exp.items()
        }
        assert got == exp_us

    check()


def test_weighted_median_matches_bruteforce(spark):
    from hypothesis import given, settings, strategies as st

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.frontier import weighted_median

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-50, 50), st.integers(1, 9)),
            min_size=1,
            max_size=30,
        )
    )
    def check(rows):
        df = spark.createDataFrame(rows, schema="v long, w long")
        got = weighted_median(df, "v", "w", partitions=4).collect()[0]
        release_cached()
        total = sum(w for _, w in rows)
        acc = 0
        exp = None
        for v, w in sorted(rows):
            acc += w
            if acc * 2 >= total:
                exp = v
                break
        assert (got.n_rows, got.total_weight, got.weighted_median) == (
            len(rows),
            total,
            exp,
        )

    check()


def test_observed_volume_batch_and_stream(spark, messages, tmp_path):
    from kafka_replicator_spark.streaming.listeners import observed_volume

    # batch: metrics ride the action, no second pass
    df, obs = observed_volume(messages.select("msg_offset", "msg_size"))
    n = df.count()
    got = obs.get
    assert got["n_rows"] == n
    assert got["total_bytes"] == (
        messages.agg(F.sum("msg_size").cast("long")).collect()[0][0]
    )

    # streaming: metrics appear in per-batch progress
    src = str(tmp_path / "obs_drops")
    messages.select("msg_offset", "msg_size").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema("msg_offset long, msg_size long").parquet(src)
    )
    observed, _ = observed_volume(stream, name="vol")
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    last = q.lastProgress
    assert last is not None and "vol" in (last.observedMetrics or {}), last
    om = last.observedMetrics["vol"]
    assert om["n_rows"] == n


def test_histogram_estimate_brackets_exact_quantiles(spark):
    from hypothesis import given, settings, strategies as st

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions import sketches

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.floats(1.0, 10_000.0, allow_nan=False, width=32),
            min_size=4,
            max_size=60,
        )
    )
    def check(vals):
        df = spark.createDataFrame(
            [(round(v, 2),) for v in vals], schema="l_extendedprice double"
        )
        rows = {r.quantile_pct: r for r in sketches.histogram_quantiles(df).collect()}
        release_cached()
        cents = sorted(round(round(v, 2) * 100) for v in vals)
        width = (cents[-1] - cents[0] + 1) / sketches.HIST_BUCKETS / 100.0
        import math

        for pct in (50, 90):
            r = rows[pct]
            assert r.n_rows == len(vals)
            # the histogram's guarantee: the estimate lies inside the bucket
            # of the order statistic whose cumulative count crosses the
            # target rank (NOT the interpolated quantile — that can sit in
            # an empty bucket between data points)
            target = pct / 100 * len(cents)
            k = max(1, math.ceil(target))
            v_k = cents[k - 1] / 100.0
            assert abs(r.est_value - v_k) <= width + 1e-6, (
                pct,
                r.est_value,
                v_k,
                width,
            )

    check()


def test_lifecycle_roundtrip_under_random_configs(spark, sf_dir, tmp_path):
    """Randomized end-to-end lifecycle: write → compact → read preserves
    every message and per-partition offset order, for arbitrary rollover
    and compaction thresholds (the fixed-config roundtrip tests, made a
    property)."""
    from hypothesis import given, settings, strategies as st

    from kafka_replicator_spark.operators import (
        assign_segments_greedy,
        compact,
        write_segments,
    )
    from kafka_replicator_spark.sources import (
        events_as_messages,
        list_segments,
        read_segment_files,
    )

    msgs = events_as_messages(spark, sf_dir).cache()
    n_msgs = msgs.count()
    counter = [0]

    @settings(max_examples=4, deadline=None)
    @given(
        max_messages=st.integers(50, 400),
        min_count=st.integers(2, 6),
    )
    def check(max_messages, min_count):
        counter[0] += 1
        root = str(tmp_path / f"lc{counter[0]}")
        write_segments(
            assign_segments_greedy(msgs, max_bytes=1 << 20, max_messages=max_messages),
            root=root,
            region="prop-region",
        ).collect()
        compact(
            spark, root, region="prop-region", min_count=min_count, min_bytes=1
        ).collect()
        # below-threshold partitions legitimately keep their original
        # segments — the live listing is the read surface, not the
        # compaction output alone
        live = [r["path"] for r in list_segments(spark, root).collect()]
        back = read_segment_files(spark, live)
        assert back.count() == n_msgs
        # per-partition offsets dense and ordered
        per = (
            back.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("msg_offset").alias("lo"),
                F.max("msg_offset").alias("hi"),
                F.count_distinct("msg_offset").alias("nd"),
            )
            .collect()
        )
        for r in per:
            assert r.nd == r.n == r.hi - r.lo + 1, r

    check()
    msgs.unpersist()


def test_source_gini_bounds_and_uniform_case(spark):
    # uniform token mass -> gini ~ 0 (exact: (2*Σi*x)/(n*t) - (n+1)/n with
    # equal x collapses to 0); rebuild the registered query's arithmetic on
    # an in-memory frame (the registry fn is load_table-bound)
    docs = spark.createDataFrame(
        [(i, "a b c d", "en", f"s{i}", 7) for i in range(5)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    from pyspark.sql import Window

    per = docs.groupBy("source").agg(
        F.expr("CAST(sum(size(split(text, ' '))) AS BIGINT)").alias("toks")
    )
    ranked = per.select(
        "toks",
        F.row_number().over(Window.orderBy("toks", "source")).cast("long").alias("i"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("toks").alias("t"),
        F.sum(F.col("i") * F.col("toks")).alias("it"),
    ).select(
        F.round(
            2.0 * F.col("it") / (F.col("n") * F.col("t").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"), 6,
        ).alias("gini")
    )
    assert abs(m.collect()[0].gini) < 1e-9


def test_hapax_share_hand_checked(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    rows = all_queries()["p_hapax_share"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types
        assert 0 <= r.hapax_ppm <= 1_000_000


def test_repeat_purchase_consistency(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    r = all_queries()["a_repeat_purchase"].fn(spark, sf_dir).collect()[0]
    buyers = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_buyers == buyers
    assert 0 <= r.n_repeat_buyers <= r.n_buyers
    if r.n_repeat_buyers > 0:
        assert r.median_repurchase_gap_us > 0


def test_lsh_capture_curve_matches_python_formula(spark, sf_dir):
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions import dedup
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.sources.tables import load_table

    rows = {r.decile: r for r in all_queries()["p_lsh_capture_curve"].fn(spark, sf_dir).collect()}
    release_cached()
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.word_ngrams(docs).cache()
    js = [
        round(r.jaccard, 6)
        for r in dedup.jaccard_pairs(docs, threshold=0.0, shingles=sh).collect()
    ]
    sh.unpersist()
    from collections import defaultdict
    from decimal import Decimal

    exp = defaultdict(lambda: [0, Decimal(0)])
    for j in js:
        d = min(int(j * 10), 9)
        j2 = j * j
        j4 = j2 * j2
        q = 1.0 - j4
        q2 = q * q
        q4 = q2 * q2
        cap = 1.0 - q4 * q4
        exp[d][0] += 1
        exp[d][1] += Decimal(str(round(cap, 9)))
    assert set(rows) == set(exp)
    for d, (n, ssum) in exp.items():
        assert rows[d].n_pairs == n
        assert float(round(ssum, 6)) == rows[d].sum_capture


def test_anova_f_nonnegative_and_moment_consistent(spark, sf_dir):
    from kafka_replicator_spark.queries import all_queries

    r = all_queries()["a_value_by_hour_anova"].fn(spark, sf_dir).collect()[0]
    assert r.n_groups <= 24
    assert r.f_stat is None or r.f_stat >= 0


def test_registry_window_lists_are_well_formed():
    """The driver verifies the first 50 registry entries; the ordering
    lists must stay disjoint, registered, and duplicate-free or the window
    silently drops names."""
    from kafka_replicator_spark.queries import (
        _EVER_GREEN,
        _NEW_THIS_ROUND,
        _STAGED_NEXT_ROUND,
        all_queries,
    )

    qs = all_queries()
    assert len(_NEW_THIS_ROUND) == len(set(_NEW_THIS_ROUND))
    assert len(_STAGED_NEXT_ROUND) == len(set(_STAGED_NEXT_ROUND))
    assert not (set(_NEW_THIS_ROUND) & set(_STAGED_NEXT_ROUND))
    missing = [
        n for n in _NEW_THIS_ROUND + _STAGED_NEXT_ROUND if n not in qs
    ]
    assert not missing, f"listed but unregistered: {missing}"
    stale = [n for n in _EVER_GREEN if n not in qs]
    assert not stale, f"ever-green names no longer registered: {stale}"
    # every oracle is non-empty SQL or explicitly None
    for n, q in qs.items():
        assert q.oracle is None or q.oracle.strip(), n
