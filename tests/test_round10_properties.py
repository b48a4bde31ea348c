"""Round-10 feature properties that need a Spark session — cross-variant
equivalences and plan shapes the oracle gate cannot express."""


def test_ivf_pq_rerank_two_level_degenerates_to_flat(spark, sf_dir):
    """With coarse_factor=1 the 2-level assignment IS the flat one
    (test_2level_assignment_degenerates_to_flat), so the whole IVFPQ +
    refine chain must reproduce the flat-assignment variant bit-for-bit —
    shortlists, rerank distances, ranks and all.  Pins that the two_level
    default cannot silently change which candidates the PQ scan sees
    beyond the documented cell-boundary approximation."""
    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.functions.similarity import ivf_pq_rerank
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3]
    flat = (
        ivf_pq_rerank(emb, probes, k=5, shortlist=10, two_level=False)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    release_cached()
    two = (
        ivf_pq_rerank(emb, probes, k=5, shortlist=10, two_level=True, coarse_factor=1)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    release_cached()
    assert len(flat) > 0
    assert flat.equals(two)


def test_ivf_pq_rerank_plan_shape(spark, sf_dir):
    """The IVFPQ chain must never degenerate to an all-pairs scan: no
    CartesianProduct / BroadcastNestedLoopJoin over the corpus (the
    assignment argmaxes are map-side aggregations; the deliberate
    broadcast-cross of the tiny coarse-centroid set inside
    ivf_assign_2level is bounded metadata, and every other broadcast build
    is probe-grain or codebook-grain), and every window partitions on a
    high-cardinality key (probe_id, or vec_id for the per-vector code
    argmin) — never an empty/global or low-cardinality partition spec."""
    from kafka_replicator_spark.functions.similarity import ivf_pq_rerank
    from kafka_replicator_spark.plans.explain import (
        broadcast_build_columns,
        physical_plan,
        window_partition_specs,
    )
    from kafka_replicator_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    # disable auto-broadcast while building the plan: at test scale
    # Catalyst happily broadcasts the whole (tiny) corpus, which is
    # exactly the estimate-driven choice that cannot survive 100 TB —
    # the pin checks the EXPLICIT broadcast structure the code declares
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = ivf_pq_rerank(emb, [0, 1, 2, 3], k=5, shortlist=10)
        plan = physical_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin appears legitimately (the deliberate
    # broadcast-cross of the tiny coarse-centroid set inside
    # ivf_assign_2level), so instead of banning BNLJ pin the BUILD sides:
    # no broadcast build may carry a corpus-grain array column (the raw
    # embedding e, the quantized qe, a raw subvector sub, or micro-unit
    # me) — the codebook (csub), fine-cell (fe), coarse (ce) and
    # probe-grain (psub, pqe) arrays are the bounded frames allowed to
    # broadcast.  This is what catches an all-pairs degeneration: a
    # corpus-side build would drag one of the banned columns in.
    # vec_id is in the ban list because EVERY corpus-grain frame in this
    # chain carries it (codes/cands/adc/short keep vec_id; the legitimate
    # broadcasts all rename it away: probe_id, code_id, fid, cid) — this
    # catches a corpus-side build even after column pruning drops the
    # array columns
    banned = {"e", "qe", "sub", "me", "vec_id"}
    for cols in broadcast_build_columns(df):
        bases = {c.split("#")[0].strip() for c in cols}
        assert not (bases & banned), cols
    specs = window_partition_specs(df)
    for spec in specs:
        assert spec, "global window in the IVFPQ plan"
        assert any("probe_id" in c or "vec_id" in c for c in spec), spec


def test_retention_plan_invariants(spark, sf_dir):
    """Kafka-semantics invariants of the retention plan: the active
    (newest) segment is never deleted, so n_deleted <= n_segments - 1;
    every segment is either deleted or retained (byte conservation); and
    deletion counts decompose (union >= each cause, <= their sum)."""
    from kafka_replicator_spark.queries import all_queries

    rows = all_queries()["r_retention_deletion_plan"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_deleted"] <= r["n_segments"] - 1
        assert max(r["n_deleted_size"], r["n_deleted_age"]) <= r["n_deleted"]
        assert r["n_deleted"] <= r["n_deleted_size"] + r["n_deleted_age"]
        assert r["bytes_deleted"] >= 0 and r["bytes_retained"] > 0


def test_redrive_model_invariants(spark, sf_dir):
    """Conservation laws of the SQS redrive model: delivered + DLQ
    partitions the stream; total receives = messages + redeliveries; the
    only possible per-message delays are the exact backoff schedule's
    partial sums (0, b0, b0+b1) — generated by the REAL
    core.retry.backoff_ms, so a schedule edit shows up here."""
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.queries.replicator import _redrive_delay_terms

    terms = _redrive_delay_terms()
    allowed_max = sum(terms)
    rows = all_queries()["r_sqs_redrive_model"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_delivered"] + r["n_dlq"] == r["n_messages"]
        assert r["total_receives"] >= r["n_messages"]
        assert 0 <= r["max_delay_ms"] <= allowed_max
        # the cap literals: 200 then min(400, 300) = 300 — the cap branch
        # is genuinely exercised by the schedule constants
        assert terms == [200, 300]


def test_latency_budget_quartile_order(spark, sf_dir):
    """seg-wait quartiles are ordered and non-negative, and n_unckpt is
    verified against an INDEPENDENT recomputation: exactly the messages in
    segments strictly after the last checkpointed segment (seq % 5 == 4)
    of their partition are replay-exposed.  (No 'ckpt dominates seg'
    assertion: with non-monotone event times a later checkpoint segment
    can close EARLIER than this message's own segment — the condition
    r_ts_monotonicity audits — so dominance is not a theorem.)"""
    from pyspark.sql import functions as F

    from kafka_replicator_spark.operators.egress import assign_segments_by_count
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.queries.replicator import (
        _LATENCY_CKPT_EVERY,
        SEG_MAX_MESSAGES,
    )
    from kafka_replicator_spark.sources.messages import events_as_messages

    rows = all_queries()["r_e2e_latency_budget"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["seg_wait_p25_x4"] <= r["seg_wait_p50_x4"] <= r["seg_wait_p75_x4"]
        assert r["seg_wait_p75_x4"] <= r["seg_wait_max"] * 4

    k = _LATENCY_CKPT_EVERY
    msgs = assign_segments_by_count(
        events_as_messages(spark, sf_dir), SEG_MAX_MESSAGES
    )
    last_ck = msgs.filter(F.col("segment_seq") % k == k - 1).groupBy(
        "topic", "partition_id"
    ).agg(F.max("segment_seq").alias("lck"))
    expected = {
        (e["topic"], e["partition_id"]): e["n"]
        for e in msgs.join(last_ck, ["topic", "partition_id"], "left")
        .filter(F.col("lck").isNull() | (F.col("segment_seq") > F.col("lck")))
        .groupBy("topic", "partition_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_unckpt"] == expected.get((r["topic"], r["partition_id"]), 0), r
