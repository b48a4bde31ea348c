#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

PROTOCOL (since round 13, completing the VERDICT r11 #2 / r12 #1
migration): the headline section materializes every query via the noop
sink (`df.write.format("noop")`) — count() lets Catalyst prune
row-preserving tails (a LEFT JOIN against a unique-key aggregate and
everything feeding it is ELIMINATED under count; the r11 measurement
correction), so noop is the honest protocol.  The headline comparable is
noop-to-noop against the committed bench_prev_noop.json snapshot.  A
one-pass count section remains as a courtesy column for one round
(count_queries; its comparable is retired).  The FULL output JSON is also
written to $SPARK_GRAFT_BENCH_OUT (default bench_last.json beside this
file) so per-line history never depends on the driver's 2000-char tail —
commit it as BENCH_LOCAL_r{N}.json at each clean run.

The lifecycle trio (segment_lifecycle / _skewed / _latelost) is wall-clock
end-to-end work (writes + replay), immune to count-pruning; it is timed as
before and the uniform lifecycle stays in the headline total.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # the engine's center of gravity: segment plan + merge + metadata ops
    "r_t1_segment_plan",
    "r_m1_merge_dedup",
    "r_a8_bounded_take",
    "r_t9_resume_replay",
    "r_a6_checkpoint_lww",
    # relational surface
    "a_q1_pricing_summary",
    "a_q3_top_revenue_orders",
    "a_q5_region_revenue",
    "a_sessionization",
    "a_topk_per_group",
    # pipeline surface
    "p_dedup_exact",
    "p_minhash_signatures",
    "p_lsh_candidate_pairs",
    "p_simhash",
    "p_cosine_topk",
    "p_text_stats",
    "p_fingerprint",
    # curation surface
    "p_quality_rules",
    "p_dup_clusters",
    # round-3 additions: LM scoring, prefix dedup, quantized ANN, mixing
    "p_unigram_logprob",
    "p_prefix_dedup",
    "p_quantized_topk",
    "p_corpus_mix",
    # round-3 late additions: sketches, multimodal retrieval, bloom semi join
    "p_hll_distinct",
    "p_cms_heavy_hitters",
    "p_media_embed_topk",
    "a_bloom_semi_join",
    # round-4 additions: corpus curation stats, PQ tier, skew surface
    "p_boiler_ngrams",
    "p_dsir_weights",
    "p_bpe_merges",
    "p_pq_topk",
    "p_semantic_dedup",
    "a_salted_agg",
    # round-5 additions: distributional text stats
    "p_doc_repetition",
    "p_doc_entropy",
    "p_curriculum_buckets",
    "p_bigram_logprob",
    "p_quality_classifier",
    "p_temperature_mix",
    # this round's additions: profiling, frontier, graph
    "p_perplexity_profile",
    "p_knn_graph",
    "p_minhash_containment",
    "a_skyline_parts",
    # staged-family representatives: audits, time series, LM, sketch
    "p_column_profile",
    "a_autocorr_daily",
    "p_kneser_ney",
    "p_histogram_quantiles",
    # round-6 additions: retrieval LM, iterative curation/graph selection
    "p_query_likelihood",
    "p_submodular_coverage",
    "p_mmr_diversify",
    "p_kcore_peel",
    # round-7 additions: streaming-policy parity, interval sweep-line,
    # LM smoothing triad completion, candidate-graph audit
    "r_t5_first_delay",
    "a_peak_open_orders",
    "p_jm_smoothing",
    "p_lsh_pair_transitivity",
    # round-8 additions: composed curation chain, scale-fixed SemDeDup
    "p_e2e_curation_funnel",
    "p_semantic_dedup_2level",
    # round-9 additions: sqrt-scaled coarse factor (the 100x winner)
    "p_semantic_dedup_auto",
    # round-10 additions: exact substring-level dedup (Lee et al. cut)
    "p_substring_dedup",
    "p_ivf_pq_rerank",
    # round-11 addition: trained fixed-K coarse codebook (the linear
    # assignment — 2.57x wall at 100x data vs the stride rule's 16.6x)
    "p_ivf_pq_rerank_trained",
    # round-12 additions (VERDICT r11 #5): the bucketed SemDeDup scan and
    # its auto-planes successor get per-round regression lines
    "p_semantic_dedup_bucketed",
    "p_semantic_dedup_bucketed_auto",
    # the fully linear flavor (trained fixed-K assignment + auto-planes)
    "p_semantic_dedup_bucketed_trained",
    # round-13 additions: the persisted-model lifecycle (train → save →
    # load → assign → drift gate) and the serve-path staleness audit
    "p_model_retrain_decision",
    "p_stale_model_recall",
]


def segment_lifecycle_bench(
    spark, n_msgs: int = 2_000_000, n_partitions: int = 8, split: str = "uniform"
) -> tuple[float, int]:
    """The engine's actual job end-to-end: message stream → greedy rollover
    → segment files → compaction merge → ordered replay.

    Uses a generated dense stream (~64 B payloads, ``n_partitions`` Kafka
    partitions) so fixed job overheads amortize and messages/sec is a real
    throughput figure against the reference's 100 MiB / 5 min single-node
    envelope (BASELINE.md §1).  The testdata events table is only 100k rows
    at sf0.1 — too small to measure throughput.

    ``split="hot"`` sends 90% of messages to partition 0 (offsets stay dense
    per partition) — the hot-partition stress case.  The engine's skew
    controls are structural: egress parallelism is per *segment*, not per
    partition, so the hot partition's writes still fan out; the compaction
    planner's bounded take caps any single merge task's input.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_replicator_spark.operators.compaction import compact
    from kafka_replicator_spark.operators.egress import assign_segments_greedy, write_segments
    from kafka_replicator_spark.sources.segments import list_segments, read_segment_files

    if split == "uniform":
        partition = (F.col("id") % n_partitions).cast("int")
        offset = (F.col("id") / n_partitions).cast("long")
    elif split == "hot":
        # 9 of every 10 ids → partition 0; the rest round-robin the others.
        # Offsets are dense per partition by construction.
        k = F.expr("id div 10")
        cold = n_partitions - 1
        partition = (
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise((k % cold + 1))
            .cast("int")
        )
        offset = (
            F.when(F.col("id") % 10 < 9, k * 9 + F.col("id") % 10)
            .otherwise(F.expr(f"(id div 10) div {cold}"))
            .cast("long")
        )
    else:
        raise ValueError(f"unknown split {split!r}")

    msgs = (
        spark.range(n_msgs)
        .select(
            F.lit("bench-topic").alias("topic"),
            partition.alias("partition_id"),
            offset.alias("msg_offset"),
            F.col("id").cast("string").cast("binary").alias("msg_key"),
            F.concat(F.lit("payload-payload-payload-payload-payload-payload-"), F.col("id"))
            .cast("binary")
            .alias("payload"),
            (F.lit(1_700_000_000_000_000_000) + F.col("id")).alias("ts_ns"),
        )
        .withColumn("msg_size", (F.lit(16) + F.length("msg_key") + F.length("payload")).cast("long"))
        .cache()
    )
    n = msgs.count()  # materialize outside the timed window
    root = tempfile.mkdtemp(prefix="krs_bench_")
    t0 = time.perf_counter()
    tagged = assign_segments_greedy(msgs, max_bytes=16 << 20, max_messages=250_000)
    write_segments(tagged, root=root, region="bench", level=0).collect()
    # chunked merge output: one writer task per 250k-message output segment,
    # so a hot partition's merge parallelizes instead of serializing into a
    # single task (reference is strictly N→1; see merge_segments docstring)
    compact(
        spark, root, region="bench", min_count=2, min_bytes=1,
        max_output_messages=250_000,
    ).collect()
    # replay everything still standing (compacted + any below-threshold
    # level-0 stragglers); inputs were deleted, so no overlaps remain
    paths = [r["path"] for r in list_segments(spark, root).collect()]
    replayed = read_segment_files(spark, paths, dedup_overlaps=False).count()
    dt = time.perf_counter() - t0
    assert replayed == n, f"lifecycle lost rows: {replayed} != {n}"
    msgs.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return dt, n


def segment_lifecycle_latelost_bench(
    spark, n_msgs: int = 80_000, n_partitions: int = 4, seg_messages: int = 10_000
) -> tuple[float, int, int]:
    """Wall-clock T5/T6/T7 escalation end-to-end: egress a dense stream to
    segments, destroy the first segment of partition 0 (an offset gap at
    the delivery frontier), then drive the ingress stream through hold-back
    (late) → retry (still held) → lost-range skip under an injectable clock
    crossing ``lost_segment_timeout``.  Returns
    (seconds, messages_delivered, messages_lost); lost MUST be > 0 — the
    escalation path itself is what this line measures, not just throughput.

    This is a BEHAVIORAL line: the cost is dominated by three sequential
    availableNow streaming-query startups (fresh checkpoints drive the
    re-delivery), not by data volume, so the corpus is sized to the minimum
    that still exercises the escalation (2 segments per partition) and the
    shuffle width is narrowed for the scenario's tiny frames.
    """
    import os
    import shutil
    import tempfile
    from datetime import timedelta

    from pyspark.sql import functions as F

    from kafka_replicator_spark.operators.egress import (
        assign_segments_greedy,
        write_segments,
    )
    from kafka_replicator_spark.sources.segments import list_segments
    from kafka_replicator_spark.streaming.ingress_stream import (
        IngressState,
        run_ingress_stream,
    )

    msgs = (
        spark.range(n_msgs)
        .select(
            F.lit("bench-topic").alias("topic"),
            (F.col("id") % n_partitions).cast("int").alias("partition_id"),
            (F.col("id") / n_partitions).cast("long").alias("msg_offset"),
            F.col("id").cast("string").cast("binary").alias("msg_key"),
            F.concat(
                F.lit("payload-payload-payload-payload-payload-payload-"), F.col("id")
            )
            .cast("binary")
            .alias("payload"),
            (F.lit(1_700_000_000_000_000_000) + F.col("id")).alias("ts_ns"),
        )
        .withColumn(
            "msg_size", (F.lit(16) + F.length("msg_key") + F.length("payload")).cast("long")
        )
        .cache()
    )
    n = msgs.count()  # materialize outside the timed window
    root = tempfile.mkdtemp(prefix="krs_latelost_")
    work = tempfile.mkdtemp(prefix="krs_latelost_w_")
    seg_root = os.path.join(root, "bench")  # write_segments roots at region
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        t0 = time.perf_counter()
        # ≥2 segments per partition required: the gap is only observable
        # when a later segment exists above the destroyed one
        assert n_msgs // n_partitions >= 2 * seg_messages, "need ≥2 segments/partition"
        tagged = assign_segments_greedy(msgs, max_bytes=64 << 20, max_messages=seg_messages)
        write_segments(tagged, root=root, region="bench", level=0).collect()
        segs = list_segments(spark, seg_root).collect()
        first_p0 = min(
            (r for r in segs if r["partition_id"] == 0),
            key=lambda r: r["start_offset"],
        )
        os.remove(first_p0["path"])
        gap = first_p0["end_offset"] - first_p0["start_offset"] + 1
        sink = os.path.join(work, "sink")
        state_path = os.path.join(work, "state.json")
        fake_now = [1_000_000.0]
        timeout = timedelta(hours=24)
        common = dict(
            max_gap_retries=0,
            lost_segment_timeout=timeout,
            clock=lambda: fake_now[0],
        )
        # batch 1: gap fresh → partition 0 held back (late), others deliver
        run_ingress_stream(
            spark, seg_root, sink, os.path.join(work, "cp_a"), state_path, **common
        )
        # batch 2: retry inside the timeout → still held, nothing lost yet
        fake_now[0] += 60.0
        run_ingress_stream(
            spark, seg_root, sink, os.path.join(work, "cp_b"), state_path, **common
        )
        st = IngressState.load(state_path)
        assert st.messages_lost == 0, f"lost too early: {st.messages_lost}"
        # batch 3: clock crosses the timeout → lost-range skip, rest delivers
        fake_now[0] += timeout.total_seconds() + 1.0
        run_ingress_stream(
            spark, seg_root, sink, os.path.join(work, "cp_c"), state_path, **common
        )
        dt = time.perf_counter() - t0
        st = IngressState.load(state_path)
        delivered = spark.read.parquet(sink).count()
        assert st.messages_lost == gap > 0, f"lost {st.messages_lost} != gap {gap}"
        assert delivered == n - gap, f"delivered {delivered} != {n - gap}"
        return dt, delivered, st.messages_lost
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        msgs.unpersist()
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_replicator_spark import get_spark
    from kafka_replicator_spark.queries import all_queries

    spark = get_spark(app_name="kafka_replicator_spark_bench")
    from kafka_replicator_spark.cacheutil import release_cached

    registry = all_queries()

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()

    # the previous round's snapshot: per-line times steer the contention
    # retry below, and the same loaded dict feeds the comparable-ratio
    # section at the end (ONE load).  The retry thresholds are only
    # meaningful like-for-like, so they apply the same sf guard as the
    # ratio (a sf0.01 quick pass must neither retry everything nor never).
    def _sf_token(v):
        if isinstance(v, (int, float)):
            return f"sf{v:g}"
        # Numeric-looking strings ("0.1") must normalize like numbers,
        # not like paths (ADVICE r06).
        try:
            return f"sf{float(v):g}"
        except (TypeError, ValueError):
            return os.path.basename(os.path.normpath(str(v)))

    # previous-round noop snapshot: per-line times steer the contention
    # retry and feed the headline noop-to-noop comparable (ONE load).
    nsnap: dict = {}
    prev_noop: dict[str, float] = {}
    noop_prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_prev_noop.json"
    )
    if os.path.exists(noop_prev_path):
        try:
            nsnap = json.load(open(noop_prev_path))
            if nsnap.get("sf") is None or _sf_token(nsnap["sf"]) == _sf_token(sf_dir):
                prev_noop = nsnap.get("noop_queries", {})
        except Exception:
            nsnap = {}

    def run_pass(tag: str) -> tuple[dict[str, float], dict[str, str]]:
        """One full end-to-end NOOP pass over the headline set + lifecycle."""
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in HEADLINE:
            q = registry[name]
            # single timed noop materialization per pass; if it sits >1.15x
            # of last round's recorded line, take ONE immediate retry —
            # external machine contention spikes individual runs 2-3x
            # (BASELINE.md) and the cross-pass min supplies the rest.
            best = None
            try:
                for run in range(2):
                    if run == 1 and not (
                        name in prev_noop and best > prev_noop[name] * 1.15
                    ):
                        break
                    t0 = time.perf_counter()
                    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as ex:  # isolate: one broken query must never zero
                errors[name] = f"{type(ex).__name__}: {ex}"[:300]
                print(f"# [{tag}] {name}: ERROR {errors[name]}", file=sys.stderr)
                continue
            timings[name] = round(best, 3)
            print(f"# [{tag}] {name}: {best:.3f}s", file=sys.stderr)
            release_cached()  # drop operator-internal pinned frames between queries

        # best-of-two per pass (×2 passes = four samples; VERDICT r08 #5
        # made the lifecycle trio best-of-3 — the spaced second pass now
        # supplies the decorrelated samples instead of a third back-to-back run)
        life_sec = None
        try:
            life_sec, life_msgs = segment_lifecycle_bench(spark)
            life_sec = min(life_sec, segment_lifecycle_bench(spark)[0])
            timings["segment_lifecycle"] = round(life_sec, 3)
            print(
                f"# [{tag}] segment_lifecycle: {life_sec:.3f}s "
                f"({life_msgs} msgs, {life_msgs / life_sec:,.0f} msg/s)",
                file=sys.stderr,
            )
        except Exception as ex:
            errors["segment_lifecycle"] = f"{type(ex).__name__}: {ex}"[:300]
            print(f"# [{tag}] segment_lifecycle: ERROR {errors['segment_lifecycle']}", file=sys.stderr)

        # skew stress: same pipeline, 90% of messages on one partition — must
        # stay within ~1.5× of the uniform split (per-segment write parallelism
        # + chunked merge are the structural skew controls).  Reported per-line
        # but excluded from the headline total (the total is the
        # round-over-round comparable set: headline queries + uniform lifecycle)
        try:
            skew_sec, _ = segment_lifecycle_bench(spark, split="hot")
            skew_sec = min(skew_sec, segment_lifecycle_bench(spark, split="hot")[0])
            timings["segment_lifecycle_skewed"] = round(skew_sec, 3)
            ratio = f" ({skew_sec / life_sec:.2f}x uniform)" if life_sec else ""
            print(f"# [{tag}] segment_lifecycle_skewed: {skew_sec:.3f}s{ratio}", file=sys.stderr)
        except Exception as ex:
            errors["segment_lifecycle_skewed"] = f"{type(ex).__name__}: {ex}"[:300]
            print(
                f"# [{tag}] segment_lifecycle_skewed: ERROR {errors['segment_lifecycle_skewed']}",
                file=sys.stderr,
            )

        # wall-clock late→lost escalation (T5/T6/T7) at bench volume; also
        # excluded from the headline total
        try:
            ll_sec, ll_delivered, ll_lost = segment_lifecycle_latelost_bench(spark)
            timings["segment_lifecycle_latelost"] = round(ll_sec, 3)
            print(
                f"# [{tag}] segment_lifecycle_latelost: {ll_sec:.3f}s "
                f"({ll_delivered} delivered, {ll_lost} lost)",
                file=sys.stderr,
            )
        except Exception as ex:
            errors["segment_lifecycle_latelost"] = f"{type(ex).__name__}: {ex}"[:300]
            print(
                f"# [{tag}] segment_lifecycle_latelost: ERROR {errors['segment_lifecycle_latelost']}",
                file=sys.stderr,
            )
        return timings, errors

    # SPACED end-to-end passes, per-line min across passes (VERDICT r09
    # #2): machine-contention windows here run minutes long, so a within-pass
    # retry lands inside the same window and learns nothing — the r09
    # artifact's five spiked lines all survived 2-3 back-to-back runs.  A
    # full second pass ~1 bench-length later (plus a configurable gap)
    # decorrelates; a line must then be slow in EVERY window to record slow.
    # Default raised 2 → 3 in r11: against a baseline that is itself a
    # per-line min envelope, two passes on a ~5%-slower machine state read
    # 1.02-1.11x while three read 1.004x — the third window is what
    # reaches the noise floor (measured session data in CLAUDE.md r11).
    n_passes = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
    pass_gap = float(os.environ.get("SPARK_GRAFT_PASS_GAP", "30"))
    timings, errors = run_pass("pass1")
    for p in range(2, n_passes + 1):
        time.sleep(pass_gap)
        t2, e2 = run_pass(f"pass{p}")
        for k, v in t2.items():
            timings[k] = min(timings[k], v) if k in timings else v
            errors.pop(k, None)  # timed in a later pass ⇒ not an error
        # a line erroring in a later pass but timed earlier keeps its time;
        # only lines that NEVER timed stay in errors
        for k, msg in e2.items():
            if k not in timings:
                errors[k] = msg

    # COUNT courtesy section (retiring — VERDICT r12 #1): one single pass of
    # the legacy fn(...).count() timings for per-line history continuity.
    # No comparable is computed (the count comparable is retired; the
    # headline comparable above is noop-to-noop).  Drop this section in r14.
    count_passes = int(os.environ.get("SPARK_GRAFT_COUNT_PASSES", "1"))
    count_timings: dict[str, float] = {}
    count_errors: dict[str, str] = {}
    for _ in range(count_passes):
        for name in HEADLINE:
            q = registry[name]
            try:
                t0 = time.perf_counter()
                n = q.fn(spark, sf_dir).count()
                dt = round(time.perf_counter() - t0, 3)
                count_timings[name] = min(count_timings.get(name, dt), dt)
                count_errors.pop(name, None)
                print(f"# [count] {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
            except Exception as ex:
                if name not in count_timings:
                    count_errors[name] = f"{type(ex).__name__}: {ex}"[:300]
                print(f"# [count] {name}: ERROR {type(ex).__name__}", file=sys.stderr)
            release_cached()

    count_section = {}
    if count_timings or count_errors:
        count_section = {
            "count_total": round(sum(count_timings.values()), 3),
            "count_timed": len(count_timings),
            "count_queries": count_timings,
            "count_errors": count_errors,
        }

    total = sum(v for k, v in timings.items() if k in HEADLINE)
    total += timings.get("segment_lifecycle", 0.0)

    # HEADLINE comparable: noop-to-noop against the committed prior-round
    # snapshot (bench_prev_noop.json — per-line noop times under the
    # "noop_queries" key, refreshed each round from the committed
    # BENCH_LOCAL artifact, never the driver tail).  Skew and latelost
    # lines are excluded, same policy as the headline total.  Only compare
    # like-for-like scale factors: a quick sf0.01 pass must not emit a
    # bogus cross-scale ratio (_sf_token normalizes both sides).
    comparable = {}
    if prev_noop:
        common = [k for k in timings if k in prev_noop and k in HEADLINE]
        prev_sum = sum(prev_noop[k] for k in common)
        now_sum = sum(timings[k] for k in common)
        comparable = {
            "comparable_round": nsnap.get("round"),
            "noop_comparable_n": len(common),
            "noop_comparable_prev_sec": round(prev_sum, 3),
            "noop_comparable_now_sec": round(now_sum, 3),
            "noop_comparable_ratio": round(now_sum / prev_sum, 3) if prev_sum else None,
        }
        if prev_sum:
            print(
                f"# noop comparable vs {nsnap.get('round')}: {now_sum:.2f}s / "
                f"{prev_sum:.2f}s = {now_sum / prev_sum:.2f}x over "
                f"{len(common)} shared lines",
                file=sys.stderr,
            )

    # key order matters downstream: the driver records only a 2000-char
    # TAIL of this line, so the headline comparable + error dicts + sf sit
    # LAST (always preserved) and the bulky courtesy count dict sits first
    # (sacrificed on truncation — its history lives in the committed
    # BENCH_LOCAL artifact, which holds the FULL line).
    out = {
        "metric": "headline_queries_total_runtime",
        "protocol": "noop",
        "value": round(total, 3),
        "unit": "sec",
        **count_section,
        # how many queries the total actually covers — a shrunken
        # comparable set (errors) must be visible, not silent
        "timed": len([k for k in timings if k in HEADLINE])
        + (1 if "segment_lifecycle" in timings else 0),
        "noop_queries": timings,
        "errors": errors,
        **comparable,
        "sf": sf_dir,
    }
    line = json.dumps(out)
    # full-line artifact: per-line history must never depend on the
    # driver's 2000-char tail again (VERDICT r12 #1) — commit this file as
    # BENCH_LOCAL_r{N}.json at each clean run.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except Exception as ex:
        print(f"# bench_last write failed: {ex}", file=sys.stderr)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
