#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each timing covers the full query execution (plan + run + collect-count);
the Spark session warmup is excluded (paid once, amortized in production).
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kafka_replicator_spark import get_spark
    from kafka_replicator_spark.queries import all_queries

    spark = get_spark(app_name="kafka_replicator_spark_bench")
    registry = all_queries()

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
