"""Job-level profiler: runs a query's fn() + noop action with the Spark UI
enabled and attributes wall time to the individual Spark jobs (via the UI
REST API), splitting construction-time (driver-side eager collects inside
fn) from action-time.

Usage:
    python tools/profile_jobs.py --names a,b,c [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _jobs(app_id: str) -> list[dict]:
    url = f"http://localhost:4040/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--names", required=True)
    ap.add_argument("--warm", type=int, default=1, help="untimed warm reps first")
    args = ap.parse_args()

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.session import get_spark

    spark = get_spark(app_name="krs_profile_jobs", extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    qs = all_queries()
    names = [n for n in args.names.split(",") if n]

    spark.read.parquet(f"{args.sf_dir.rstrip('/')}/region.parquet").count()

    for name in names:
        q = qs[name]
        for _ in range(args.warm):
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            release_cached()
        before = {j["jobId"] for j in _jobs(app_id)}
        t0 = time.perf_counter()
        df = q.fn(spark, args.sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        release_cached()
        time.sleep(0.3)
        jobs = [j for j in _jobs(app_id) if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: construct={t1-t0:.3f}s action={t2-t1:.3f}s total={t2-t0:.3f}s jobs={len(jobs)}")
        for j in jobs:
            sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second duration from the stage metrics is not in this
            # endpoint; report task counts + coarse duration
            dur = time.mktime(comp) - time.mktime(sub)
            frac = j["submissionTime"][20:23], j["completionTime"][20:23]
            try:
                dur += (int(frac[1]) - int(frac[0])) / 1000.0
            except ValueError:
                pass
            print(
                f"  job {j['jobId']:4d} {dur:7.3f}s tasks={j['numTasks']:5d} "
                f"stages={len(j['stageIds'])} desc={str(j.get('description') or j.get('name'))[:90]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
