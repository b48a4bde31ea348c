"""Per-query noop-sink profiler for the optimization rounds.

Times registered queries via ``df.write.format("noop")`` (guide §1.4 — the
honest timed action) and dumps ``explain("formatted")`` so plan shapes can
be diffed before/after a change.

Usage:
    python tools/profile_queries.py --names a,b,c [--reps 2]
        [--sf-dir /root/testdata/sf0.1] [--plans-dir plans/r13]
        [--suffix before]

Prints one line per query: name, per-rep seconds, min.  Plans land in
``<plans-dir>/<name>_<suffix>.txt``.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--names", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.session import get_spark

    spark = get_spark(app_name="krs_profile")
    qs = all_queries()
    names = [n for n in args.names.split(",") if n]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown: {unknown}")
        return 1

    # warm parquet footers + JVM once, like bench.py
    spark.read.parquet(f"{args.sf_dir.rstrip('/')}/region.parquet").count()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for name in names:
        q = qs[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.perf_counter()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            release_cached()
        spark.sparkContext.setJobDescription(None)
        if args.plans_dir:
            df = q.fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            release_cached()
        reps = " ".join(f"{t:.3f}" for t in times)
        print(f"{name}: [{reps}] min={min(times):.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
