"""Local stand-in for the driver's correctness sweep.

Runs registry queries against the DuckDB oracle at a given scale factor with
an exact (float_tol=0) compare — the driver hashes values bit-exactly, so
anything that passes here should hash-match in CORRECTNESS_r{N}.json.

Usage:
    python tools/sweep.py [--sf-dir /root/testdata/sf0.01] [--start 0]
                          [--count 50] [--names a,b,c] [--tol 0]

Prints one line per query (PASS/FAIL/ERR) and a summary; exit code 1 on any
failure.
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=0, help="0 = all from start")
    ap.add_argument("--names", default="", help="comma-separated subset")
    ap.add_argument("--tol", type=float, default=0.0)
    args = ap.parse_args()

    from kafka_replicator_spark.cacheutil import release_cached
    from kafka_replicator_spark.session import get_spark
    from kafka_replicator_spark.queries import all_queries
    from tests.oracle_utils import duck_connection, assert_frames_match

    spark = get_spark()
    qs = all_queries()
    names = list(qs)
    if args.names:
        names = [n for n in args.names.split(",") if n]
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"unknown query names: {unknown}")
            return 1
    else:
        end = args.start + args.count if args.count else len(names)
        names = names[args.start : end]

    con = duck_connection(args.sf_dir)
    failures: list[str] = []
    for i, name in enumerate(names):
        q = qs[name]
        t0 = time.time()
        try:
            got = q.fn(spark, args.sf_dir).toPandas()
            if q.oracle is None:
                print(f"[{i:3d}] ROWS-ONLY {name}: {len(got)} rows "
                      f"({time.time() - t0:.1f}s)", flush=True)
                continue
            exp = con.execute(q.oracle).fetchdf()
            assert_frames_match(got, exp, name, float_tol=args.tol)
            print(f"[{i:3d}] PASS {name}: {len(got)} rows "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except AssertionError as e:
            failures.append(name)
            print(f"[{i:3d}] FAIL {name}: {e}", flush=True)
        except Exception:
            failures.append(name)
            print(f"[{i:3d}] ERR  {name}:\n{traceback.format_exc()}", flush=True)
        finally:
            # long sweeps would otherwise accumulate every query's cached
            # frames in one session — release tracked frames AND the bare
            # .cache() calls some operators pin internally
            release_cached()
            spark.catalog.clearCache()

    print(f"\n{len(names) - len(failures)}/{len(names)} green"
          + (f"; failures: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
