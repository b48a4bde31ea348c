"""Print the formatted physical plan of a registered query plus the plan
properties the repo treats as performance contracts (exchange count,
broadcast joins, whole-stage codegen, pushed filters).

Usage:
    python tools/explain.py <query_name> [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from kafka_replicator_spark.plans.explain import (
        count_exchanges,
        has_broadcast_join,
        has_wholestage_codegen,
        physical_plan,
        pushed_filters,
    )
    from kafka_replicator_spark.queries import all_queries
    from kafka_replicator_spark.session import get_spark

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; {len(qs)} registered")
        return 1
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    df = qs[args.name].fn(spark, args.sf_dir)
    print(physical_plan(df))
    print(f"--- exchanges: {count_exchanges(df)}")
    print(f"--- broadcast join: {has_broadcast_join(df)}")
    print(f"--- whole-stage codegen: {has_wholestage_codegen(df)}")
    print(f"--- pushed filters: {pushed_filters(df)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
