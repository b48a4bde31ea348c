"""Data-quality audit query registrations (functions/profiling.py):
completeness/distinctness profiling, referential integrity, candidate-key
uniqueness, Benford leading-digit distribution.

Reference parity: the reference engine's integrity surface is segment-grain
(pkg/segments sanity checks — covered by r_f6_sanity_offsets and the
compaction gap check); this family is the column-grain audit suite a
training-data pipeline runs before trusting a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import profiling
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: events columns profiled by p_column_profile (ts excluded: Spark sees the
#: normalized epoch-nanos LONG, DuckDB the raw TIMESTAMP — distinct counts
#: agree but keeping the audit to identically-typed columns is cheaper than
#: documenting the exception)
_EVENT_COLS = ["event_id", "user_id", "event_type", "value", "props"]


@register(
    "p_column_profile",
    profiling.column_profile_sql("events", _EVENT_COLS),
    tags=("quality", "audit"),
    doc="Deequ-style completeness + distinctness profile of the events "
    "table: one aggregation pass computes every column's null and distinct "
    "counts, unpivoted to column grain — column-count output rows at any "
    "corpus size; shares are exact integer ppm",
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return profiling.column_profile(ev, "events", _EVENT_COLS)


@register(
    "p_fk_integrity",
    profiling.fk_orphans_sql(),
    tags=("quality", "audit"),
    doc="referential-integrity audit over the corpus FK graph (5 "
    "relationships): child keys collapse to distinct values before the "
    "anti-join probes the parent key set, so the shuffle moves key sets, "
    "never fact rows; one output row per relationship",
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("orders", "customer", "lineitem", "part", "supplier", "nation")
    }
    return profiling.fk_orphans(tables)


@register(
    "p_uniqueness_audit",
    profiling.uniqueness_audit_sql(),
    tags=("quality", "audit"),
    doc="candidate-key uniqueness audit (5 declared keys incl. the "
    "composite lineitem key): key-grain group sizes re-aggregated to rows/"
    "keys/rows-in-dup-groups — two partial-agg passes per table, 5 output "
    "rows",
)
def q_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("events", "documents", "embeddings", "orders", "lineitem")
    }
    return profiling.uniqueness_audit(tables)


@register(
    "a_benford_totalprice",
    profiling.benford_digits_sql(),
    tags=("analytics", "audit"),
    doc="Benford's-law leading-digit audit of order totals: exact integer "
    "digit extraction (cents as BIGINT, first decimal character — never "
    "log10 of a double), Python-literal expected shares on both engines; "
    "one aggregation, 9 output rows",
)
def q_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.benford_digits(load_table(spark, sf_dir, "orders"))
