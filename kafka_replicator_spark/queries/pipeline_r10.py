"""Round-10 pipeline queries.

First entries: exact substring-level dedup (VERDICT r09 #5) — the Lee et
al. 2022 ExactSubstr CUT operator (window-hash flavour) over the shared
span core in functions/dedup, plus its composition with the (newly
sharded) sequence packer: the pack boundaries land on POST-cut token
counts, which no single-stage query exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.dedup import substring_cut, substring_cut_sql
from kafka_replicator_spark.functions.packing import (
    DEFAULT_PACK_BUDGET,
    pack_sequences,
    pack_sequences_sql,
)
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

_SUBSTR_W = 8


@register(
    "p_substring_dedup",
    f"""
SELECT doc_id, source, n_tokens, cut_tokens, kept_tokens,
       md5(clean_text) AS clean_hash
FROM ({substring_cut_sql(_SUBSTR_W)})
""",
    tags=("pipeline", "dedup"),
    doc="exact substring-level dedup (Lee et al. ExactSubstr, window-hash "
    "flavour): every token covered by a corpus-wide repeated "
    f"{_SUBSTR_W}-token window is cut from ALL occurrences; per-doc "
    "accounting plus md5 of the rebuilt cleaned text pins the cut itself, "
    "not just the counts (functions/dedup.substring_cut; span core shared "
    "with p_dup_span_extents)",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = substring_cut(load_table(spark, sf_dir, "documents"), w=_SUBSTR_W)
    return cut.select(
        "doc_id",
        "source",
        "n_tokens",
        "cut_tokens",
        "kept_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )


#: the cleaned corpus as a relation for the pack oracle — nested WITH inside
#: a FROM-subquery is fine in DuckDB (CLAUDE.md r08 note)
_CLEAN_DOCS_REL = (
    f"(SELECT doc_id, source, clean_text AS text FROM ({substring_cut_sql(_SUBSTR_W)}))"
)


@register(
    "p_e2e_substring_pack",
    f"""
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
       CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000)
            // (count(DISTINCT pack_id) * {DEFAULT_PACK_BUDGET}) AS BIGINT)
           AS fill_ppm
FROM ({pack_sequences_sql(DEFAULT_PACK_BUDGET, rel=_CLEAN_DOCS_REL)})
GROUP BY source
ORDER BY source
""",
    tags=("pipeline", "compose"),
    doc="end-to-end substring-cut -> pack chain: the corpus with repeated "
    "spans excised, repacked into fixed token budgets by the sharded "
    "(source, __pid) boundary walk — pack boundaries land on POST-cut "
    "token counts (a fully-cut doc still packs as its 1-token empty "
    "string, same as both engines' split('') semantics); per-source "
    "manifest with exact fill ppm (DECIMAL-lifted numerator)",
)
def q_e2e_substring_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = substring_cut(load_table(spark, sf_dir, "documents"), w=_SUBSTR_W)
    pack = pack_sequences(
        cut.select("doc_id", "source", F.col("clean_text").alias("text")),
        budget=DEFAULT_PACK_BUDGET,
    )
    return (
        pack.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("pack_tokens").alias("max_pack_tokens"),
        )
        .withColumn(
            # ppm-numerator rule: lift to DECIMAL(38,0)/HUGEINT before ×1e6
            "fill_ppm",
            F.expr(
                f"CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000)"
                f" div (n_packs * {DEFAULT_PACK_BUDGET}) AS BIGINT)"
            ),
        )
        .orderBy("source")
    )
