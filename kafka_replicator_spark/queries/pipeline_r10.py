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


# ----------------------------------------------- tokenizer fertility (BPE)

from kafka_replicator_spark.functions import corpus as _corpus  # noqa: E402


@register(
    "p_bpe_fertility",
    _corpus.bpe_fertility_sql(),
    tags=("pipeline", "tokenizer"),
    doc="per-source tokenizer fertility under the round-1 BPE merge table "
    "(functions/corpus.bpe_fertility): top-20 merge pairs applied greedily "
    "left-to-right per word — the non-overlap walk closes to ceil(run/2) "
    "per mergeable-position island, so both engines fold exact integers; "
    "subword tokens per word / per char in ppm, DECIMAL-lifted",
)
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus.bpe_fertility(load_table(spark, sf_dir, "documents"))


# ------------------------------------- quality-classifier calibration drift

from kafka_replicator_spark.functions.evalstats import ECE_BINS  # noqa: E402
from kafka_replicator_spark.functions.packing import (  # noqa: E402
    split_assign_col,
    split_assign_sql,
)
from kafka_replicator_spark.functions.scoring import (  # noqa: E402
    quality_classifier,
    quality_classifier_sql,
)

_ECE_WIDTH = 1_000_000 // ECE_BINS


@register(
    "p_quality_calibration_drift",
    f"""
WITH qc AS ({quality_classifier_sql()}),
scored AS (
  SELECT {split_assign_sql('d.doc_id')} AS split,
         (500 * q.score_milli + 500000 * q.n_tokens) // q.n_tokens AS p_ppm,
         CAST(d.lang = 'en' AS BIGINT) AS y
  FROM qc q JOIN documents d USING (doc_id)
),
binned AS (
  SELECT split, least(p_ppm // {_ECE_WIDTH}, {ECE_BINS - 1}) AS bin, p_ppm, y
  FROM scored
),
per_bin AS (
  SELECT split, bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b,
         sum(p_ppm) AS sum_p
  FROM binned GROUP BY split, bin
),
gaps AS (
  SELECT split, bin, n_b,
         abs(CAST(sum_p // n_b AS BIGINT)
             - CAST((CAST(pos_b AS HUGEINT) * 1000000) // n_b AS BIGINT)) AS gap_ppm
  FROM per_bin
)
SELECT split,
       CAST(sum(n_b) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST((SELECT sum(CAST(g2.n_b AS HUGEINT) * g2.gap_ppm) FROM gaps g2
             WHERE g2.split = gaps.split) // sum(n_b) AS BIGINT) AS ece_ppm,
       CAST(max(gap_ppm) AS BIGINT) AS max_gap_ppm
FROM gaps GROUP BY split
ORDER BY split
""",
    tags=("pipeline", "eval", "drift"),
    doc="calibration DRIFT of the quality classifier across the house "
    "train/val/test split (VERDICT r09 #7: ECE existed only corpus-wide): "
    "per-split expected calibration error in exact ppm — the reliability "
    "math of p_ece_calibration grouped by packing.split_assign_col, "
    "bin-count-weighted gap fold in HUGEINT/DECIMAL; a val/test ECE far "
    "from train's says the classifier gate is miscalibrated exactly where "
    "it is evaluated",
)
def q_quality_calibration_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qc = quality_classifier(docs)
    scored = qc.join(docs.select("doc_id", "lang"), "doc_id").select(
        split_assign_col("doc_id").alias("split"),
        F.expr("(500 * score_milli + 500000 * n_tokens) div n_tokens").alias("p_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    per_bin = (
        scored.select(
            "split",
            F.expr(f"least(p_ppm div {_ECE_WIDTH}, {ECE_BINS - 1})").cast("long").alias("bin"),
            "p_ppm",
            "y",
        )
        .groupBy("split", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("y").cast("long").alias("pos_b"),
            F.sum(F.col("p_ppm").cast("decimal(38,0)")).alias("sum_p"),
        )
    )
    gaps = per_bin.select(
        "split",
        "n_b",
        F.expr(
            "abs(CAST(sum_p div n_b AS BIGINT)"
            " - CAST((CAST(pos_b AS DECIMAL(38,0)) * 1000000) div n_b AS BIGINT))"
        ).alias("gap_ppm"),
    )
    return (
        gaps.groupBy("split")
        .agg(
            F.sum("n_b").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum(F.col("n_b").cast("decimal(38,0)") * F.col("gap_ppm")).alias("__wg"),
            F.max("gap_ppm").cast("long").alias("max_gap_ppm"),
        )
        .select(
            "split",
            "n_docs",
            "n_bins",
            F.expr("CAST(__wg div n_docs AS BIGINT)").alias("ece_ppm"),
            "max_gap_ppm",
        )
        .orderBy("split")
    )


# ------------------------------------------------- IVF + PQ with rerank

from kafka_replicator_spark.functions import similarity as _sim  # noqa: E402

_RERANK_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


@register(
    "p_ivf_pq_rerank",
    _sim.ivf_pq_rerank_sql(_RERANK_PROBES, k=5, shortlist=20),
    tags=("pipeline", "similarity"),
    doc="composed FAISS-style IVFPQ+refine ANN (Jegou et al. 2011 SV): IVF "
    "coarse-cell restriction -> PQ asymmetric-distance scan of the cell -> "
    "exact int8 rerank of the top-20 shortlist; every stage engine-exact "
    "(deterministic cell argmax, BIGINT ADC sums, exact integer L2 "
    "refine); the corpus never shuffles — codebooks/probe subvectors/"
    "probe cells broadcast (functions/similarity.ivf_pq_rerank)",
)
def q_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.ivf_pq_rerank(
        load_table(spark, sf_dir, "embeddings"), _RERANK_PROBES, k=5, shortlist=20
    )
