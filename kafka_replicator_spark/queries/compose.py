"""End-to-end pipeline compositions (round-8 staged, round-9 window).

VERDICT r07 #5: the registry covers every stage in isolation; these queries
oracle-check the *chains* — dedup → quality gate → token-budget mix →
sequence packing as single plans, where selection interactions live (the
mix's per-source budgets derive from the post-filter source weights, the
pack boundaries from the post-filter doc ranks — none of which any
single-stage query exercises).

Every stage reuses the exact operator the single-stage query registered
(functions/dedup, functions/curation.gopher_quality,
functions/packing.corpus_mix / pack_sequences), and every oracle reuses the
same SQL builders via their ``rel=`` parameter — the chain is composed, not
restated, on BOTH engines.

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has
no analytics layer; this is the beyond-parity LLM-pipeline surface
(SURVEY.md §2 "pipeline extensions").

Scale notes (100 TB):
  * the funnel is three source-grain aggregations over one shared cached
    survivor frame — each is a map-side-combined groupBy on ~5 keys;
  * the dedup stage is ONE shuffle on md5(text) (window row_number, same
    plan as p_curate_batch);
  * corpus_mix / pack_sequences keep their registered scale shapes (per
    source window + broadcast budgets / metadata-only pandas boundary walk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions.curation import gopher_quality, gopher_quality_sql
from kafka_replicator_spark.functions.dedup import lsh_candidate_pairs_sql
from kafka_replicator_spark.functions.hashing import portable_hash60_sql
from kafka_replicator_spark.functions.packing import (
    DEFAULT_PACK_BUDGET,
    corpus_mix,
    corpus_mix_sql,
    pack_sequences,
    pack_sequences_sql,
    split_assign_col,
    split_assign_sql,
)
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: exact-dedup survivor selection (min-id per content hash) — the chain head
_SURVIVORS_SQL = """SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS _rn
    FROM documents
  ) WHERE _rn = 1"""

#: the dedup→quality survivor chain as a reusable relation expression;
#: parenthesized so it can stand wherever a table name can (gopher/mix/pack
#: builders all take it via rel=).  survivors is AS MATERIALIZED — DuckDB
#: inlines multiply-referenced CTEs exponentially without it (CLAUDE.md)
_QUAL_DOCS_REL = f"""(
  WITH survivors AS MATERIALIZED ({_SURVIVORS_SQL})
  SELECT s.doc_id, s.source, s.text
  FROM survivors s
  JOIN ({gopher_quality_sql(rel='survivors')}) q USING (doc_id)
  WHERE q.passes = 1
)"""


def _qual_docs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared Spark chain: exact-dedup survivors → Gopher quality gate.

    One shuffle on md5(text) for the dedup window; the quality gate is pure
    per-row column expressions fused into the same stage.  The survivor
    frame is cached — the funnel aggregates it at three stages.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        docs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    survivors = track_cached(survivors)
    # r13 opt: the gate output is read three times (the mix stitch collect,
    # qual_agg, and the mix assembly tail) and Gopher's tokenize+sort
    # column work is the chain's per-row cost — cache it so it runs once.
    # grouped_rank_cumsum's output is physical-partitioning-independent by
    # contract, so the cache cannot change any value.
    qual = track_cached(
        gopher_quality(survivors, keep=("source", "text")).filter(F.col("passes") == 1)
    )
    return survivors, qual


@register(
    "p_e2e_curation_funnel",
    f"""
WITH survivors AS MATERIALIZED ({_SURVIVORS_SQL}),
quality AS MATERIALIZED (
  SELECT q.doc_id, q.word_count
  FROM ({gopher_quality_sql(rel='survivors')}) q WHERE q.passes = 1
),
qual_docs AS MATERIALIZED (
  SELECT s.doc_id, s.source, s.text FROM survivors s JOIN quality USING (doc_id)
),
mix AS ({corpus_mix_sql(rel='qual_docs')}),
raw_agg AS (
  SELECT source, count(*) AS n_raw,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_raw
  FROM documents GROUP BY source
),
dedup_agg AS (
  SELECT source, count(*) AS n_dedup,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_dedup
  FROM survivors GROUP BY source
),
qual_agg AS (
  SELECT s.source, count(*) AS n_quality,
         CAST(sum(q.word_count) AS BIGINT) AS tok_quality
  FROM survivors s JOIN quality q USING (doc_id) GROUP BY s.source
),
sel_agg AS (
  SELECT source, count(*) AS n_selected,
         CAST(sum(n_tokens) AS BIGINT) AS tok_selected
  FROM mix GROUP BY source
)
SELECT r.source, r.n_raw, r.tok_raw,
       coalesce(d.n_dedup, 0) AS n_dedup,
       coalesce(d.tok_dedup, 0) AS tok_dedup,
       coalesce(q.n_quality, 0) AS n_quality,
       coalesce(q.tok_quality, 0) AS tok_quality,
       coalesce(m.n_selected, 0) AS n_selected,
       coalesce(m.tok_selected, 0) AS tok_selected
FROM raw_agg r
LEFT JOIN dedup_agg d USING (source)
LEFT JOIN qual_agg q USING (source)
LEFT JOIN sel_agg m USING (source)
ORDER BY r.source
""",
    tags=("pipeline", "compose"),
    doc="end-to-end curation funnel: exact dedup → Gopher quality gate → "
    "token-budget corpus mix, with per-source survivor/token counts at "
    "every stage — the selection-interaction audit (the mix budgets derive "
    "from POST-filter source weights)",
)
def q_e2e_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = F.size(F.split(F.col("text"), " ")).cast("long")
    zero = F.lit(0).cast("long")
    survivors, qual = _qual_docs(spark, sf_dir)
    raw_agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"), F.sum(tok).alias("tok_raw")
    )
    dedup_agg = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_dedup"), F.sum(tok).alias("tok_dedup")
    )
    qual_agg = qual.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality"),
        F.sum("word_count").alias("tok_quality"),
    )
    mix = corpus_mix(qual.select("doc_id", "source", "text"))
    sel_agg = mix.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_tokens").cast("long").alias("tok_selected"),
    )
    return (
        raw_agg.join(dedup_agg, "source", "left")
        .join(qual_agg, "source", "left")
        .join(sel_agg, "source", "left")
        .select(
            "source",
            "n_raw",
            "tok_raw",
            F.coalesce("n_dedup", zero).alias("n_dedup"),
            F.coalesce("tok_dedup", zero).alias("tok_dedup"),
            F.coalesce("n_quality", zero).alias("n_quality"),
            F.coalesce("tok_quality", zero).alias("tok_quality"),
            F.coalesce("n_selected", zero).alias("n_selected"),
            F.coalesce("tok_selected", zero).alias("tok_selected"),
        )
        .orderBy("source")
    )


@register(
    "p_e2e_pack_manifest",
    f"""
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
       CAST(sum(CASE WHEN n_tokens > {DEFAULT_PACK_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS oversize_docs,
       CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000)
            // (count(DISTINCT pack_id) * {DEFAULT_PACK_BUDGET}) AS BIGINT)
           AS fill_ppm
FROM ({pack_sequences_sql(DEFAULT_PACK_BUDGET, rel=_QUAL_DOCS_REL)})
GROUP BY source
ORDER BY source
""",
    tags=("pipeline", "compose"),
    doc="end-to-end pack manifest: the dedup→quality survivor chain packed "
    "into fixed token budgets (functions/packing.pack_sequences), audited "
    "per source — pack counts, token totals, oversize docs, exact fill ppm; "
    "pack boundaries land on POST-filter doc ranks, which no single-stage "
    "query exercises",
)
def q_e2e_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, qual = _qual_docs(spark, sf_dir)
    pack = pack_sequences(qual.select("doc_id", "source", "text"), budget=DEFAULT_PACK_BUDGET)
    return (
        pack.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("pack_tokens").alias("max_pack_tokens"),
            F.sum((F.col("n_tokens") > DEFAULT_PACK_BUDGET).cast("long")).alias(
                "oversize_docs"
            ),
        )
        .withColumn(
            # ppm-numerator rule: lift to DECIMAL(38,0)/HUGEINT before the
            # ×1e6 — a raw BIGINT product overflows past ~9.2e12 total tokens
            "fill_ppm",
            F.expr(
                f"CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000)"
                f" div (n_packs * {DEFAULT_PACK_BUDGET}) AS BIGINT)"
            ),
        )
        .orderBy("source")
    )


@register(
    "p_e2e_mix_dedup_interaction",
    f"""
WITH mix_raw AS MATERIALIZED ({corpus_mix_sql(rel='documents')}),
qual_docs AS MATERIALIZED (SELECT * FROM {_QUAL_DOCS_REL}),
mix_curated AS MATERIALIZED ({corpus_mix_sql(rel='qual_docs')})
SELECT coalesce(r.source, c.source) AS source,
       CAST(coalesce(r.n, 0) AS BIGINT) AS n_raw_mix,
       CAST(coalesce(r.tok, 0) AS BIGINT) AS tok_raw_mix,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_curated_mix,
       CAST(coalesce(c.tok, 0) AS BIGINT) AS tok_curated_mix,
       CAST(coalesce(b.n_common, 0) AS BIGINT) AS n_common
FROM (SELECT source, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok
      FROM mix_raw GROUP BY source) r
FULL JOIN (SELECT source, count(*) AS n, CAST(sum(n_tokens) AS BIGINT) AS tok
           FROM mix_curated GROUP BY source) c ON r.source = c.source
LEFT JOIN (SELECT a.source, count(*) AS n_common
           FROM mix_raw a JOIN mix_curated b2
             ON a.source = b2.source AND a.doc_id = b2.doc_id
           GROUP BY a.source) b ON coalesce(r.source, c.source) = b.source
ORDER BY source
""",
    tags=("pipeline", "compose"),
    doc="selection-bias audit of the composed chain: the SAME corpus-mix "
    "recipe over the raw corpus vs over the dedup→quality survivors — "
    "per-source pick deltas and the overlap of chosen doc_ids (how much "
    "the upstream filters reshape the final mix)",
)
def q_e2e_mix_dedup_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    _, qual = _qual_docs(spark, sf_dir)
    mix_raw = track_cached(corpus_mix(docs))
    mix_cur = track_cached(corpus_mix(qual.select("doc_id", "source", "text")))
    zero = F.lit(0).cast("long")
    r = mix_raw.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw_mix"),
        F.sum("n_tokens").cast("long").alias("tok_raw_mix"),
    )
    c = mix_cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_curated_mix"),
        F.sum("n_tokens").cast("long").alias("tok_curated_mix"),
    )
    common = (
        mix_raw.select("source", "doc_id")
        .join(mix_cur.select("source", "doc_id"), ["source", "doc_id"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        r.join(c, "source", "full")
        .join(common, "source", "left")
        .select(
            "source",
            F.coalesce("n_raw_mix", zero).alias("n_raw_mix"),
            F.coalesce("tok_raw_mix", zero).alias("tok_raw_mix"),
            F.coalesce("n_curated_mix", zero).alias("n_curated_mix"),
            F.coalesce("tok_curated_mix", zero).alias("tok_curated_mix"),
            F.coalesce("n_common", zero).alias("n_common"),
        )
        .orderBy("source")
    )


@register(
    "p_e2e_split_leakage",
    f"""
WITH pairs AS MATERIALIZED (
  {lsh_candidate_pairs_sql(k=16, n=3, bands=4)}
),
splits AS MATERIALIZED (
  SELECT doc_id, {split_assign_sql("doc_id")} AS split
  FROM documents
),
surv AS MATERIALIZED (SELECT doc_id FROM ({_SURVIVORS_SQL})),
labeled AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
  FROM pairs p
  JOIN splits sa ON p.doc_a = sa.doc_id
  JOIN splits sb ON p.doc_b = sb.doc_id
)
SELECT scope, n_pairs, n_cross_split, n_train_eval FROM (
  SELECT 'raw' AS scope,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(coalesce(sum(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_cross_split,
         CAST(coalesce(sum(CASE WHEN (split_a = 'train') <> (split_b = 'train')
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_train_eval
  FROM labeled
  UNION ALL
  SELECT 'deduped',
         CAST(count(*) AS BIGINT),
         CAST(coalesce(sum(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END), 0)
              AS BIGINT),
         CAST(coalesce(sum(CASE WHEN (split_a = 'train') <> (split_b = 'train')
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM labeled
  WHERE doc_a IN (SELECT doc_id FROM surv)
    AND doc_b IN (SELECT doc_id FROM surv)
) ORDER BY scope
""",
    tags=("pipeline", "compose"),
    doc="composed contamination audit: LSH near-dup candidate pairs labeled "
    "with the deterministic train/val/test assignment (p_dataset_split's "
    "hash rule), counted raw vs after the exact-dedup chain — measures how "
    "much cross-split leakage the dedup stage actually removes (exact-dup "
    "pairs share every band, so surviving cross-split candidates are the "
    "near-dup leakage the split cannot see)",
)
def q_e2e_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import dedup as _dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    pairs = track_cached(_dedup.lsh_candidate_pairs(docs, k=16, n=3, bands=4))
    splits = docs.select("doc_id", split_assign_col("doc_id").alias("split"))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # cached: the deduped branch semi-joins this frame on BOTH pair ends —
    # uncached, the md5 window (a full documents shuffle) would run twice
    surv = track_cached(
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id")
    )
    labeled = track_cached(
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        ).join(
            splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
    )

    def _counts(frame: DataFrame, scope: str) -> DataFrame:
        cross = (F.col("split_a") != F.col("split_b")).cast("long")
        te = ((F.col("split_a") == "train") != (F.col("split_b") == "train")).cast("long")
        return frame.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(cross).alias("n_cross_split"),
            F.sum(te).alias("n_train_eval"),
        ).select(
            F.lit(scope).alias("scope"),
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_cross_split", F.lit(0)).cast("long").alias("n_cross_split"),
            F.coalesce("n_train_eval", F.lit(0)).cast("long").alias("n_train_eval"),
        )

    deduped = labeled.join(
        surv.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).join(surv.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi")
    return _counts(labeled, "raw").unionAll(_counts(deduped, "deduped")).orderBy("scope")


#: budgets for the mix sensitivity sweep — powers-of-two multiples of the
#: registered p_corpus_mix default so each point is directly comparable
_MIX_BUDGETS = (10_000, 20_000, 40_000)


@register(
    "a_mix_budget_sensitivity",
    f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         {portable_hash60_sql("CAST(doc_id AS VARCHAR)")} AS prio
  FROM documents
), src_w AS (
  SELECT source, 1 + CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER) % 3 AS w
  FROM (SELECT DISTINCT source FROM documents)
), ranked AS MATERIALIZED (
  SELECT t.*, s.w,
         (SELECT CAST(sum(w) AS DOUBLE) FROM src_w) AS w_total,
         CAST(sum(n_tokens) OVER (PARTITION BY t.source ORDER BY prio, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM toks t JOIN src_w s USING (source)
), budgets AS (SELECT CAST(unnest([{", ".join(str(b) for b in _MIX_BUDGETS)}]) AS BIGINT) AS budget)
SELECT b.budget, r.source,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(r.n_tokens) AS BIGINT) AS tok_selected
FROM ranked r CROSS JOIN budgets b
WHERE r.cum_tokens - r.n_tokens < floor(b.budget * r.w / r.w_total)
GROUP BY b.budget, r.source
ORDER BY b.budget, r.source
""",
    tags=("pipeline", "compose", "sampling"),
    doc="corpus-mix budget sensitivity: the SAME hash-priority ranking pass "
    "evaluated at 3 token budgets (the session-gap-sensitivity sweep "
    "pattern) — per-(budget, source) pick and token counts show how the "
    "mix recipe's selection scales with the budget knob; one window pass, "
    "3 literal thresholds",
)
def q_mix_budget_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.hashing import portable_hash60
    from kafka_replicator_spark.functions.stitch import grouped_rank_cumsum
    from kafka_replicator_spark.functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        portable_hash60(F.col("doc_id").cast("string")).alias("prio"),
    )
    src_w = (
        toks.select("source")
        .distinct()
        .withColumn(
            "w",
            (F.lit(1) + F.regexp_extract("source", r"(\d+)$", 1).cast("int") % 3).cast(
                "long"
            ),
        )
    )
    total_w = src_w.agg(F.sum("w").cast("double").alias("w_total"))
    # grouped stitch (never Window.partitionBy(source) over the doc grain);
    # the stitch caches its tagged frame, so no outer track_cached needed
    ranked = (
        grouped_rank_cumsum(toks, "source", ["prio", "doc_id"], sum_col="n_tokens")
        .withColumnRenamed("__gcumsum", "cum_tokens")
        .drop("__grank")
        .join(F.broadcast(src_w), "source")
        .join(F.broadcast(total_w))
    )
    budgets = spark.range(len(_MIX_BUDGETS)).select(
        F.element_at(
            F.array(*[F.lit(b).cast("long") for b in _MIX_BUDGETS]),
            (F.col("id") + 1).cast("int"),
        ).alias("budget")
    )
    return (
        ranked.crossJoin(F.broadcast(budgets))
        .filter(
            F.col("cum_tokens") - F.col("n_tokens")
            < F.floor(F.col("budget") * F.col("w") / F.col("w_total"))
        )
        .groupBy("budget", "source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_tokens").alias("tok_selected"),
        )
        .orderBy("budget", "source")
    )
