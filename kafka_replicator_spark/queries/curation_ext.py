"""Curation extensions: substring-dedup span extents, dup-cluster purity,
TextRank keywords, DoReMi-style domain reweighting, stratified k-fold.

Reference parity: none (segment transport engine) — this family finishes
the curation story: not just *which* windows repeat (p_dup_spans) but the
merged byte ranges a cutter would drop; not just *which* docs cluster but
whether clusters cross languages; graph keyword extraction on the shared
PageRank kernel; loss-driven (not size-driven) mixture weights next to the
size-driven p_corpus_mix/p_epoch_plan; and the k-fold audit companion to
p_dataset_split.

Determinism: same house rules — integer ppm, DECIMAL folds, the
portable MD5-prefix hash, floats only as per-row fixed expressions
rounded to 6 dp (the one cross-row float fold, DoReMi's excess sum, is
quantized to integer micro BEFORE summation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, scoring
from kafka_replicator_spark.functions.graph import pagerank_fixed, pagerank_fixed_sql
from kafka_replicator_spark.functions.hashing import spread
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: substring-dedup window width (tokens), matches p_dup_spans
_SPAN_W = 8
#: TextRank keywords reported
_TEXTRANK_TOP = 20
#: k-fold fold count
_KFOLD = 5


# ------------------------------------------- merged dup-span extents

@register(
    "p_dup_span_extents",
    dedup.dup_span_extents_sql(w=_SPAN_W),
    tags=("pipeline", "dedup"),
    doc="substring-dedup span extents (Lee et al. 2022 ExactSubstr, "
    "window-hash flavour): corpus-repeated 8-token windows per document "
    "merged into maximal overlapping runs via the islands idiom — the "
    "actual cut list (span count, covered tokens, longest run) a "
    "substring cutter executes; all windows partition by doc, the only "
    "corpus-wide stage is the window-hash occurrence count "
    "(functions/dedup.dup_span_extents)",
)
def q_dup_span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dup_span_extents(load_table(spark, sf_dir, "documents"), w=_SPAN_W)


# --------------------------------------------------- dup-cluster purity

@register(
    "p_cluster_purity",
    f"""
WITH clusters AS ({dedup.duplicate_clusters_sql()}),
sized AS (
  SELECT c.doc_id, c.cluster_id, d.lang
  FROM clusters c JOIN documents d USING (doc_id)
  WHERE c.cluster_size >= 2
),
bylang AS (
  SELECT cluster_id, lang, CAST(count(*) AS BIGINT) AS n
  FROM sized GROUP BY cluster_id, lang
),
per_cluster AS (
  SELECT cluster_id, CAST(max(n) AS BIGINT) AS m, CAST(sum(n) AS BIGINT) AS s
  FROM bylang GROUP BY cluster_id
)
SELECT least((1000000 * m) // s // 100000, 9) AS purity_decile,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM per_cluster GROUP BY 1
""",
    tags=("pipeline", "dedup", "audit"),
    doc="dup-cluster language purity: majority-language share of every "
    "near-dup cluster (size ≥ 2), reported as a purity-decile histogram — "
    "low purity flags clustering that is merging translations or "
    "boilerplate across languages; cluster grain throughout, bounded "
    "output",
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.duplicate_clusters(docs)
    sized = (
        clusters.where(F.col("cluster_size") >= 2)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("cluster_id", "lang")
    )
    bylang = sized.groupBy("cluster_id", "lang").agg(F.count(F.lit(1)).alias("n"))
    per_cluster = bylang.groupBy("cluster_id").agg(
        F.max("n").alias("m"), F.sum("n").alias("s")
    )
    return (
        per_cluster.select(
            F.expr("least((1000000 * m) div s div 100000, 9)").alias("purity_decile")
        )
        .groupBy("purity_decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    )


# ----------------------------------------------------- TextRank keywords

_WORD_EDGES_CTE = """
SELECT DISTINCT vec_id, neighbor_id FROM (
  SELECT w1 AS vec_id, w2 AS neighbor_id FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT t, unnest(range(1, len(t))) AS i
          FROM (SELECT string_split(text, ' ') AS t FROM documents))
  )
  UNION ALL
  SELECT w2, w1 FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT t, unnest(range(1, len(t))) AS i
          FROM (SELECT string_split(text, ' ') AS t FROM documents))
  )
) WHERE vec_id <> neighbor_id
"""


@register(
    "p_textrank_keywords",
    f"""
WITH ranked AS ({pagerank_fixed_sql(_WORD_EDGES_CTE)})
SELECT node AS word, pagerank
FROM ranked ORDER BY pagerank DESC, word LIMIT {_TEXTRANK_TOP}
""",
    tags=("pipeline", "text", "graph"),
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank on "
    "the undirected word co-occurrence graph (adjacent-token pairs, "
    "deduplicated) via the shared fixed-iteration kernel "
    "(functions/graph.py — DECIMAL contribution folds, |E| shuffle per "
    "round); vocabulary-grain graph, distributed TakeOrdered top-20",
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.lexstats import _bigram_counts

    docs = load_table(spark, sf_dir, "documents")
    bg = _bigram_counts(docs, "text").where(F.col("w1") != F.col("w2"))
    edges = (
        bg.select(F.col("w1").alias("vec_id"), F.col("w2").alias("neighbor_id"))
        .union(bg.select(F.col("w2").alias("vec_id"), F.col("w1").alias("neighbor_id")))
        .distinct()
    )
    pr = pagerank_fixed(edges)
    return pr.select(F.col("node").alias("word"), "pagerank").orderBy(
        F.col("pagerank").desc(), "word"
    ).limit(_TEXTRANK_TOP)


# ------------------------------------------------- DoReMi domain weights

#: the DoReMi oracle text, module-level so composing audits (the
#: DSIR-vs-DoReMi rank-agreement query) reuse the IDENTICAL weight rule
DOREMI_WEIGHTS_SQL = f"""
WITH blp AS ({scoring.bigram_logprob_sql()}),
per_doc AS (
  SELECT d.source, CAST(round(-b.avg_logprob, 6) AS DECIMAL(20,6)) AS nll
  FROM blp b JOIN documents d USING (doc_id)
),
per_source AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS mean_nll
  FROM per_doc GROUP BY source
),
base AS (SELECT min(mean_nll) AS mn FROM per_source),
excess AS (
  SELECT source, n_docs, mean_nll,
         CAST(floor((mean_nll - mn) * 1000000 + 0.5) AS BIGINT) AS ex_micro
  FROM per_source CROSS JOIN base
),
tot AS (SELECT CAST(sum(ex_micro) AS BIGINT) AS t FROM excess)
SELECT source, n_docs, mean_nll,
       CAST((1000000 * ex_micro) // nullif(t, 0) AS BIGINT) AS weight_ppm
FROM excess CROSS JOIN tot
"""


@register(
    "p_doremi_weights",
    DOREMI_WEIGHTS_SQL,
    tags=("pipeline", "mixing"),
    doc="DoReMi-style loss-driven domain reweighting (Xie et al. 2023 "
    "shape): per-source excess bigram-LM NLL over the easiest source, "
    "normalized to mixture ppm — the loss-driven companion to the "
    "size-driven p_corpus_mix/p_epoch_plan; rides the shared LM scorer, "
    "the one cross-row float fold is quantized to integer micro first",
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blp = scoring.bigram_logprob(docs)
    per_doc = blp.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        F.round(-F.col("avg_logprob"), 6).cast("decimal(20,6)").alias("nll"),
    )
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 6).alias("mean_nll"),
    )
    base = per_source.agg(F.min("mean_nll").alias("mn"))
    excess = per_source.join(F.broadcast(base)).select(
        "source",
        "n_docs",
        "mean_nll",
        F.expr(
            "CAST(floor((mean_nll - mn) * 1000000 + 0.5) AS BIGINT)"
        ).alias("ex_micro"),
    )
    tot = excess.agg(F.sum("ex_micro").cast("long").alias("t"))
    return excess.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "mean_nll",
        F.expr("(1000000 * ex_micro) div nullif(t, 0)").alias("weight_ppm"),
    )


# --------------------------------------------------- stratified k-fold

from kafka_replicator_spark.functions.hashing import portable_hash60_sql

_FOLD_H = portable_hash60_sql("'fold|' || CAST(doc_id AS VARCHAR)")


@register(
    "p_stratified_kfold",
    f"""
WITH assigned AS (
  SELECT source, ({_FOLD_H} % {_KFOLD}) AS fold,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
),
per AS (
  SELECT source, fold, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY source, fold
),
tot AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS st FROM per GROUP BY source)
SELECT p.source, p.fold, p.n_docs, p.n_tokens,
       (1000000 * p.n_docs) // t.st AS fold_share_ppm
FROM per p JOIN tot t ON t.source = p.source
""",
    tags=("pipeline", "sampling", "audit"),
    doc="deterministic stratified 5-fold assignment (pure hash of the "
    "document id, same identity-function contract as p_dataset_split) "
    "with per-(source, fold) doc/token counts and fold share in exact "
    "ppm — the cross-validation audit that catches a skewed fold before "
    "a training run does; map-only + one aggregation",
)
def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.hashing import portable_hash60

    docs = load_table(spark, sf_dir, "documents")
    fold = portable_hash60(
        F.concat_ws("|", F.lit("fold"), F.col("doc_id").cast("string"))
    ) % _KFOLD
    assigned = docs.select(
        "source",
        fold.alias("fold"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("nt"),
    )
    per = assigned.groupBy("source", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )
    tot = per.groupBy("source").agg(F.sum("n_docs").cast("long").alias("st"))
    return per.join(F.broadcast(tot), "source").select(
        "source",
        "fold",
        "n_docs",
        "n_tokens",
        F.expr("(1000000 * n_docs) div st").alias("fold_share_ppm"),
    )


# --------------------------------------------- sorted-neighborhood dedup

@register(
    "p_sorted_neighborhood",
    dedup.sorted_neighborhood_pairs_sql(),
    tags=("pipeline", "dedup"),
    doc="sorted-neighborhood dedup (Hernández & Stolfo 1995): documents "
    "sorted by text-prefix blocking key, each compared with its 3 sort "
    "successors only, candidates verified by exact trigram Jaccard — the "
    "third blocking family next to LSH and SimHash, catching prefix-stable "
    "edits that low-Jaccard band collisions miss; global rank via the "
    "range-partition + local-rank + broadcast-offset pattern (never a "
    "single-partition sort), w·n candidate rows",
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.sorted_neighborhood_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "p_snm_multipass",
    dedup.snm_multipass_pairs_sql(),
    tags=("pipeline", "dedup"),
    doc="multi-pass sorted-neighborhood (the full Hernández-Stolfo form): "
    "candidate windows from TWO independent blocking keys — text prefix "
    "and reversed-text prefix — unioned before one exact trigram-Jaccard "
    "verify; the second pass recovers pairs whose edit falls inside the "
    "first key (prefix edits sort apart, suffix-adjacent); per-pass plans "
    "share the stitch rank pattern, candidates stay 2·w·n",
)
def q_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.snm_multipass_pairs(load_table(spark, sf_dir, "documents"))
