"""Round-11 pipeline queries.

First entry: the trained fixed-K IVFPQ rerank (VERDICT r10 #1) — the
stride rule's coarse centroid count grows with the corpus (C = N/stride),
making even the auto-G two-level assignment N^1.5 (measured 16.6x wall at
100x data); a trained fixed-K coarse codebook (kmeans_train as the
quantizer, FAISS IVF's actual fixed-nlist design) makes assignment N*K —
linear.  The stride rule stays the default for every existing oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import similarity as _sim
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

# ------------------------------------------ trained fixed-K IVFPQ rerank

_TR_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]
#: fixed IVF nlist (the FAISS design point: K is a deployment constant, so
#: assignment is N*K = linear) and a fixed-size PQ codebook (first 64
#: stride points — caps the corpus-side code assignment at N*m*64; the cap
#: only bites past 16k vectors, so test-scale parity also covers the
#: uncapped text)
_TR_K, _TR_ITERS, _TR_CODE_LIMIT = 16, 2, 64


@register(
    "p_ivf_pq_rerank_trained",
    _sim.ivf_pq_rerank_sql(
        _TR_PROBES,
        k=5,
        shortlist=20,
        coarse_codebook="trained",
        n_clusters=_TR_K,
        train_iters=_TR_ITERS,
        code_limit=_TR_CODE_LIMIT,
    ),
    tags=("pipeline", "similarity"),
    doc="IVFPQ+refine over a TRAINED fixed-K coarse codebook (VERDICT r10 "
    f"#1): kmeans_train (K={_TR_K}, {_TR_ITERS} unrolled iterations) is "
    "the coarse quantizer — assignment cost N*K, linear in the corpus, vs "
    "the stride rule's N^1.5 (its centroid count grows as N/stride; "
    "measured 16.6x wall at 100x data) — plus a fixed-size PQ codebook "
    f"(first {_TR_CODE_LIMIT} stride points) so the code assignment is "
    "N*m*codes rather than N*m*(N/stride); every stage engine-exact "
    "(micro-unit centroids, map-side argmin replayed by the oracle's "
    "row_number window, BIGINT ADC sums, exact int8 L2 refine) "
    "(functions/similarity.ivf_assign_trained; cf. FAISS IVF's fixed "
    "nlist, Jegou et al. 2011)",
)
def q_ivf_pq_rerank_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.ivf_pq_rerank(
        load_table(spark, sf_dir, "embeddings"),
        _TR_PROBES,
        k=5,
        shortlist=20,
        coarse_codebook="trained",
        n_clusters=_TR_K,
        train_iters=_TR_ITERS,
        code_limit=_TR_CODE_LIMIT,
    )


# ------------------------------------------------ substring cut fixpoint

from kafka_replicator_spark.functions.dedup import (  # noqa: E402
    cut_to_fixpoint,
    cut_to_fixpoint_sql_ctes,
    lsh_candidate_pairs,
    lsh_candidate_pairs_sql,
)

_SUBSTR_W = 8  # shared with the round-10 substring family
_FIX_ROUNDS = 3


@register(
    "p_substring_fixpoint",
    f"""
WITH {cut_to_fixpoint_sql_ctes(_SUBSTR_W, _FIX_ROUNDS)}
SELECT doc_id, source, n_tokens, cut_tokens, kept_tokens, last_round_cut,
       md5(clean_text) AS clean_hash
FROM fix
""",
    tags=("pipeline", "dedup"),
    doc="ExactSubstr cut iterated to its FIXPOINT (VERDICT r10 #3): the "
    "windowed cut is not idempotent (p_cut_idempotence), so "
    f"dedup.cut_to_fixpoint re-cuts up to {_FIX_ROUNDS} rounds, stopping "
    "early once a round cuts zero tokens — output-equivalent to the "
    "oracle's fixed unroll of sibling CTE rounds.  last_round_cut all "
    "zero == the fixpoint was reached inside the budget (it is, at every "
    "tested scale — the decay p_substring_convergence measured); "
    "cut_tokens is the TOTAL multi-round cut, which single-round "
    "p_substring_dedup under-reports; clean_hash pins the final text "
    "itself",
)
def q_substring_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cut_to_fixpoint(docs, w=_SUBSTR_W, max_rounds=_FIX_ROUNDS).select(
        "doc_id",
        "source",
        "n_tokens",
        "cut_tokens",
        "kept_tokens",
        "last_round_cut",
        F.md5("clean_text").alias("clean_hash"),
    )


# --------------------------------- e2e cascade over the FIXPOINT cut

#: LSH banding parameters shared with p_e2e_dedup_cascade
_CAS_K, _CAS_N, _CAS_BANDS = 16, 3, 4


@register(
    "p_e2e_fixpoint_cascade",
    f"""
WITH surv AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
t1 AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.text FROM documents d JOIN surv USING (doc_id)
),
{cut_to_fixpoint_sql_ctes(_SUBSTR_W, _FIX_ROUNDS, rel='t1')},
clean AS MATERIALIZED (SELECT doc_id, source, clean_text AS text FROM fix),
pairs AS MATERIALIZED ({lsh_candidate_pairs_sql(_CAS_K, _CAS_N, _CAS_BANDS, rel='clean')}),
removed AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
fin AS (
  SELECT c.doc_id, c.source, fix.kept_tokens
  FROM clean c JOIN fix USING (doc_id)
  LEFT JOIN removed r ON r.doc_id = c.doc_id
  WHERE r.doc_id IS NULL
),
raw AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_raw
  FROM documents GROUP BY source
),
s1 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(cut_tokens) AS BIGINT) AS cut_tokens
  FROM fix GROUP BY source
),
s2 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_final,
         CAST(sum(kept_tokens) AS BIGINT) AS tok_final
  FROM fin GROUP BY source
)
SELECT raw.source, n_raw, tok_raw,
       coalesce(n_exact, 0) AS n_exact, coalesce(cut_tokens, 0) AS cut_tokens,
       coalesce(n_final, 0) AS n_final, coalesce(tok_final, 0) AS tok_final
FROM raw LEFT JOIN s1 USING (source) LEFT JOIN s2 USING (source)
ORDER BY raw.source
""",
    tags=("pipeline", "compose", "dedup"),
    doc="the dedup cascade with the FIXPOINT cut in the middle tier: exact "
    "hash survivors (min-id) -> cut_to_fixpoint of the survivors (the "
    "iterated ExactSubstr — rounds are sibling CTE scopes rel-composed "
    "over the survivor CTE) -> MinHash-LSH near-dup removal over the "
    "FINAL fixpoint text.  Versus p_e2e_dedup_cascade the extra cut "
    "rounds remove residue boilerplate BEFORE shingling, so pairs whose "
    "similarity was second-round template are un-paired here — the "
    "funnel the verdict asked to compose; per-source doc/token "
    "accounting at every stage with the LEFT-join completeness rule",
)
def q_e2e_fixpoint_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    surv = (
        docs.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    fix = track_cached(cut_to_fixpoint(surv, w=_SUBSTR_W, max_rounds=_FIX_ROUNDS))
    clean = fix.select("doc_id", "source", F.col("clean_text").alias("text"))
    pairs = lsh_candidate_pairs(clean, k=_CAS_K, n=_CAS_N, bands=_CAS_BANDS)
    removed = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    fin = (
        clean.join(fix.select("doc_id", "kept_tokens"), "doc_id")
        .join(removed, "doc_id", "left_anti")
        .select("doc_id", "source", "kept_tokens")
    )
    raw = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tok_raw"),
    )
    s1 = fix.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("cut_tokens").cast("long").alias("cut_tokens"),
    )
    s2 = fin.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_final"),
        F.sum("kept_tokens").cast("long").alias("tok_final"),
    )
    return (
        raw.join(s1, "source", "left")
        .join(s2, "source", "left")
        .select(
            "source",
            "n_raw",
            "tok_raw",
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("cut_tokens", F.lit(0)).cast("long").alias("cut_tokens"),
            F.coalesce("n_final", F.lit(0)).cast("long").alias("n_final"),
            F.coalesce("tok_final", F.lit(0)).cast("long").alias("tok_final"),
        )
        .orderBy("source")
    )
