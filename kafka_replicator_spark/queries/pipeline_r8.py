"""Round-7 pipeline additions (the round-8 verification window): retrieval
fusion/smoothing, fingerprint-density and candidate-graph audits, rare-token
curation signal — each a DataFrame→DataFrame build over the shared corpus
tables with its DuckDB oracle beside it.

No reference analog (beyond-reference LLM-pipeline surface); the retrieval
entries complete families started in retrieval_ext.py / pipeline_r6.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import dedup
from kafka_replicator_spark.functions.similarity import semantic_dedup_2level_sql
from kafka_replicator_spark.functions.hashing import spread
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: Jelinek-Mercer smoothing: λ = 1/2 (power-of-two so the mixed probability
#: is one exact integer ratio), same demo query terms as BM25/QL
_JM_TERMS = ("spark", "hash", "merge", "window")
_JM_TOP = 20

#: Borda fusion: points K..1 over each system's top-K
_BORDA_K = 20


# ----------------------------------------- Jelinek-Mercer query likelihood

@register(
    "p_jm_smoothing",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM toks),
ctf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS ctf
  FROM toks WHERE tok IN {_JM_TERMS!r} GROUP BY tok
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN {_JM_TERMS!r} GROUP BY doc_id, tok
),
cand AS (SELECT DISTINCT doc_id FROM tf),
grid AS (
  SELECT cand.doc_id, ctf.tok, ctf.ctf, coalesce(tf.tf, 0) AS tf, dl.dl
  FROM cand CROSS JOIN ctf
  LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.tok = ctf.tok
  JOIN dl ON dl.doc_id = cand.doc_id
),
terms AS (
  SELECT doc_id,
         CAST(round(ln(CAST(tf * t_total + ctf * dl AS DOUBLE)
                       / CAST(2 * dl * t_total AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS term_score
  FROM grid CROSS JOIN stats
),
scored AS (
  SELECT doc_id, round(CAST(sum(term_score) AS DOUBLE), 6) AS jm_score
  FROM terms GROUP BY doc_id
)
SELECT doc_id, jm_score FROM scored ORDER BY jm_score DESC, doc_id LIMIT {_JM_TOP}
""",
    tags=("pipeline", "retrieval"),
    doc="Jelinek-Mercer-smoothed query likelihood (λ = 1/2): score = "
    "Σ ln(½·tf/dl + ½·ctf/T).  The mixed probability is computed as the "
    "EXACT integer ratio (tf·T + ctf·dl)/(2·dl·T) — both products stay "
    "far under 2^53 so the two DOUBLE casts are exact, leaving ONE "
    "correctly-rounded divide + ln, re-quantized to 9 dp before the "
    "DECIMAL fold (the exp/ln rule).  Dense candidate×term grid like "
    "p_query_likelihood (zero-tf terms contribute their collection "
    "mass); completes the LM-smoothing triad beside Dirichlet QL and "
    "Kneser-Ney.  Distributed TakeOrdered top-20",
)
def q_jm_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = track_cached(spread(load_table(spark, sf_dir, "documents")))
    toks = track_cached(
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("dl"))
    t_total = toks.count()
    hits = toks.filter(F.col("tok").isin(*_JM_TERMS))
    ctf = hits.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("ctf"))
    tf = hits.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    cand = tf.select("doc_id").distinct()
    grid = (
        cand.crossJoin(F.broadcast(ctf))
        .join(tf, ["doc_id", "tok"], "left")
        .na.fill({"tf": 0})
        .join(dl, "doc_id")
    )
    terms = grid.select(
        "doc_id",
        F.expr(
            f"CAST(round(ln(CAST(tf * {t_total} + ctf * dl AS DOUBLE)"
            f" / CAST(2 * dl * {t_total} AS DOUBLE)), 9) AS DECIMAL(28,9))"
        ).alias("term_score"),
    )
    scored = terms.groupBy("doc_id").agg(
        F.round(F.sum("term_score").cast("double"), 6).alias("jm_score")
    )
    return scored.orderBy(F.desc("jm_score"), F.asc("doc_id")).limit(_JM_TOP)


# --------------------------------------------------- Borda rank fusion

def _borda_oracle() -> str:
    from kafka_replicator_spark.queries.pipeline_r6 import _QL_SQL
    from kafka_replicator_spark.queries.retrieval_ext import _BM25_SQL

    return f"""
WITH bm AS ({_BM25_SQL}),
ql AS ({_QL_SQL}),
bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bm
),
qlr AS (
  SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS r FROM ql
),
fused AS (
  SELECT coalesce(bmr.doc_id, qlr.doc_id) AS doc_id,
         CAST(coalesce({_BORDA_K} + 1 - bmr.r, 0)
              + coalesce({_BORDA_K} + 1 - qlr.r, 0) AS BIGINT) AS borda_points,
         CAST((bmr.doc_id IS NOT NULL)::INT
              + (qlr.doc_id IS NOT NULL)::INT AS INTEGER) AS n_systems
  FROM bmr FULL OUTER JOIN qlr ON bmr.doc_id = qlr.doc_id
)
SELECT doc_id, borda_points, n_systems
FROM fused ORDER BY borda_points DESC, doc_id LIMIT {_BORDA_K}
"""


@register(
    "p_borda_fusion",
    _borda_oracle(),
    tags=("pipeline", "retrieval"),
    doc="Borda-count rank fusion of the BM25 and Dirichlet-QL top-20 "
    "rankings (each rank r earns K+1-r points, absent docs earn 0): the "
    "positional-voting sibling of p_rrf_fusion, pure integer points so "
    "no quantization at all.  Both input rankings are ≤K-row "
    "TakeOrdered frames — ranking windows run on 20 rows; the fused "
    "frame never exceeds 2K rows.  Oracle composes the FACTORED "
    "_BM25_SQL / _QL_SQL builders (single source of truth for the "
    "system rankings)",
)
def q_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.queries.pipeline_r6 import q_query_likelihood
    from kafka_replicator_spark.queries.retrieval_ext import q_bm25_scores

    bm = q_bm25_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r_bm"),
    )
    ql = q_query_likelihood(spark, sf_dir).select(
        F.col("doc_id").alias("ql_doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("ql_score"), F.asc("doc_id")))
        .alias("r_ql"),
    )
    fused = bm.join(ql, bm["doc_id"] == ql["ql_doc_id"], "full_outer").select(
        F.coalesce(F.col("doc_id"), F.col("ql_doc_id")).alias("doc_id"),
        (
            F.coalesce(F.lit(_BORDA_K) + 1 - F.col("r_bm"), F.lit(0))
            + F.coalesce(F.lit(_BORDA_K) + 1 - F.col("r_ql"), F.lit(0))
        )
        .cast("long")
        .alias("borda_points"),
        (
            F.col("r_bm").isNotNull().cast("int")
            + F.col("r_ql").isNotNull().cast("int")
        ).alias("n_systems"),
    )
    return fused.orderBy(F.desc("borda_points"), F.asc("doc_id")).limit(_BORDA_K)


# ------------------------------------------------ winnowing density audit

@register(
    "p_winnowing_density",
    f"""
WITH fp AS ({dedup.winnowing_sql()}),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sel FROM fp GROUP BY doc_id
),
pos AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) - {dedup.WINNOW_N - 1} AS BIGINT)
           AS n_pos,
         source
  FROM documents WHERE len(string_split(text, ' ')) >= {dedup.WINNOW_N}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_pos) AS BIGINT) AS positions,
       CAST(sum(n_sel) AS BIGINT) AS selected,
       CAST((1000000::HUGEINT * sum(n_sel)) // sum(n_pos) AS BIGINT)
         AS density_ppm,
       CAST({2_000_000 // (dedup.WINNOW_W + 1)} AS BIGINT) AS expected_ppm
FROM per_doc JOIN pos USING (doc_id)
GROUP BY source ORDER BY source
""",
    tags=("pipeline", "dedup", "audit"),
    doc="winnowing fingerprint-density audit per source: distinct selected "
    "fingerprints over n-gram positions in exact ppm vs the Schleimer-"
    "Wilkerson-Aiken expectation 2/(w+1) (the storage-cost guarantee the "
    "MOSS scheme is chosen for).  Reuses the factored winnowing kernel + "
    "winnowing_sql on both engines (single source of truth); per-doc "
    "counts are one groupBy over the selection output — the audit adds "
    "one aggregation to the existing map-only plan",
)
def q_winnowing_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = track_cached(load_table(spark, sf_dir, "documents"))
    fp = dedup.winnowing(docs)
    per_doc = fp.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sel"))
    pos = docs.select(
        "doc_id",
        "source",
        (F.size(F.split("text", " ")) - (dedup.WINNOW_N - 1))
        .cast("long")
        .alias("n_pos"),
    ).filter(F.size(F.split("text", " ")) >= dedup.WINNOW_N)
    return (
        per_doc.join(pos, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_pos").cast("long").alias("positions"),
            F.sum("n_sel").cast("long").alias("selected"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * sum(n_sel))"
                " div sum(CAST(n_pos AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("density_ppm"),
            F.lit(2_000_000 // (dedup.WINNOW_W + 1)).cast("long").alias("expected_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------- LSH candidate-graph transitivity

@register(
    "p_lsh_pair_transitivity",
    f"""
WITH pairs AS ({dedup.lsh_candidate_pairs_sql()}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b AS node FROM pairs
  ) GROUP BY node
),
w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM pairs p1
  JOIN pairs p2 ON p2.doc_a = p1.doc_b
  JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
),
e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM pairs)
SELECT n_edges, n_wedges, n_triangles,
       CAST((3000000::HUGEINT * n_triangles) // nullif(n_wedges, 0) AS BIGINT)
         AS transitivity_ppm
FROM e, w, tri
""",
    tags=("pipeline", "dedup", "audit"),
    doc="global transitivity (3×triangles / wedges) of the LSH candidate-"
    "pair graph in exact ppm — a structural health check of the banding "
    "scheme: near-duplicate similarity is (approximately) transitive, so "
    "a low ratio means the bands are pairing unrelated docs.  Triangles "
    "via the ordered triple join on a<b<c (Σ deg² bounded — the "
    "candidate graph is sparse BY CONSTRUCTION, never all-pairs); wedges "
    "from one degree aggregation.  Reuses the factored "
    "lsh_candidate_pairs(_sql) kernels on both engines",
)
def q_lsh_pair_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = track_cached(dedup.lsh_candidate_pairs(docs).select("doc_a", "doc_b"))
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionAll(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    w = deg.agg(F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"))
    p1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    p2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    p3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        p1.join(p2, F.col("b") == F.col("b2"))
        .join(p3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    e = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        e.join(F.broadcast(w))
        .join(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CAST((CAST(3000000 AS DECIMAL(38,0)) * n_triangles)"
                " div nullif(n_wedges, 0) AS BIGINT)"
            ).alias("transitivity_ppm"),
        )
    )


# ------------------------------------------------- rare-token curation

#: document-frequency ceiling for "rare" (hapax + near-hapax vocabulary)
_RARE_DF_MAX = 2


@register(
    "p_rare_token_share",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
df AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok
),
rare AS (SELECT tok FROM df WHERE df <= {_RARE_DF_MAX}),
per_src AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN rare.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS rare_tokens
  FROM toks JOIN documents d USING (doc_id)
  LEFT JOIN rare ON rare.tok = toks.tok
  GROUP BY d.source
)
SELECT source, total_tokens, rare_tokens,
       CAST((1000000::HUGEINT * rare_tokens) // total_tokens AS BIGINT)
         AS rare_ppm
FROM per_src ORDER BY source
""",
    tags=("pipeline", "curation"),
    doc="share of token occurrences drawn from rare vocabulary (document "
    f"frequency ≤ {_RARE_DF_MAX}) per source, in exact ppm — the upsampling "
    "signal a data-mixing pipeline reads next to p_hapax_share (type-level) "
    "and p_source_token_js (distributional): occurrence-level rare mass.  "
    "One explode feeds BOTH the df vocabulary and the per-source fold "
    "(shared cached token frame, one extra hash join against the rare "
    "vocabulary — which is df-bounded, not corpus-bounded)",
)
def q_rare_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = track_cached(
        spread(docs).select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
        )
    )
    df = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    rare = df.filter(F.col("df") <= _RARE_DF_MAX).select(
        "tok", F.lit(1).alias("is_rare")
    )
    per_src = (
        toks.join(rare, "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_tokens"),
            F.sum(F.coalesce(F.col("is_rare"), F.lit(0))).cast("long").alias(
                "rare_tokens"
            ),
        )
    )
    return per_src.select(
        "source",
        "total_tokens",
        "rare_tokens",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * rare_tokens)"
            " div total_tokens AS BIGINT)"
        ).alias("rare_ppm"),
    ).orderBy("source")


# --------------------------------------------------- PQ recall audit

#: probes / depth for the PQ recall audit (matches the IVF curve grain)
_PQ_RECALL_PROBES = [0, 1, 2, 3]
_PQ_RECALL_K = 5


def _pq_recall_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        brute_force_topk_sql,
        pq_topk_sql,
    )

    denom = len(_PQ_RECALL_PROBES) * _PQ_RECALL_K
    return f"""
WITH bf AS ({brute_force_topk_sql(_PQ_RECALL_PROBES, k=_PQ_RECALL_K)}),
pq AS ({pq_topk_sql(_PQ_RECALL_PROBES, k=_PQ_RECALL_K)}),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits
  FROM pq JOIN bf USING (probe_id, neighbor_id)
)
SELECT n_hits,
       CAST({denom} AS BIGINT) AS n_expected,
       CAST((1000000::HUGEINT * n_hits) // {denom} AS BIGINT) AS recall_ppm
FROM hits
"""


@register(
    "p_pq_recall_at_k",
    _pq_recall_oracle(),
    tags=("pipeline", "similarity", "audit"),
    doc="recall@5 of product-quantization ADC search against the exact "
    "brute-force baseline — the accuracy dial for the memory-scale ANN "
    "tier (p_pq_distortion gives the geometric error, this gives the "
    "ranking consequence; completes the per-tier recall family beside "
    "p_ann_recall (sign-LSH) and p_ivf_probe_recall_curve).  Two ≤20-row "
    "top-k frames intersect on (probe, neighbor); exact ppm.  1-row "
    "output; reuses the factored pq_topk(_sql)/brute_force_topk(_sql) "
    "kernels",
)
def q_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    bf = similarity.brute_force_topk(emb, _PQ_RECALL_PROBES, k=_PQ_RECALL_K).select(
        "probe_id", "neighbor_id"
    )
    pq = similarity.pq_topk(emb, _PQ_RECALL_PROBES, k=_PQ_RECALL_K).select(
        "probe_id", "neighbor_id"
    )
    denom = len(_PQ_RECALL_PROBES) * _PQ_RECALL_K
    return pq.join(bf, ["probe_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.lit(denom).cast("long").alias("n_expected"),
        F.expr(f"CAST((1000000 * count(1)) div {denom} AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


# --------------------------------------------- PCA explained-variance

_PCA_DIMS = 8


def _pca_residual_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        embedding_covariance_sql,
        pca_power_iteration_sql,
    )

    return f"""
WITH cov AS ({embedding_covariance_sql(n_dims=_PCA_DIMS)}),
tr AS (
  SELECT CAST(sum(CAST(floor(covariance * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS trace_micro
  FROM cov WHERE dim_i = dim_j
),
eig AS (
  SELECT CAST(floor(max(eigenvalue) * 1000000 + 0.5) AS BIGINT) AS lambda1_micro
  FROM ({pca_power_iteration_sql(n_dims=_PCA_DIMS)})
)
SELECT CAST({_PCA_DIMS} AS BIGINT) AS n_dims, trace_micro, lambda1_micro,
       trace_micro - lambda1_micro AS residual_micro,
       CAST((1000000::HUGEINT * lambda1_micro) // nullif(trace_micro, 0) AS BIGINT)
         AS explained_ppm
FROM tr, eig
"""


@register(
    "p_pca_residual_var",
    _pca_residual_oracle(),
    tags=("pipeline", "embeddings", "audit"),
    doc="explained-variance audit of the dominant principal component: "
    "λ1 (the power-iteration Rayleigh estimate, 6-dp deterministic — "
    "p_pca_power's own output) against the covariance trace, residual "
    "and explained share in exact micro/ppm integers.  Each 6-dp double "
    "is quantized to micro BEFORE any cross-row sum (the "
    "quantize-before-fold rule — the 8 diagonal doubles would otherwise "
    "fold in engine-dependent order).  The dimensionality-reduction "
    "budget gauge beside p_dim_truncation_recall.  1-row output; "
    "composes the factored embedding_covariance(_sql) + "
    "pca_power_iteration(_sql) kernels",
)
def q_pca_residual_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    cov = similarity.embedding_covariance(emb, n_dims=_PCA_DIMS)
    tr = cov.filter(F.col("dim_i") == F.col("dim_j")).agg(
        F.sum(
            F.expr("CAST(floor(covariance * 1000000 + 0.5) AS BIGINT)")
        )
        .cast("long")
        .alias("trace_micro")
    )
    eig = similarity.pca_power_iteration(emb, n_dims=_PCA_DIMS).agg(
        F.expr("CAST(floor(max(eigenvalue) * 1000000 + 0.5) AS BIGINT)").alias(
            "lambda1_micro"
        )
    )
    return tr.join(F.broadcast(eig)).select(
        F.lit(_PCA_DIMS).cast("long").alias("n_dims"),
        "trace_micro",
        "lambda1_micro",
        (F.col("trace_micro") - F.col("lambda1_micro")).alias("residual_micro"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * lambda1_micro)"
            " div nullif(trace_micro, 0) AS BIGINT)"
        ).alias("explained_ppm"),
    )


# ------------------------------------------- tokenizer efficiency profile

@register(
    "p_chars_per_token",
    """
WITH t AS (
  SELECT source,
         CAST(sum(len(text)) AS BIGINT) AS chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
)
SELECT source, chars, tokens,
       CAST((1000000::HUGEINT * chars) // tokens AS BIGINT)
         AS chars_per_token_ppm
FROM t ORDER BY source
""",
    tags=("pipeline", "textstats"),
    doc="tokenizer-efficiency profile per source: characters per "
    "whitespace token in exact ppm (the compression-ratio planning input "
    "a token-budget pipeline reads next to p_token_len_histogram's "
    "distribution and p_shard_plan's budgeting) — one map-side "
    "length computation and one per-source fold, no explode needed "
    "(len(string_split) counts tokens without materializing them; "
    "Spark/DuckDB agree on ASCII lengths — the documented contains()/"
    "length ASCII-corpus assumption)",
)
def q_chars_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.sum(F.length("text")).cast("long").alias("chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens"),
    )
    return t.select(
        "source",
        "chars",
        "tokens",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * chars) div tokens AS BIGINT)"
        ).alias("chars_per_token_ppm"),
    ).orderBy("source")


# --------------------------------------------------- k-means elbow curve

#: cluster counts for the elbow curve (seeds = the first k vector ids)
_ELBOW_KS = (2, 4, 8)


def _elbow_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import _quantized_sql_cte

    dist = (
        "CAST(list_aggregate(list_transform(range(1, len(qe) + 1),"
        " i -> (qe[i] - se[i]) * (qe[i] - se[i])), 'sum') AS BIGINT)"
    )
    per_k = "\nUNION ALL\n".join(
        f"""SELECT CAST({k} AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(md) AS BIGINT) AS inertia
FROM (
  SELECT q.vec_id, min({dist}) AS md
  FROM q JOIN (SELECT vec_id AS sid, qe AS se FROM q WHERE vec_id < {k}) seeds
  ON TRUE
  GROUP BY q.vec_id
)"""
        for k in _ELBOW_KS
    )
    return f"WITH {_quantized_sql_cte()}\nSELECT * FROM ({per_k}) ORDER BY k"


@register(
    "p_kmeans_elbow",
    _elbow_oracle(),
    tags=("pipeline", "similarity", "audit"),
    doc="k-means elbow curve: total inertia (Σ min squared L2 to the seed "
    "set) at k = 2/4/8 over the int8-quantized corpus — the cluster-count "
    "dial beside p_silhouette_proxy (cohesion) and p_centroid_drift "
    "(stability).  Seeds are the first k vector ids (deterministic, "
    "scale-independent) COLLECTED to the driver as literal arrays "
    "(metadata-scale, ≤8 × 64 ints) so per-vector distances are pure "
    "map-side integer folds — least() over k literal expressions, one "
    "global agg per k, NO per-vector shuffle (the plan a 10⁹-vector "
    "corpus needs).  Exact BIGINT arithmetic end to end.  3-row output",
)
def q_kmeans_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    q = track_cached(
        similarity.quantize_embeddings(emb).select("vec_id", "qe")
    )
    max_k = max(_ELBOW_KS)
    seeds = {
        r["vec_id"]: list(r["qe"])
        for r in q.filter(F.col("vec_id") < max_k).collect()
    }

    def dist_to(seed_vals: list) -> F.Column:
        lit_arr = F.array(*[F.lit(int(x)) for x in seed_vals])
        return F.aggregate(
            F.zip_with(F.col("qe"), lit_arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    out = None
    for k in _ELBOW_KS:
        exprs = [dist_to(seeds[s]) for s in sorted(seeds) if s < k]
        # vec_ids are assumed 0-based; a corpus where none fall below k
        # would silently yield no seeds — fail loudly instead
        assert exprs, f"no seed vec_ids < {k} (non-0-based vec_id corpus?)"
        # F.least requires >= 2 columns; guard the single-seed degenerate
        # case (k=1, or a future corpus with non-0-based vec_ids)
        md = exprs[0] if len(exprs) == 1 else F.least(*exprs)
        frame = q.select(md.alias("md")).agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("md").cast("long").alias("inertia"),
        ).select(F.lit(k).cast("long").alias("k"), "n_vecs", "inertia")
        out = frame if out is None else out.unionAll(frame)
    return out.orderBy("k")


# ---------------------------------------------- dedup token savings

@register(
    "p_dedup_token_savings",
    """
WITH d AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents
),
keep AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY h),
m AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(d.toks) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN d.doc_id = keep.keeper THEN 0 ELSE d.toks END)
              AS BIGINT) AS saved_tokens
  FROM d JOIN keep ON d.h = keep.h
  GROUP BY d.source
)
SELECT source, n_docs, total_tokens, saved_tokens,
       CAST((1000000::HUGEINT * saved_tokens) // total_tokens AS BIGINT)
         AS saved_ppm
FROM m ORDER BY source
""",
    tags=("pipeline", "dedup", "audit"),
    doc="token savings of exact dedup per source: tokens on non-keeper "
    "copies (keeper = min doc_id per md5 text group) over total tokens, "
    "in exact ppm — the headline 'compute saved' number a curation run "
    "reports (p_dedup_rate_by_source counts documents; this weighs them "
    "by length, which is what the training budget actually pays).  One "
    "hash groupBy for keepers + one source-grain fold; the md5 group key "
    "is the same portable hash the exact-dedup operator uses",
)
def q_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    d = track_cached(d)
    keep = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    m = (
        d.join(keep, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("doc_id") == F.col("keeper"), 0).otherwise(F.col("toks"))
            )
            .cast("long")
            .alias("saved_tokens"),
        )
    )
    return m.select(
        "source",
        "n_docs",
        "total_tokens",
        "saved_tokens",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * saved_tokens)"
            " div total_tokens AS BIGINT)"
        ).alias("saved_ppm"),
    ).orderBy("source")


# ------------------------------------------- LSH bucket balance entropy

def _bucket_entropy_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import lsh_buckets_sql

    return f"""
WITH b AS ({lsh_buckets_sql(n_planes=8, dim=64)}),
c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_vecs,
             CAST(count(*) AS BIGINT) AS n_buckets FROM c),
s AS (
  SELECT CAST(sum(n * CAST(floor(ln(n) * 1000000000 + 0.5) AS BIGINT)) AS HUGEINT)
           AS s_nano
  FROM c
)
SELECT n_buckets, n_vecs,
       CAST(floor(ln(n_vecs) * 1000000000 + 0.5) AS BIGINT)
         - CAST(s_nano // n_vecs AS BIGINT) AS entropy_nano,
       CAST(floor(ln(n_buckets) * 1000000000 + 0.5) AS BIGINT) AS max_entropy_nano
FROM t, s
"""


@register(
    "p_lsh_bucket_entropy",
    _bucket_entropy_oracle(),
    tags=("pipeline", "similarity", "audit"),
    doc="Shannon entropy of the sign-LSH bucket occupancy in exact "
    "nano-nats: H = ln(N) - Σ c·ln(c) / N with every ln re-quantized to "
    "nano BEFORE any cross-row fold (the exp/ln rule; the fold itself is "
    "a pure integer weighted sum).  Low entropy = skewed buckets = the "
    "ann_topk candidate lists degenerate — the balance gauge beside "
    "p_hash_balance_audit (which checks the HASH, not the learned-ish "
    "hyperplane buckets).  1-row output; reuses the factored "
    "lsh_buckets(_sql) kernel",
)
def q_lsh_bucket_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    b = similarity.lsh_buckets(
        load_table(spark, sf_dir, "embeddings"), n_planes=8, dim=64
    )
    c = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    c = track_cached(c)  # ≤256 rows feed the totals AND the entropy fold
    t = c.agg(
        F.sum("n").cast("long").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    s = c.agg(
        F.expr(
            "CAST(sum(n * CAST(floor(ln(n) * 1000000000 + 0.5) AS BIGINT))"
            " AS DECIMAL(38,0))"
        ).alias("s_nano")
    )
    return t.join(F.broadcast(s)).select(
        "n_buckets",
        "n_vecs",
        F.expr(
            "CAST(floor(ln(n_vecs) * 1000000000 + 0.5) AS BIGINT)"
            " - CAST(s_nano div n_vecs AS BIGINT)"
        ).alias("entropy_nano"),
        F.expr("CAST(floor(ln(n_buckets) * 1000000000 + 0.5) AS BIGINT)").alias(
            "max_entropy_nano"
        ),
    )


# ---------------------------------------------- shingle reuse rate

@register(
    "p_shingle_reuse",
    f"""
WITH sh AS ({dedup.word_ngrams_sql(3)}),
df AS (
  SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM sh GROUP BY h
)
SELECT CAST(count(*) AS BIGINT) AS n_distinct_shingles,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_shingles,
       CAST((1000000::HUGEINT * sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS shared_ppm,
       CAST(max(df) AS BIGINT) AS max_df
FROM df
""",
    tags=("pipeline", "dedup", "audit"),
    doc="cross-document shingle reuse: share of distinct 3-gram shingles "
    "appearing in ≥2 documents, in exact ppm — the raw signal MinHash/LSH "
    "exploit (near-zero reuse means the banding can't find anything; the "
    "corpus-level prior under p_jaccard_decile_histogram's pairwise "
    "view).  One groupBy over the factored word_ngrams(_sql) shingle "
    "frame.  1-row output",
)
def q_shingle_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.word_ngrams(docs, n=3)
    df = sh.groupBy("h").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_shingles"),
        F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_shingles"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END))"
            " div count(1) AS BIGINT)"
        ).alias("shared_ppm"),
        F.max("df").cast("long").alias("max_df"),
    )


# ------------------------------------- document-frequency histogram

#: log2 bucket edges as literal CASE thresholds (identical text on both
#: engines — float log2 at exact powers of two is not trusted cross-engine)
_DF_BUCKETS = 21


def _df_bucket_case() -> str:
    whens = " ".join(
        f"WHEN df >= {1 << b} THEN {b}" for b in range(_DF_BUCKETS - 1, 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "p_df_histogram",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
df AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok
)
SELECT CAST({_df_bucket_case()} AS INTEGER) AS log2_df_bucket,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(df) AS BIGINT) AS total_postings
FROM df GROUP BY 1 ORDER BY 1
""",
    tags=("pipeline", "textstats"),
    doc="vocabulary document-frequency histogram in log2 buckets: how many "
    "terms live at each df scale and the posting mass they carry — the "
    "inverted-index sizing profile beside p_vocab_coverage (cumulative "
    "token view).  Buckets come from a literal CASE threshold ladder "
    "shared verbatim by both engines (float log2 at exact powers of two "
    "is not trusted cross-engine).  ≤21-row output",
)
def q_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    return (
        df.select(F.expr(f"CAST({_df_bucket_case()} AS INT)").alias("log2_df_bucket"), "df")
        .groupBy("log2_df_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("df").cast("long").alias("total_postings"),
        )
        .orderBy("log2_df_bucket")
    )


# --------------------------------------- cross-source vocabulary overlap

_VOCAB_JACCARD_TOP = 10


@register(
    "p_source_vocab_jaccard",
    f"""
WITH ts AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ts GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS c
  FROM ts a JOIN ts b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, c AS n_shared,
       CAST((1000000::HUGEINT * c) // (sa.n + sb.n - c) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN sz sa ON sa.source = inter.src_a
JOIN sz sb ON sb.source = inter.src_b
ORDER BY jaccard_ppm DESC, src_a, src_b LIMIT {_VOCAB_JACCARD_TOP}
""",
    tags=("pipeline", "textstats", "dedup"),
    doc="vocabulary (type-level) Jaccard between source pairs, top-10 most "
    "similar: the corpus-mixing diversity gauge beside "
    "p_cross_source_overlap (document-level shingle overlap) and "
    "p_source_token_js (occurrence-distribution divergence).  The pair "
    "join is keyed by TOKEN (bounded by sources-per-token² ≤ 400 per "
    "token — never a source×source×vocab blowup); the pair universe is "
    "≤190 rows so the final ranking is a TakeOrdered over a "
    "catalog-bounded frame.  Exact ppm",
)
def q_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = track_cached(
        spread(docs)
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    sz = ts.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = ts.select(F.col("source").alias("src_a"), "tok")
    b = ts.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_shared)"
                " div (na + nb - n_shared) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "src_a", "src_b")
        .limit(_VOCAB_JACCARD_TOP)
    )


# ----------------------------------- retrieval ranking agreement (tau-a)

def _rank_agreement_oracle() -> str:
    from kafka_replicator_spark.queries.pipeline_r6 import _QL_SQL
    from kafka_replicator_spark.queries.retrieval_ext import _BM25_SQL

    return f"""
WITH bm AS ({_BM25_SQL}),
ql AS ({_QL_SQL}),
bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r1 FROM bm
),
qlr AS (
  SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS r2 FROM ql
),
shared AS (SELECT bmr.doc_id, r1, r2 FROM bmr JOIN qlr USING (doc_id)),
pairs AS (
  SELECT CAST(sum(CASE WHEN (a.r1 < b.r1) = (a.r2 < b.r2) THEN 1 ELSE 0 END)
              AS BIGINT) AS concordant,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM shared a JOIN shared b ON a.doc_id < b.doc_id
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_shared FROM shared)
SELECT n_shared, n_pairs, concordant,
       CAST((1000000::HUGEINT * (2 * concordant - n_pairs))
            // nullif(n_pairs, 0) AS BIGINT) AS tau_a_ppm
FROM pairs, n
"""


@register(
    "p_retrieval_rank_agreement",
    _rank_agreement_oracle(),
    tags=("pipeline", "retrieval", "audit"),
    doc="Kendall tau-a between the BM25 and Dirichlet-QL rankings over "
    "their shared top-20 docs, in exact ppm: concordant-pair counting on "
    "a ≤20-row frame (≤190 pairs — all arithmetic integer; ranks have no "
    "ties by construction, row_number is the tie-break).  The agreement "
    "gauge that says whether fusing the two systems (p_rrf_fusion, "
    "p_borda_fusion) can add information — tau near 1 means they rank "
    "identically and fusion is a no-op.  1-row output; composes the "
    "factored _BM25_SQL/_QL_SQL",
)
def q_retrieval_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.queries.pipeline_r6 import q_query_likelihood
    from kafka_replicator_spark.queries.retrieval_ext import q_bm25_scores

    bm = q_bm25_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r1"),
    )
    ql = q_query_likelihood(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("ql_score"), F.asc("doc_id")))
        .alias("r2"),
    )
    shared = track_cached(bm.join(ql, "doc_id"))
    a = shared.select(
        F.col("doc_id").alias("da"), F.col("r1").alias("a1"), F.col("r2").alias("a2")
    )
    b = shared.select(
        F.col("doc_id").alias("db"), F.col("r1").alias("b1"), F.col("r2").alias("b2")
    )
    pairs = a.join(b, F.col("da") < F.col("db")).agg(
        F.sum(
            F.when(
                (F.col("a1") < F.col("b1")) == (F.col("a2") < F.col("b2")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("concordant"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    n = shared.agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    return pairs.join(F.broadcast(n)).select(
        "n_shared",
        "n_pairs",
        "concordant",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (2 * concordant - n_pairs))"
            " div nullif(n_pairs, 0) AS BIGINT)"
        ).alias("tau_a_ppm"),
    )


# ---------------------------------------------- ANN tier agreement

_TIER_PROBES = [0, 1, 2, 3]
_TIER_K = 5


def _tier_agreement_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        ann_topk_sql,
        ivf_topk_multiprobe_sql,
        pq_topk_sql,
    )

    denom = len(_TIER_PROBES) * _TIER_K
    return f"""
WITH lsh AS ({ann_topk_sql(_TIER_PROBES, k=_TIER_K, n_planes=4, dim=64)}),
ivf AS ({ivf_topk_multiprobe_sql(_TIER_PROBES, k=_TIER_K, nprobe=2)}),
pq AS ({pq_topk_sql(_TIER_PROBES, k=_TIER_K)}),
pairs AS (
  SELECT 'lsh~ivf' AS tier_pair, CAST(count(*) AS BIGINT) AS n_hits
  FROM lsh JOIN ivf USING (probe_id, neighbor_id)
  UNION ALL
  SELECT 'lsh~pq', CAST(count(*) AS BIGINT)
  FROM lsh JOIN pq USING (probe_id, neighbor_id)
  UNION ALL
  SELECT 'ivf~pq', CAST(count(*) AS BIGINT)
  FROM ivf JOIN pq USING (probe_id, neighbor_id)
)
SELECT tier_pair, n_hits,
       CAST((1000000::HUGEINT * n_hits) // {denom} AS BIGINT) AS overlap_ppm
FROM pairs ORDER BY tier_pair
"""


@register(
    "p_ann_tier_agreement",
    _tier_agreement_oracle(),
    tags=("pipeline", "similarity", "audit"),
    doc="pairwise top-5 overlap between the three approximate ANN tiers "
    "(sign-LSH bucket search, IVF multiprobe, PQ-ADC) over the shared "
    "probe set, in exact ppm — cross-tier agreement WITHOUT the exact "
    "baseline (each tier's recall vs brute force exists separately; "
    "disagreement here localizes which tier diverges).  Three "
    "intersection joins of ≤20-row top-k frames.  3-row output; "
    "composes the factored ann_topk/ivf_topk_multiprobe/pq_topk kernels "
    "and their SQL builders",
)
def q_ann_tier_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    lsh = similarity.ann_topk(emb, _TIER_PROBES, k=_TIER_K, n_planes=4, dim=64).select(
        "probe_id", "neighbor_id"
    )
    ivf = similarity.ivf_topk_multiprobe(emb, _TIER_PROBES, k=_TIER_K, nprobe=2).select(
        "probe_id", "neighbor_id"
    )
    pq = similarity.pq_topk(emb, _TIER_PROBES, k=_TIER_K).select(
        "probe_id", "neighbor_id"
    )
    denom = len(_TIER_PROBES) * _TIER_K
    out = None
    for name, x, y in (("ivf~pq", ivf, pq), ("lsh~ivf", lsh, ivf), ("lsh~pq", lsh, pq)):
        frame = (
            x.join(y, ["probe_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                F.lit(name).alias("tier_pair"),
                "n_hits",
                F.expr(f"CAST((1000000 * n_hits) div {denom} AS BIGINT)").alias(
                    "overlap_ppm"
                ),
            )
        )
        out = frame if out is None else out.unionAll(frame)
    return out.orderBy("tier_pair")


@register(
    "p_semantic_dedup_2level",
    semantic_dedup_2level_sql(),
    tags=("pipeline", "dedup"),
    doc="SemDeDup over a two-level IVF assignment (coarse cell -> fine "
    "centroid, deterministic tie-breaks at both levels) — the measured "
    "scale fix for the flat assignment's N^2/stride centroid scoring "
    "(tools/scale_bench.py found 16x wall at 30x corpus; the hierarchical "
    "assignment restores ~N^1.5)",
)
def q_semantic_dedup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions import similarity

    return similarity.semantic_dedup_2level(load_table(spark, sf_dir, "embeddings"))


def _bloom_register_oracle() -> str:
    from kafka_replicator_spark.functions.hashing import (
        hash_family_params,
        hash_family_sql,
        portable_hash32_sql,
    )
    from kafka_replicator_spark.functions.sketches import BLOOM_K, BLOOM_M

    h = portable_hash32_sql("CAST(c_custkey AS VARCHAR)")
    ladders = " UNION ALL ".join(
        f"SELECT ({hash_family_sql('h', a, b)}) % {BLOOM_M} AS p FROM keys"
        for a, b in hash_family_params(BLOOM_K)
    )
    return f"""
WITH keys AS (SELECT {h} AS h FROM customer),
pos AS ({ladders}),
regs AS (SELECT p, CAST(count(*) AS BIGINT) AS n_hits FROM pos GROUP BY p)
SELECT CAST(count(*) AS BIGINT) AS n_set_bits,
       CAST(sum(n_hits) AS BIGINT) AS sum_hits,
       CAST(max(n_hits) AS BIGINT) AS max_hits
FROM regs
"""


@register(
    "p_bloom_register_table",
    _bloom_register_oracle(),
    tags=("pipeline", "sketch"),
    doc="counting-bloom register table (functions/sketches.bloom_registers, "
    "m=2048 k=4) built over the customer keys, audited as set-bit count / "
    "total hash incidences / hottest bit — the batch twin of the streaming "
    "windowed_bloom_registers and the same hash ladder p_bloom_fpr_audit "
    "replays relationally",
)
def q_bloom_register_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.sketches import bloom_registers

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k")
    )
    regs = bloom_registers(cust.withColumn("g", F.lit(1)), F.col("k"), ["g"])
    return regs.agg(
        F.count(F.lit(1)).alias("n_set_bits"),
        F.sum("n_hits").alias("sum_hits"),
        F.max("n_hits").alias("max_hits"),
    )
