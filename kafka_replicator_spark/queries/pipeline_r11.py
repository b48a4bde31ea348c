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


# ------------------------------------------------ filter-aware ANN search

_FA_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]
_FA_K = 3
_FA_SHORT = 20
#: the big shared shortlist the naive/oversample arms carve from — wide
#: enough that the selectivity-derived oversample factor never clips at
#: tested label balance (~10 uniform labels -> factor 10-13, eff <= 260)
_FA_BIG = 320


def _fa_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        _PQ_DIST_SQL,
        _quantized_sql_cte,
        ivf_pq_scored_sql_ctes,
    )

    ids = ", ".join(str(i) for i in _FA_PROBES)
    dist = _PQ_DIST_SQL
    rank = (
        "row_number() OVER (PARTITION BY probe_id"
        " ORDER BY l2_dist ASC, neighbor_id ASC)"
    )
    return f"""
WITH lab AS (SELECT vec_id, label FROM embeddings),
plab AS MATERIALIZED (
  SELECT vec_id AS probe_id, label AS plabel FROM embeddings WHERE vec_id IN ({ids})
),
selc AS MATERIALIZED (
  SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM embeddings GROUP BY label
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
big AS MATERIALIZED (
  {ivf_pq_scored_sql_ctes(_FA_PROBES, shortlist=_FA_BIG)}
  SELECT probe_id, neighbor_id, adc_rn, l2_dist FROM rr
),
pre AS MATERIALIZED (
  {ivf_pq_scored_sql_ctes(_FA_PROBES, shortlist=_FA_SHORT, prefilter_label=True)}
  SELECT probe_id, neighbor_id, l2_dist FROM rr
),
mtch AS MATERIALIZED (
  SELECT b.probe_id, b.neighbor_id, b.adc_rn, b.l2_dist
  FROM big b JOIN lab l ON l.vec_id = b.neighbor_id
  JOIN plab p ON p.probe_id = b.probe_id
  WHERE l.label = p.plabel
),
naive AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id, {rank} AS rn
    FROM mtch WHERE adc_rn <= {_FA_SHORT}
  ) WHERE rn <= {_FA_K}
),
fct AS (
  SELECT probe_id,
         least({_FA_SHORT} * ((tot.n + selc.n_label - 1) // selc.n_label),
               {_FA_BIG}) AS eff
  FROM plab JOIN selc ON selc.label = plab.plabel, tot
),
over_arm AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT m.probe_id, m.neighbor_id, {rank} AS rn
    FROM mtch m JOIN fct USING (probe_id) WHERE m.adc_rn <= fct.eff
  ) WHERE rn <= {_FA_K}
),
pre_arm AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id, {rank} AS rn FROM pre
  ) WHERE rn <= {_FA_K}
),
exact AS MATERIALIZED (
  WITH {_quantized_sql_cte()},
  pq AS (SELECT vec_id AS probe_id, qe AS pqe FROM q WHERE vec_id IN ({ids})),
  sc AS (
    SELECT p.probe_id, q.vec_id AS neighbor_id,
           {dist.format(a='pqe', b='qe')} AS l2_dist
    FROM q
    JOIN lab l ON l.vec_id = q.vec_id
    JOIN pq p ON q.vec_id <> p.probe_id
    JOIN plab pl ON pl.probe_id = p.probe_id
    WHERE l.label = pl.plabel
  )
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id, {rank} AS rn FROM sc
  ) WHERE rn <= {_FA_K}
),
per_arm AS (
  SELECT 'naive' AS arm, n.probe_id, n.neighbor_id,
         CASE WHEN e.probe_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM naive n LEFT JOIN exact e
    ON e.probe_id = n.probe_id AND e.neighbor_id = n.neighbor_id
  UNION ALL
  SELECT 'oversample', o.probe_id, o.neighbor_id,
         CASE WHEN e.probe_id IS NULL THEN 0 ELSE 1 END
  FROM over_arm o LEFT JOIN exact e
    ON e.probe_id = o.probe_id AND e.neighbor_id = o.neighbor_id
  UNION ALL
  SELECT 'prefilter', p.probe_id, p.neighbor_id,
         CASE WHEN e.probe_id IS NULL THEN 0 ELSE 1 END
  FROM pre_arm p LEFT JOIN exact e
    ON e.probe_id = p.probe_id AND e.neighbor_id = p.neighbor_id
),
aggd AS (
  SELECT arm, probe_id, CAST(count(*) AS BIGINT) AS n_results,
         CAST(sum(hit) AS BIGINT) AS n_hits
  FROM per_arm GROUP BY arm, probe_id
),
grid AS (
  SELECT probe_id, arm
  FROM plab, (VALUES ('naive'), ('oversample'), ('prefilter')) AS a(arm)
)
SELECT g.probe_id, g.arm,
       CAST(coalesce(x.n_results, 0) AS BIGINT) AS n_results,
       CAST(coalesce(x.n_hits, 0) * 1000000 // {_FA_K} AS BIGINT) AS recall_ppm
FROM grid g LEFT JOIN aggd x ON x.probe_id = g.probe_id AND x.arm = g.arm
ORDER BY g.probe_id, g.arm
"""


@register(
    "p_ivfpq_filter_aware",
    _fa_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="filter-AWARE vector search closing the loop p_ivfpq_label_filtered "
    "opened (VERDICT r10 #4): three arms per probe on the 'nearest "
    "neighbors WHERE label = probe's label' task — naive post-filter "
    f"(label-blind {_FA_SHORT}-shortlist, filtered after; a ~10%-selective "
    "filter leaves ~2 qualifying rows, so k=3 starves), selectivity-"
    "OVERSAMPLED post-filter (shortlist x ceil(N/n_label), the factor from "
    "ONE metadata agg over the label histogram), and PREFILTER (candidates "
    "restricted to the probe's label BEFORE the ADC ranking — "
    "similarity.ivf_pq_scored(prefilter_label=True) — so the shortlist is "
    "spent entirely on qualifying rows).  Each arm's n_results and "
    "recall@3 vs the exact same-label int8-L2 ground truth, in ppm — the "
    "recall-vs-oversample tradeoff, recorded; naive/oversample arms are "
    "carved from ONE shared 320-deep scored frame",
)
def q_ivfpq_filter_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.similarity import (
        _l2_int_arrays,
        ivf_pq_scored,
        quantize_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    lab = emb.select("vec_id", "label")
    plab = track_cached(
        lab.filter(F.col("vec_id").isin(_FA_PROBES)).select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
        )
    )
    selc = lab.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_label"))
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    big = ivf_pq_scored(emb, _FA_PROBES, shortlist=_FA_BIG)
    mtch = track_cached(
        big.join(lab.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(plab), "probe_id")
        .filter(F.col("label") == F.col("plabel"))
        .select("probe_id", "neighbor_id", "adc_rank", "l2_dist")
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    naive = (
        mtch.filter(F.col("adc_rank") <= _FA_SHORT)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FA_K)
        .select("probe_id", "neighbor_id")
    )
    fct = (
        plab.join(F.broadcast(selc), plab.plabel == selc.label)
        .crossJoin(F.broadcast(tot))
        .select(
            "probe_id",
            F.least(
                F.lit(_FA_SHORT)
                * F.expr("(n + n_label - 1) div n_label"),
                F.lit(_FA_BIG).cast("long"),
            ).alias("eff"),
        )
    )
    over_arm = (
        mtch.join(F.broadcast(fct), "probe_id")
        .filter(F.col("adc_rank") <= F.col("eff"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FA_K)
        .select("probe_id", "neighbor_id")
    )
    pre_arm = (
        ivf_pq_scored(emb, _FA_PROBES, shortlist=_FA_SHORT, prefilter_label=True)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FA_K)
        .select("probe_id", "neighbor_id")
    )
    q = quantize_embeddings(emb).select("vec_id", "qe")
    pq = q.filter(F.col("vec_id").isin(_FA_PROBES)).select(
        F.col("vec_id").alias("probe_id"), F.col("qe").alias("pqe")
    )
    exact = track_cached(
        q.join(lab, "vec_id")
        .join(F.broadcast(pq), F.col("vec_id") != F.col("probe_id"))
        .join(F.broadcast(plab).withColumnRenamed("probe_id", "__pp"),
              F.col("__pp") == F.col("probe_id"))
        .filter(F.col("label") == F.col("plabel"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            _l2_int_arrays(F.col("pqe"), F.col("qe")).alias("l2_dist"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FA_K)
        .select("probe_id", "neighbor_id")
    )

    def _agg(arm_df: DataFrame, name: str) -> DataFrame:
        hit = exact.withColumn("__hit", F.lit(1))
        return (
            arm_df.join(hit, ["probe_id", "neighbor_id"], "left")
            .groupBy("probe_id")
            .agg(
                F.lit(name).alias("arm"),
                F.count(F.lit(1)).cast("long").alias("n_results"),
                F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"),
            )
        )

    aggd = (
        _agg(naive, "naive")
        .unionAll(_agg(over_arm, "oversample"))
        .unionAll(_agg(pre_arm, "prefilter"))
    )
    grid = plab.select(
        "probe_id",
        F.explode(
            F.array(F.lit("naive"), F.lit("oversample"), F.lit("prefilter"))
        ).alias("arm"),
    )
    return (
        grid.join(aggd, ["probe_id", "arm"], "left")
        .select(
            "probe_id",
            "arm",
            F.coalesce("n_results", F.lit(0)).cast("long").alias("n_results"),
            F.expr(
                f"CAST(coalesce(n_hits, 0) * 1000000 div {_FA_K} AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("probe_id", "arm")
    )


# --------------------------------- SemDeDup over the trained assignment


def _semantic_dedup_trained_sql(tau: float = 0.92) -> str:
    from kafka_replicator_spark.functions.similarity import (
        _LIST_COS_SQL,
        ivf_assign_trained_sql_ctes,
    )

    cos = _LIST_COS_SQL
    return f"""
{ivf_assign_trained_sql_ctes(_TR_K, _TR_ITERS)},
near AS (
  SELECT b.vec_id AS b_id, count(*) AS n_near
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round({cos.format(a='a.e', b='b.e')}, 6) >= {tau}
  GROUP BY b.vec_id
)
SELECT s.vec_id,
       CAST(s.centroid_id AS BIGINT) AS centroid_id,
       CAST(coalesce(n.n_near, 0) AS INTEGER) AS n_near,
       CAST(CASE WHEN n.n_near IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM assigned s LEFT JOIN near n ON s.vec_id = n.b_id
"""


@register(
    "p_semantic_dedup_trained",
    _semantic_dedup_trained_sql(),
    tags=("pipeline", "dedup", "similarity"),
    doc="SemDeDup over the TRAINED fixed-K assignment — the linear-"
    "assignment fix generalized from retrieval to the dedup family: "
    "p_semantic_dedup_auto's auto-G assignment is still N^1.5 (its "
    "centroid count grows with the corpus), while this variant's "
    f"kmeans_train(K={_TR_K}) coarse pass is N*K; the near-dup scan "
    "itself (same _semantic_scan: drop any vector whose 6dp-rounded "
    "cosine to a lower-id cluster-mate reaches 0.92) is unchanged, so "
    "keep/drop semantics differ from the stride variants only through "
    "cell geometry — data-driven cells concentrate true near-dups, the "
    "same effect p_ivfpq_trained_recall measures.  HONEST asymptotics "
    "(noop-materialized, SCALE_r11 honest_*): at fixed K the within-cell "
    "pair scan is N^2/K — measured QUADRATIC, 16.2x at 10x / 92.6x at "
    "30x vs auto-G's 6.92x/27.6x — so this variant exists as the "
    "negative control of the design matrix: fixed-K coarse codebooks "
    "fix probe-bounded retrieval scans (p_ivf_pq_rerank_trained, 4.03x "
    "at 100x) and are the WRONG shape for all-pairs-within-cell dedup, "
    "where the cell count must grow with the corpus (auto-G) "
    "(functions/similarity.ivf_assign_trained + _semantic_scan)",
)
def q_semantic_dedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.similarity import (
        _semantic_scan,
        ivf_assign_trained,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = track_cached(
        ivf_assign_trained(emb, n_clusters=_TR_K, iters=_TR_ITERS)
    )
    return _semantic_scan(assigned, 0.92)


# --------------------------------- trained vs stride cell balance


def _cell_balance_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        ivf_assign_2level_sql_ctes,
        ivf_assign_trained_sql_ctes,
    )

    def arm(name: str, ctes: str) -> str:
        return f"""{name} AS MATERIALIZED (
  {ctes}
  SELECT '{name}' AS quantizer, centroid_id FROM assigned
)"""

    arms = [
        arm("trained", ivf_assign_trained_sql_ctes(_TR_K, _TR_ITERS)),
        arm("stride2l", ivf_assign_2level_sql_ctes(250, None)),
    ]
    return f"""
WITH {", ".join(arms)},
occ AS (
  SELECT quantizer, centroid_id, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT * FROM trained UNION ALL SELECT * FROM stride2l)
  GROUP BY quantizer, centroid_id
)
SELECT quantizer,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n) AS BIGINT) AS n_assigned,
       CAST(max(n) AS BIGINT) AS max_cell,
       CAST(min(n) AS BIGINT) AS min_cell,
       CAST(max(n) * 1000000 // (sum(n) // count(*)) AS BIGINT)
         AS max_over_mean_ppm
FROM occ GROUP BY quantizer ORDER BY quantizer
"""


@register(
    "p_trained_cell_balance",
    _cell_balance_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="cell-occupancy balance of the trained fixed-K quantizer vs the "
    "auto-G stride rule (the skew gauge of the two IVF assignments: the "
    "per-cell candidate scan is bounded by the LARGEST cell, so "
    "max/mean occupancy is the straggler multiplier a skewed codebook "
    "inflicts on every probe landing in the hot cell) — cells, assigned "
    "totals (the 2-level variant may drop zero-fine-member vectors, its "
    "documented contract; the trained one is total), max/min cell and "
    "max-over-mean in ppm, one row per quantizer from one occupancy agg",
)
def q_trained_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.similarity import (
        ivf_assign_2level,
        ivf_assign_trained,
    )

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    arms = [
        ("trained", ivf_assign_trained(emb, n_clusters=_TR_K, iters=_TR_ITERS)),
        ("stride2l", ivf_assign_2level(emb, 250, None)),
    ]
    out = None
    for name, assigned in arms:
        occ = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        arm = occ.agg(
            F.lit(name).alias("quantizer"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_assigned"),
            F.max("n").cast("long").alias("max_cell"),
            F.min("n").cast("long").alias("min_cell"),
            F.expr(
                "CAST(max(n) * 1000000 div (sum(n) div count(1)) AS BIGINT)"
            ).alias("max_over_mean_ppm"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("quantizer")


# --------------------------------- Lloyd inertia descent

_INERTIA_ITERS = (1, 2)


def _inertia_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import kmeans_model_sql_ctes

    arms = []
    for i in _INERTIA_ITERS:
        arms.append(f"""it{i} AS MATERIALIZED (
  {kmeans_model_sql_ctes(_TR_K, i)}
  SELECT CAST({i} AS BIGINT) AS iters,
         CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(qd) AS BIGINT) AS inertia_micro
  FROM (
    SELECT CAST(floor(md * 1000000 + 0.5) AS BIGINT) AS qd
    FROM (
      SELECT emb.vec_id,
             min(list_dot_product(e, e) - 2 * list_dot_product(e, cd)
                 + list_dot_product(cd, cd)) AS md
      FROM emb, model GROUP BY emb.vec_id
    )
  )
)""")
    u = " UNION ALL ".join(f"SELECT * FROM it{i}" for i in _INERTIA_ITERS)
    return f"WITH {', '.join(arms)}\nSELECT * FROM ({u}) ORDER BY iters"


@register(
    "p_trained_inertia_descent",
    _inertia_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="Lloyd's-descent audit of kmeans_train: total quantization inertia "
    "(sum over vectors of min squared-L2 to any centroid, each distance "
    "quantized to micro BEFORE the integer fold — the r05 rule) under "
    f"the K={_TR_K} model at {_INERTIA_ITERS[0]} vs {_INERTIA_ITERS[1]} "
    "training iterations.  Lloyd's objective is non-increasing per "
    "iteration, so inertia(2) <= inertia(1) up to the micro-unit centroid "
    "rounding — the descent evidence behind the fixed iteration budget "
    "every trained-codebook consumer inherits; min-per-vector is an "
    "order-free aggregate (no tie-break needed), so the arms share no "
    "assignment machinery (functions/similarity.kmeans_model)",
)
def q_trained_inertia_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.similarity import (
        _dbl,
        _spread_emb,
        dot_col,
        kmeans_models_prefix,
    )

    raw = track_cached(load_table(spark, sf_dir, "embeddings"))
    emb = track_cached(
        _spread_emb(raw).select("vec_id", _dbl("embedding").alias("e"))
    )
    # r13-opt: one training run at the deepest rung serves every rung's
    # model (Lloyd prefixes — bit-identical; the per-rung re-train paid
    # an extra init + sums pass for sums the deep run already collected)
    models = dict(
        zip(
            _INERTIA_ITERS,
            kmeans_models_prefix(raw, list(_INERTIA_ITERS), n_clusters=_TR_K),
        )
    )
    out = None
    for i in _INERTIA_ITERS:
        cents = models[i]
        md = (
            emb.join(F.broadcast(cents))
            .select(
                "vec_id",
                (
                    dot_col(F.col("e"), F.col("e"))
                    - 2 * dot_col(F.col("e"), F.col("cd"))
                    + dot_col(F.col("cd"), F.col("cd"))
                ).alias("dist"),
            )
            .groupBy("vec_id")
            .agg(F.min("dist").alias("md"))
        )
        arm = md.select(
            F.expr("CAST(floor(md * 1000000 + 0.5) AS BIGINT)").alias("qd")
        ).agg(
            F.lit(i).cast("long").alias("iters"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum(F.col("qd").cast("decimal(38,0)")).cast("long").alias("inertia_micro"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("iters")


# --------------------------------- trained-rerank recall


def _ivfpq_trained_recall_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        exact_int8_topk_sql_scope,
        ivf_pq_rerank_sql,
    )

    denom = len(_TR_PROBES) * 5
    approx = ivf_pq_rerank_sql(
        _TR_PROBES,
        k=5,
        shortlist=20,
        coarse_codebook="trained",
        n_clusters=_TR_K,
        train_iters=_TR_ITERS,
        code_limit=_TR_CODE_LIMIT,
    )
    return f"""
WITH approx AS MATERIALIZED (
  SELECT probe_id, neighbor_id FROM ({approx})
),
exact AS MATERIALIZED (
  {exact_int8_topk_sql_scope(_TR_PROBES, k=5)}
)
SELECT CAST(count(*) AS BIGINT) AS n_hits,
       CAST({denom} AS BIGINT) AS n_expected,
       CAST((count(*) * 1000000) // {denom} AS BIGINT) AS recall_ppm
FROM approx JOIN exact USING (probe_id, neighbor_id)
"""


@register(
    "p_ivfpq_trained_recall",
    _ivfpq_trained_recall_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="recall@5 of the TRAINED fixed-K IVFPQ chain against the exact "
    "int8 brute-force L2 ground truth — the quality half of the "
    "linear-assignment fix (p_ivfpq_recall measures the stride path): "
    "a trained codebook that made assignment linear but emptied recall "
    "would be no fix at all, so the curve and this number travel "
    "together; same probe set, same denominator, directly comparable",
)
def q_ivfpq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.similarity import exact_int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = _sim.ivf_pq_rerank(
        emb,
        _TR_PROBES,
        k=5,
        shortlist=20,
        coarse_codebook="trained",
        n_clusters=_TR_K,
        train_iters=_TR_ITERS,
        code_limit=_TR_CODE_LIMIT,
    ).select("probe_id", "neighbor_id")
    exact = exact_int8_topk(emb, _TR_PROBES, k=5)
    denom = len(_TR_PROBES) * 5
    return approx.join(exact, ["probe_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.lit(denom).cast("long").alias("n_expected"),
        F.expr(f"CAST((count(1) * 1000000) div {denom} AS BIGINT)").alias("recall_ppm"),
    )


# --------------------------------- BPE round-trip fidelity

from kafka_replicator_spark.functions import corpus as _corpus  # noqa: E402


@register(
    "p_bpe_roundtrip",
    _corpus.bpe_roundtrip_sql(k=20),
    tags=("pipeline", "tokenizer", "audit"),
    doc="tokenizer round-trip fidelity under the round-1 BPE merge table "
    "(VERDICT r10 #6): every vocabulary word is EXPLICITLY segmented by "
    "the top-20 merges (greedy left-to-right non-overlap = the odd "
    "positions of each mergeable-position island), decoded by in-order "
    "concatenation, and checked decode == word — identity_types_ppm and "
    "identity_occ_ppm are pinned at 1000000 (the littles-law identity "
    "pattern: a mismatch localizes a segmentation bug on either engine); "
    "subwords_explicit vs subwords_closed_form ties bpe_fertility's "
    "ceil(L/2) closed form to a real segmentation "
    "(functions/corpus.bpe_roundtrip)",
)
def q_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus.bpe_roundtrip(load_table(spark, sf_dir, "documents"), k=20)


# --------------------------------- cut window-size sensitivity

from kafka_replicator_spark.functions.dedup import (  # noqa: E402
    substring_cut,
    substring_cut_sql,
)

#: window-size ladder around the ExactSubstr default (Lee et al. tune this
#: knob: small windows over-cut natural collocations, large ones miss
#: short boilerplate)
_CUT_W_LADDER = (6, 8, 12)


def _cut_sensitivity_oracle() -> str:
    ctes = []
    arms = []
    for w in _CUT_W_LADDER:
        ctes.append(
            f"cw{w} AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(w)}))"
        )
        arms.append(f"""
SELECT CAST({w} AS BIGINT) AS window_w,
       CAST(sum(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_cut,
       CAST(sum(cut_tokens) AS BIGINT) AS cut_tokens,
       CAST(sum(kept_tokens) AS BIGINT) AS kept_tokens
FROM cw{w}""")
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM ("
        + " UNION ALL ".join(arms)
        + ") ORDER BY window_w"
    )


@register(
    "p_cut_window_sensitivity",
    _cut_sensitivity_oracle(),
    tags=("pipeline", "dedup", "sweep"),
    doc="ExactSubstr window-size sensitivity: corpus cut volume at "
    f"w = {_CUT_W_LADDER} (the knob Lee et al. tune — small windows "
    "over-cut natural collocations, large windows miss short "
    "boilerplate); cut_tokens is MONOTONE NON-INCREASING in w (every "
    "repeated w-window contains a repeated (w-1)-window... the converse, "
    "so coverage shrinks as w grows) — the ladder locates the knee.  "
    "Arms are full independent cut chains (window hashes differ per w, "
    "nothing shareable), sibling CTE scopes in the oracle",
)
def q_cut_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = track_cached(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    out = None
    for w in _CUT_W_LADDER:
        cut = substring_cut(docs, w=w)
        arm = cut.agg(
            F.lit(w).cast("long").alias("window_w"),
            F.sum(F.when(F.col("cut_tokens") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_cut"),
            F.sum("cut_tokens").cast("long").alias("cut_tokens"),
            F.sum("kept_tokens").cast("long").alias("kept_tokens"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("window_w")


# --------------------------------- bucketed SemDeDup scan

_SB_PLANES = 4


@register(
    "p_semantic_dedup_bucketed",
    _sim.semantic_dedup_bucketed_sql(n_planes=_SB_PLANES),
    tags=("pipeline", "dedup", "similarity"),
    doc="SemDeDup with the LSH-BUCKETED near scan — the structural fix for "
    "the honest scale finding (the within-cell all-pairs scan, masked by "
    "count-pruning in every prior wall number, is 58.8x at 100x under "
    f"auto-G): sign-LSH over {_SB_PLANES} deterministic integer "
    "hyperplanes blocks the pair scan per (cell, bucket) — expected "
    f"2^{_SB_PLANES} = {2 ** _SB_PLANES}x fewer pairs.  A deterministic "
    "RELAXATION, not hidden randomness: drop iff a lower-id 6dp-cosine "
    ">= 0.92 mate shares cell AND bucket; a c=0.99 dup pair crosses one "
    "plane w.p. arccos(c)/pi ~ 0.045, and "
    "p_semdedup_bucketed_agreement MEASURES the retention instead of "
    "assuming it (functions/similarity.semantic_dedup_bucketed)",
)
def q_semantic_dedup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_bucketed(
        load_table(spark, sf_dir, "embeddings"), n_planes=_SB_PLANES
    )


#: the agreement audit's threshold sits INSIDE the corpus's cosine range
#: (max pairwise cosine on the synthetic embeddings is ~0.51, so the
#: family default 0.92 drops nothing anywhere) — at c≈0.45 a pair crosses
#: one hyperplane w.p. arccos(c)/pi ≈ 0.35, putting the audit at the
#: UNFAVORABLE end of the retention curve (expected ~(0.65)^4 ≈ 18%);
#: dup-grade pairs (c≈0.99) retain ~(0.955)^4 ≈ 83% — the measured number
#: below is the honest floor, not the production operating point
_SB_AUDIT_TAU = 0.40


@register(
    "p_semdedup_bucketed_agreement",
    f"""
WITH fullscan AS MATERIALIZED (
  SELECT vec_id, kept
  FROM ({_sim.semantic_dedup_2level_sql(tau=_SB_AUDIT_TAU, coarse_factor=None)})
),
bucketed AS MATERIALIZED (
  SELECT vec_id, kept
  FROM ({_sim.semantic_dedup_bucketed_sql(tau=_SB_AUDIT_TAU, n_planes=_SB_PLANES)})
),
j AS (
  SELECT f.kept AS kept_full, b.kept AS kept_bucketed
  FROM fullscan f JOIN bucketed b USING (vec_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN kept_full = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_full,
       CAST(sum(CASE WHEN kept_bucketed = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_bucketed,
       CAST(sum(CASE WHEN kept_full = 0 AND kept_bucketed = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_both,
       CAST(sum(CASE WHEN kept_full = 0 AND kept_bucketed = 0
                     THEN 1 ELSE 0 END) * 1000000
            // nullif(sum(CASE WHEN kept_full = 0 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS drop_retention_ppm
FROM j
""",
    tags=("pipeline", "dedup", "eval"),
    doc="retention audit of the bucketed SemDeDup scan against the full "
    f"within-cell scan (same auto-G cells, same tau={_SB_AUDIT_TAU} — "
    "placed inside the corpus's cosine range, see _SB_AUDIT_TAU: the "
    "synthetic embeddings have no dup-grade pairs, so this measures the "
    "retention curve's unfavorable low-cosine end, the honest floor): of "
    "the vectors the full scan drops, what share does the bucketed scan "
    "still drop (drop_retention_ppm) — the measured recall of the "
    "2^planes pair-volume reduction; bucketed can never drop a vector "
    "the full scan keeps (its pair set is a subset), so the 2x2 "
    "degenerates to this one ratio plus the counts",
)
def q_semdedup_bucketed_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    full = _sim.semantic_dedup_2level(
        emb, tau=_SB_AUDIT_TAU, coarse_factor=None
    ).select("vec_id", F.col("kept").alias("kept_full"))
    buck = _sim.semantic_dedup_bucketed(
        emb, tau=_SB_AUDIT_TAU, n_planes=_SB_PLANES
    ).select("vec_id", F.col("kept").alias("kept_bucketed"))
    j = full.join(buck, "vec_id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("kept_full") == 0, 1).otherwise(0))
        .cast("long")
        .alias("dropped_full"),
        F.sum(F.when(F.col("kept_bucketed") == 0, 1).otherwise(0))
        .cast("long")
        .alias("dropped_bucketed"),
        F.sum(
            F.when((F.col("kept_full") == 0) & (F.col("kept_bucketed") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("dropped_both"),
        F.expr(
            "CAST(sum(CASE WHEN kept_full = 0 AND kept_bucketed = 0"
            " THEN 1 ELSE 0 END) * 1000000"
            " div nullif(sum(CASE WHEN kept_full = 0 THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)"
        ).alias("drop_retention_ppm"),
    )


# --------------------------------- dedup cascade ORDER sensitivity


@register(
    "p_cascade_order_sensitivity",
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
ca AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(_SUBSTR_W, rel='t1')})),
cb AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(_SUBSTR_W)})),
survb AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY md5(clean_text) ORDER BY doc_id) AS rn
    FROM cb
  ) WHERE rn = 1
),
nraw AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
SELECT 'exact_first' AS pipeline,
       CAST(count(*) AS BIGINT) AS n_docs_final,
       CAST(sum(kept_tokens) AS BIGINT) AS tokens_final,
       CAST(sum(cut_tokens) AS BIGINT) AS cut_tokens,
       CAST((SELECT n FROM nraw) - count(*) AS BIGINT) AS n_exact_removed
FROM ca
UNION ALL
SELECT 'cut_first',
       (SELECT CAST(count(*) AS BIGINT) FROM survb),
       (SELECT CAST(sum(kept_tokens) AS BIGINT)
        FROM cb JOIN survb USING (doc_id)),
       CAST(sum(cut_tokens) AS BIGINT),
       CAST(count(*) - (SELECT count(*) FROM survb) AS BIGINT)
FROM cb
ORDER BY pipeline
""",
    tags=("pipeline", "compose", "dedup"),
    doc="order-of-operations sensitivity of the dedup cascade: exact-then-"
    "cut vs cut-then-exact over the SAME corpus and window.  Running the "
    "cut FIRST sees every exact duplicate still present, so all their "
    "windows are corpus-repeated and the cut removes strictly more "
    "tokens (the wasted work the exact-first order avoids); running "
    "exact dedup SECOND then collapses docs that differed ONLY in "
    "boilerplate the cut removed — a class of duplicates exact-first "
    "can never see (fully-cut docs all hash to md5('') and collapse to "
    "one).  The two finals bracket the design space the cascade picks "
    "from; per-arm doc/token accounting, sibling CTE scopes",
)
def q_cascade_order_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = track_cached(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    n_raw = docs.count()
    surv = (
        docs.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    ca = substring_cut(surv, w=_SUBSTR_W)
    arm_a = ca.agg(
        F.lit("exact_first").alias("pipeline"),
        F.count(F.lit(1)).cast("long").alias("n_docs_final"),
        F.sum("kept_tokens").cast("long").alias("tokens_final"),
        F.sum("cut_tokens").cast("long").alias("cut_tokens"),
        (F.lit(n_raw) - F.count(F.lit(1))).cast("long").alias("n_exact_removed"),
    )
    cb = track_cached(substring_cut(docs, w=_SUBSTR_W))
    survb = (
        cb.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.md5("clean_text")).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "kept_tokens")
    )
    b_tot = cb.agg(
        F.sum("cut_tokens").cast("long").alias("cut_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_cut_docs"),
    )
    b_fin = survb.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_final"),
        F.sum("kept_tokens").cast("long").alias("tokens_final"),
    )
    arm_b = (
        b_fin.crossJoin(F.broadcast(b_tot))
        .select(
            F.lit("cut_first").alias("pipeline"),
            "n_docs_final",
            "tokens_final",
            "cut_tokens",
            (F.col("n_cut_docs") - F.col("n_docs_final"))
            .cast("long")
            .alias("n_exact_removed"),
        )
    )
    return arm_a.unionAll(arm_b).orderBy("pipeline")


# --------------------------------- LSH bands-layout ladder

#: band layouts of the k=16 signature: (bands, rows/band) = (2,8)/(4,4)/
#: (8,2) — the OTHER LSH knob beside signature width
#: (p_minhash_k_sensitivity); more bands = more permissive (capture
#: probability 1-(1-s^rows)^bands rises as rows shrink)
_BAND_LADDER = (2, 4, 8)
_BAND_K, _BAND_N = 16, 3


def _band_ladder_oracle() -> str:
    from kafka_replicator_spark.functions.dedup import (
        minhash_bands_cte_sql,
        minhash_signatures_sql,
    )

    ctes = [f"sig AS MATERIALIZED ({minhash_signatures_sql(_BAND_K, _BAND_N)})"]
    arms = []
    for b in _BAND_LADDER:
        ctes.append(
            f"banded_{b} AS MATERIALIZED ({minhash_bands_cte_sql(_BAND_K, b)})"
        )
        ctes.append(f"""pairs_{b} AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded_{b} a JOIN banded_{b} b
    ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)""")
        arms.append(f"""
SELECT CAST({b} AS BIGINT) AS bands,
       CAST({_BAND_K // b} AS BIGINT) AS rows_per_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b) AS BIGINT)
         AS n_endpoint_ids
FROM pairs_{b}""")
    u = " UNION ALL ".join(arms)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({u}) ORDER BY bands"


@register(
    "p_lsh_bands_ladder",
    _band_ladder_oracle(),
    tags=("pipeline", "dedup", "sweep"),
    doc="LSH band-layout sensitivity at fixed signature width k=16: "
    f"candidate-pair volume under bands = {_BAND_LADDER} (rows/band "
    "8/4/2) — the capture curve 1-(1-s^rows)^bands says more bands admit "
    "weaker similarities, and this query prices that in PAIRS (the "
    "verification cost the banding knob actually controls; "
    "p_minhash_k_sensitivity sweeps the other knob).  Every arm bands "
    "the SAME cached signature frame (minhash_bands' new sig= sharing "
    "contract — one shingle+hash pass for the whole ladder); pair "
    "counts are necessarily non-decreasing in bands only at equal "
    "rows*bands... here layouts nest (2,8)->(4,4)->(8,2), where "
    "coarser rows strictly widen capture",
)
def q_lsh_bands_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = track_cached(minhash_signatures(docs, k=_BAND_K, n=_BAND_N))
    out = None
    for b in _BAND_LADDER:
        # the single-sourced pair semantics (tie rule, distinct) — never a
        # local copy of the self-join
        pairs = lsh_candidate_pairs(docs, k=_BAND_K, bands=b, sig=sig)
        arm = pairs.agg(
            F.lit(b).cast("long").alias("bands"),
            F.lit(_BAND_K // b).cast("long").alias("rows_per_band"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (F.countDistinct("doc_a") + F.countDistinct("doc_b"))
            .cast("long")
            .alias("n_endpoint_ids"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("bands")


# --------------------------------- shuffle-width invariance audit

_WIDTH_ARMS = (8, 32)


@register(
    "p_stitch_width_invariance",
    f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS MATERIALIZED (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS grank,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS gcum
  FROM toks
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(grank AS HUGEINT) * n_tokens) AS BIGINT)
           AS rank_dot_tokens,
         CAST(sum(CAST(gcum AS HUGEINT)) AS BIGINT) AS cumsum_total,
         CAST(max(gcum) AS BIGINT) AS source_tokens
  FROM r GROUP BY source
)
SELECT CAST(w.width AS BIGINT) AS width, a.source, a.n_docs,
       a.rank_dot_tokens, a.cumsum_total, a.source_tokens
FROM agg a, (VALUES {", ".join(f"({w})" for w in _WIDTH_ARMS)}) AS w(width)
ORDER BY a.source, width
""",
    tags=("pipeline", "audit", "plans"),
    doc="shuffle-width invariance of the grouped range-prefix stitch "
    "(VERDICT r10 #6 — the float-sum fail-fast's POSITIVE twin): the "
    "per-source rank/running-sum fingerprint (rank-dot-tokens, total "
    f"cumsum, source totals) computed at {_WIDTH_ARMS[0]} AND "
    f"{_WIDTH_ARMS[1]} range partitions must be identical — the oracle "
    "emits the width-independent plain-window truth once per width "
    "literal, so EITHER arm diverging (a partition-boundary bug in the "
    "stitch, or a non-associative fold sneaking in) fails the hash "
    "compare.  Integer sums are partition-count invariant by "
    "associativity; that is exactly what stitch.grouped_rank_cumsum's "
    "float fail-fast protects (functions/stitch.py)",
)
def q_stitch_width_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.stitch import grouped_rank_cumsum
    from kafka_replicator_spark.functions.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = track_cached(
        docs.select(
            "doc_id", "source", F.size(tokens_col()).cast("long").alias("n_tokens")
        )
    )
    out = None
    for wdt in _WIDTH_ARMS:
        r = grouped_rank_cumsum(
            toks, "source", ["doc_id"], sum_col="n_tokens", partitions=wdt
        )
        arm = r.groupBy("source").agg(
            F.lit(wdt).cast("long").alias("width"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("__grank").cast("decimal(38,0)") * F.col("n_tokens"))
            .cast("long")
            .alias("rank_dot_tokens"),
            F.sum(F.col("__gcumsum").cast("decimal(38,0)"))
            .cast("long")
            .alias("cumsum_total"),
            F.max("__gcumsum").cast("long").alias("source_tokens"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.select(
        "width", "source", "n_docs", "rank_dot_tokens", "cumsum_total",
        "source_tokens",
    ).orderBy("source", "width")


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
