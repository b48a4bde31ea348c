"""Round-12 pipeline queries.

First entries: the AUTO-PLANES bucketed SemDeDup scan (VERDICT r11 #1 —
the one `weak` grade left).  The fixed n_planes=4 bucket cut is a 2^4
constant factor: at 100 TB the within-(cell,bucket) groups grow linearly
again once cells skew.  ``derive_n_planes`` picks the smallest p with
Σ|cell|² <= pairs_per_vec · N · 2^p — the bucketed scan's expected
candidate-pair volume is Σ|cell|²/2^p, so the rule caps the scan at
~pairs_per_vec candidate pairs per vector (LINEAR total work) at any
corpus size and any skew, and the DuckDB oracle derives the identical p
from the identical integer ladder (the auto-G discipline).

Also here (VERDICT r11 #4): drop-exercising tau variants of the SemDeDup
family defaults — the synthetic embeddings corpus has max pairwise cosine
~0.51, so every query at the family default tau=0.92 is keep-everything
on testdata and the driver hash never saw kept=0 rows from the default
path; these variants put tau inside the corpus range so the drop branch
flows through the driver's value hash at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import similarity as _sim
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

# ------------------------------------- auto-planes bucketed SemDeDup scan

#: tau for the drop-exercising variants — INSIDE the corpus's cosine range
#: (max pairwise cosine ~0.51; the family default 0.92 drops nothing on
#: this synthetic corpus), matching the r11 agreement audit's threshold so
#: the retention numbers stay comparable
_DROP_TAU = 0.40


@register(
    "p_semantic_dedup_bucketed_auto",
    _sim.semantic_dedup_bucketed_sql(n_planes=None, with_n_planes_col=True),
    tags=("pipeline", "dedup", "similarity"),
    doc="SemDeDup with the LSH-bucketed near scan and the plane count "
    "AUTO-DERIVED from the measured cell-size skew (VERDICT r11 #1): "
    "p = smallest plane count with sum(|cell|^2) <= 64 * N * 2^p — the "
    "scan's expected candidate-pair volume is sum(|cell|^2)/2^p, so the "
    "rule caps it at ~64 candidate pairs per vector, LINEAR total work at "
    "any corpus size (a fixed n_planes is only a 2^n constant factor "
    "once cells skew).  The derivation is one metadata-scale job "
    "(DECIMAL-lifted count squares, pure-integer comparison ladder — no "
    "float log2) replayed by the oracle's identical CASE ladder, and the "
    "derived p ships as an output column so the knob itself flows "
    "through the driver hash (functions/similarity.derive_n_planes, "
    ".semantic_dedup_bucketed_auto)",
)
def q_semantic_dedup_bucketed_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_bucketed_auto(
        load_table(spark, sf_dir, "embeddings")
    )


@register(
    "p_semantic_dedup_auto_tau40",
    _sim.semantic_dedup_2level_sql(tau=_DROP_TAU, coarse_factor=None),
    tags=("pipeline", "dedup", "similarity"),
    doc="the auto-G SemDeDup full within-cell scan with tau placed INSIDE "
    f"the corpus's cosine range ({_DROP_TAU} vs max pairwise ~0.51) so "
    "the DROP branch is driver-verified (VERDICT r11 #4: at the family "
    "default 0.92 every SemDeDup query keeps everything on this corpus, "
    "so kept=0 rows never flowed through the driver hash from the "
    "default path)",
)
def q_semantic_dedup_auto_tau40(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_2level(
        load_table(spark, sf_dir, "embeddings"),
        tau=_DROP_TAU,
        coarse_factor=None,
    )


@register(
    "p_semantic_dedup_bucketed_tau40",
    _sim.semantic_dedup_bucketed_sql(
        tau=_DROP_TAU, n_planes=None, with_n_planes_col=True
    ),
    tags=("pipeline", "dedup", "similarity"),
    doc="the auto-planes bucketed SemDeDup scan at the drop-exercising "
    f"tau={_DROP_TAU} (see p_semantic_dedup_auto_tau40) — kept=0 rows "
    "from the BUCKETED path through the driver hash, plus the derived "
    "plane count as a hashed output column",
)
def q_semantic_dedup_bucketed_tau40(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_bucketed_auto(
        load_table(spark, sf_dir, "embeddings"), tau=_DROP_TAU
    )



def _agreement_tail_sql() -> str:
    """The agreement aggregation over the ``j(kept_full, kept_bucketed,
    n_planes)`` CTE — THE one generator of the retention-audit metric
    text, shared by both agreement oracles so a metric fix can never
    fork them."""
    return """SELECT CAST(max(n_planes) AS BIGINT) AS n_planes,
       CAST(count(*) AS BIGINT) AS n_vectors,
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
FROM j"""


def _agreement_agg(j: DataFrame) -> DataFrame:
    """Spark twin of :func:`_agreement_tail_sql` over the joined
    (kept_full, kept_bucketed, n_planes) frame."""
    return j.agg(
        F.max("n_planes").cast("long").alias("n_planes"),
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


@register(
    "p_semdedup_bucketed_auto_agreement",
    f"""
WITH fullscan AS MATERIALIZED (
  SELECT vec_id, kept
  FROM ({_sim.semantic_dedup_2level_sql(tau=_DROP_TAU, coarse_factor=None)})
),
bucketed AS MATERIALIZED (
  SELECT vec_id, kept, n_planes
  FROM ({_sim.semantic_dedup_bucketed_sql(
      tau=_DROP_TAU, n_planes=None, with_n_planes_col=True)})
),
j AS (
  SELECT f.kept AS kept_full, b.kept AS kept_bucketed, b.n_planes
  FROM fullscan f JOIN bucketed b USING (vec_id)
)
{_agreement_tail_sql()}
""",
    tags=("pipeline", "dedup", "eval"),
    doc="retention audit of the AUTO-PLANES bucketed scan against the full "
    f"within-cell scan (same auto-G cells, tau={_DROP_TAU} inside the "
    "corpus's cosine range — the retention curve's unfavorable low-cosine "
    "end, the honest floor): of the vectors the full scan drops, what "
    "share the bucketed scan still drops (drop_retention_ppm), RE-MEASURED "
    "at the derived plane count (VERDICT r11 #1 done-criterion) with the "
    "count itself in the output; bucketed can never drop a vector the "
    "full scan keeps (its pair set is a subset)",
)
def q_semdedup_bucketed_auto_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    full = _sim.semantic_dedup_2level(
        emb, tau=_DROP_TAU, coarse_factor=None
    ).select("vec_id", F.col("kept").alias("kept_full"))
    buck = _sim.semantic_dedup_bucketed_auto(emb, tau=_DROP_TAU).select(
        "vec_id", F.col("kept").alias("kept_bucketed"), "n_planes"
    )
    return _agreement_agg(full.join(buck, "vec_id"))


# ------------------------------------- incremental semantic dedup

@register(
    "p_semantic_dedup_incremental",
    _sim.semantic_dedup_incremental_sql(tau=_DROP_TAU, n_batches=2),
    tags=("pipeline", "dedup", "similarity", "incremental"),
    doc="incremental SemDeDup ingest (VERDICT r11 #6 — the vector "
    "family's mergeability contract, the twin of p_minhash_mergeability): "
    "the corpus arrives as 2 consecutive vec_id-range batches folded "
    "through semantic_dedup_ingest — each batch scans ONLY the cells it "
    "touches (prior rows there plus the batch itself), never a corpus "
    "rescan, against a FROZEN centroid set; the final state is "
    "bit-identical to the one-shot scan (batch-split invariance pinned "
    f"at 1/2/4 splits in tests/test_round12_properties.py).  tau={_DROP_TAU} "
    "(inside the corpus cosine range) so the drop branch is exercised "
    "(functions/similarity.semantic_dedup_ingest)",
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_incremental(
        load_table(spark, sf_dir, "embeddings"), tau=_DROP_TAU, n_batches=2
    )


@register(
    "p_semdedup_batch_invariance",
    f"""
WITH one AS MATERIALIZED (
  SELECT vec_id, n_near, kept
  FROM ({_sim.semantic_dedup_incremental_sql(tau=_DROP_TAU, n_batches=1)})
),
two AS MATERIALIZED (
  SELECT vec_id, n_near, kept
  FROM ({_sim.semantic_dedup_incremental_sql(tau=_DROP_TAU, n_batches=2)})
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN o.kept = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
       CAST(sum(CASE WHEN o.kept <> t.kept THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_mismatch,
       CAST(sum(CASE WHEN o.n_near <> t.n_near THEN 1 ELSE 0 END) AS BIGINT)
         AS near_mismatch
FROM one o JOIN two t USING (vec_id)
""",
    tags=("pipeline", "dedup", "eval", "incremental"),
    doc="batch-split invariance audit, DRIVER-VERIFIED: the one-shot "
    "frozen-centroid scan vs the 2-batch incremental fold must agree on "
    "every vector's (kept, n_near) — kept_mismatch and near_mismatch are "
    "structurally zero (id-monotone batches freeze each row's lower-id "
    "mate set), and the oracle recomputes both arms independently so the "
    "driver hash pins the zeros at every scale",
)
def q_semdedup_batch_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    one = _sim.semantic_dedup_incremental(emb, tau=_DROP_TAU, n_batches=1).select(
        "vec_id", F.col("n_near").alias("nn1"), F.col("kept").alias("k1")
    )
    two = _sim.semantic_dedup_incremental(emb, tau=_DROP_TAU, n_batches=2).select(
        "vec_id", F.col("n_near").alias("nn2"), F.col("kept").alias("k2")
    )
    return one.join(two, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("k1") == 0, 1).otherwise(0))
        .cast("long")
        .alias("dropped"),
        F.sum(F.when(F.col("k1") != F.col("k2"), 1).otherwise(0))
        .cast("long")
        .alias("kept_mismatch"),
        F.sum(F.when(F.col("nn1") != F.col("nn2"), 1).otherwise(0))
        .cast("long")
        .alias("near_mismatch"),
    )


# ------------------------------------- trained-IVF multiprobe (recall knob)

_TMP_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]
_TMP_NPROBES = (1, 2, 4)
_TMP_K = 5
#: same fixed-K design point as p_ivf_pq_rerank_trained
_TMP_CLUSTERS, _TMP_ITERS = 16, 2


@register(
    "p_ivf_trained_multiprobe",
    _sim.ivf_topk_trained_multiprobe_sql(
        _TMP_PROBES, k=_TMP_K, nprobe=2, n_clusters=_TMP_CLUSTERS, iters=_TMP_ITERS
    ),
    tags=("pipeline", "similarity"),
    doc="IVF multiprobe over TRAINED fixed-K cells (VERDICT r11 #7: the "
    "recall knob existed only for the stride path) — each probe ranks the "
    f"K={_TMP_CLUSTERS} model centroids by the assignment's own "
    "squared-L2 key and scans its top-2 cells; probe-cell rank is a "
    "bounded probe-grain window, the model trains once and is shared "
    "with the assignment via model= forwarding "
    "(functions/similarity.ivf_topk_trained_multiprobe)",
)
def q_ivf_trained_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.ivf_topk_trained_multiprobe(
        load_table(spark, sf_dir, "embeddings"),
        _TMP_PROBES,
        k=_TMP_K,
        nprobe=2,
        n_clusters=_TMP_CLUSTERS,
        iters=_TMP_ITERS,
    )


def _trained_nprobe_curve_sql() -> str:
    per_np = []
    for np_ in _TMP_NPROBES:
        per_np.append(
            f"""SELECT {np_} AS nprobe,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST((1000000 * count(*)) // {len(_TMP_PROBES) * _TMP_K} AS BIGINT)
         AS recall_ppm
FROM (SELECT probe_id, neighbor_id
      FROM ({_sim.ivf_topk_trained_multiprobe_sql(
          _TMP_PROBES, k=_TMP_K, nprobe=np_,
          n_clusters=_TMP_CLUSTERS, iters=_TMP_ITERS)}))
  ivf JOIN bf USING (probe_id, neighbor_id)"""
        )
    union = "\nUNION ALL ".join(per_np)
    return f"""
WITH bf AS MATERIALIZED (
  SELECT probe_id, neighbor_id
  FROM ({_sim.brute_force_topk_sql(_TMP_PROBES, k=_TMP_K)})
)
SELECT CAST(nprobe AS BIGINT) AS nprobe, n_hits, recall_ppm FROM ({union})
"""


@register(
    "p_trained_nprobe_recall_curve",
    _trained_nprobe_curve_sql(),
    tags=("pipeline", "similarity", "audit"),
    doc="recall-vs-nprobe curve for the TRAINED fixed-K IVF cells: exact "
    f"recall@{_TMP_K} against the brute-force cosine baseline at nprobe "
    f"= {_TMP_NPROBES} — the accuracy/cost dial of the linear-assignment "
    "path (its stride twin is p_ivf_probe_recall_curve).  Spark arms are "
    "carved from ONE shared model + assignment + max-nprobe scored frame "
    "(the shortlist-curve discipline); recall is monotone non-decreasing "
    "in nprobe by construction (cell sets nest); 3 output rows",
)
def q_trained_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from pyspark.sql import Window

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    bf = track_cached(
        _sim.brute_force_topk(emb, _TMP_PROBES, k=_TMP_K).select(
            "probe_id", "neighbor_id"
        )
    )
    # ONE cosine pass at the widest nprobe via the shared builder; arms
    # filter cell_rank
    scored = track_cached(
        _sim.trained_multiprobe_scored(
            emb,
            _TMP_PROBES,
            nprobe=max(_TMP_NPROBES),
            n_clusters=_TMP_CLUSTERS,
            iters=_TMP_ITERS,
        )
    )
    denom = len(_TMP_PROBES) * _TMP_K
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    out = None
    for np_ in _TMP_NPROBES:
        arm = (
            scored.filter(F.col("cell_rank") <= np_)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _TMP_K)
            .select("probe_id", "neighbor_id")
        )
        frame = arm.join(bf, ["probe_id", "neighbor_id"]).agg(
            F.lit(np_).cast("long").alias("nprobe"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.expr(f"CAST((1000000 * count(1)) div {denom} AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
        out = frame if out is None else out.unionAll(frame)
    return out


@register(
    "p_semantic_dedup_bucketed_trained",
    _sim.semantic_dedup_bucketed_trained_sql(tau=_DROP_TAU),
    tags=("pipeline", "dedup", "similarity"),
    doc="the fully LINEAR SemDeDup: trained fixed-K coarse assignment "
    "(N*K — the p_ivf_pq_rerank_trained design point) + the auto-planes "
    "bucketed scan (pair volume capped at ~64 pairs/vector).  Fixed-K "
    "cells alone are the all-pairs scan's negative control (|cell|=N/K "
    "makes sum(|cell|^2) = N^2/K — p_semantic_dedup_trained measured "
    "92.6x at 30x), but the auto-planes ladder reacts to exactly that "
    "growth: p ~ log2(N/(K*ppv)) climbs logarithmically, so assignment, "
    "bucketing, and scan are ALL O(N) — the one SemDeDup flavor with no "
    f"superlinear stage.  tau={_DROP_TAU} exercises the drop branch; "
    "derived p is a hashed output column "
    "(functions/similarity.semantic_dedup_bucketed_trained)",
)
def q_semantic_dedup_bucketed_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.semantic_dedup_bucketed_trained(
        load_table(spark, sf_dir, "embeddings"), tau=_DROP_TAU
    )


# ------------------------------------- plane-budget sweep (ppv ladder)

_PB_LADDER = (16, 64, 256)


def _ppv_sweep_sql_from(assign_block_sans_with: str) -> str:
    """Three pair-budget arms over ONE shared assignment + ONE shared
    16-plane bucket frame: per arm, the derived plane count, the actual
    candidate-pair volume (the quantity the budget rule caps), and the
    drop count at the audit tau.  Arm CTEs are alias-suffixed siblings in
    one top-level WITH (same-scope duplicate aliases are an error on both
    engines); the npl ladder text comes from the single generator.

    THE one generator of the ppv-ladder text — takes any assignment CTE
    block ending in ``assigned`` (vec_id, e, centroid_id), so the auto-G
    sweep (p_planes_budget_sweep) and the trained sweep
    (p_trained_ppv_sweep, round 13) can never fork the metric."""
    cos = _sim._LIST_COS_SQL
    ctes = [
        assign_block_sans_with,
        # referenced 4x (cellsz + three arms) — DuckDB inlines plain CTEs
        # per reference (the r06 rule), so pin one materialization
        "assigned_m AS MATERIALIZED (SELECT * FROM assigned)",
        "cellsz AS (SELECT count(*) AS c FROM assigned_m GROUP BY centroid_id)",
        f"bkfull AS MATERIALIZED ({_sim.lsh_buckets_sql(16, 64)})",
    ]
    arms = []
    for ppv in _PB_LADDER:
        ctes.append(
            f"npl{ppv} AS MATERIALIZED ({_sim.derive_n_planes_case_sql(ppv)})"
        )
        ctes.append(
            f"""ab{ppv} AS MATERIALIZED (
  SELECT a.vec_id, a.e, a.centroid_id,
         CAST(bkfull.bucket % (1::BIGINT << (SELECT p FROM npl{ppv})) AS BIGINT)
           AS bucket
  FROM assigned_m a JOIN bkfull USING (vec_id)
)"""
        )
        ctes.append(
            f"""cp{ppv} AS (
  SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS cand_pairs
  FROM (SELECT count(*) AS c FROM ab{ppv} GROUP BY centroid_id, bucket)
)"""
        )
        ctes.append(
            f"""dr{ppv} AS (
  SELECT CAST(count(DISTINCT b.vec_id) AS BIGINT) AS dropped
  FROM ab{ppv} a JOIN ab{ppv} b
    ON a.centroid_id = b.centroid_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id
  WHERE round({cos.format(a='a.e', b='b.e')}, 6) >= {_DROP_TAU}
)"""
        )
        arms.append(
            f"""SELECT CAST({ppv} AS BIGINT) AS pairs_per_vec,
       CAST((SELECT p FROM npl{ppv}) AS BIGINT) AS n_planes,
       (SELECT cand_pairs FROM cp{ppv}) AS cand_pairs,
       (SELECT dropped FROM dr{ppv}) AS dropped"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(arms)
        + ") ORDER BY pairs_per_vec"
    )


def _planes_budget_sweep_sql() -> str:
    """The auto-G instance of the ppv-ladder text (the original round-12
    registration — byte-identical through the factoring)."""
    return _ppv_sweep_sql_from(_sim.ivf_assign_2level_sql_ctes(250, None)[len("WITH ") :])


def _ppv_sweep_frame(emb: DataFrame, assigned: DataFrame) -> DataFrame:
    """Spark twin of :func:`_ppv_sweep_sql_from`: the three-arm ladder
    over a supplied (cached) assignment frame — shared by the auto-G and
    trained sweeps so the Spark metric can't fork either."""
    bkfull = track_cached(_sim.lsh_buckets(emb, 16, 64))
    out = None
    for ppv in _PB_LADDER:
        p = _sim.derive_n_planes(assigned, ppv)
        ab = track_cached(
            assigned.join(bkfull, "vec_id").select(
                "vec_id",
                "e",
                "centroid_id",
                (F.col("bucket") % F.lit(1 << p)).cast("long").alias("bucket"),
            )
        )
        cp = ab.groupBy("centroid_id", "bucket").agg(
            F.count(F.lit(1)).alias("c")
        ).agg(
            F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
            .cast("long")
            .alias("cand_pairs")
        )
        # per-row norm hoist (r13-opt, see _semantic_scan): one dot per pair
        abn = ab.withColumn("en", F.sqrt(_sim.dot_col(F.col("e"), F.col("e"))))
        a = abn.select(
            "centroid_id", "bucket", F.col("vec_id").alias("a_id"),
            F.col("e").alias("ae"), F.col("en").alias("na"),
        )
        b = abn.select(
            "centroid_id", "bucket", F.col("vec_id").alias("b_id"),
            F.col("e").alias("be"), F.col("en").alias("nb"),
        )
        dr = (
            a.join(b, ["centroid_id", "bucket"])
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(
                F.round(
                    _sim.dot_col(F.col("ae"), F.col("be"))
                    / (F.col("na") * F.col("nb")),
                    6,
                ) >= _DROP_TAU
            )
            .agg(F.countDistinct("b_id").cast("long").alias("dropped"))
        )
        arm = (
            cp.crossJoin(F.broadcast(dr))
            .select(
                F.lit(ppv).cast("long").alias("pairs_per_vec"),
                F.lit(p).cast("long").alias("n_planes"),
                "cand_pairs",
                "dropped",
            )
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("pairs_per_vec")


@register(
    "p_planes_budget_sweep",
    _planes_budget_sweep_sql(),
    tags=("pipeline", "dedup", "sweep"),
    doc="pair-budget ladder for the auto-planes rule: at pairs_per_vec = "
    f"{_PB_LADDER}, the derived plane count, the ACTUAL candidate-pair "
    "volume (the quantity the budget caps — tighter budgets must never "
    "raise it), and the drop count at the audit tau (retention falls as "
    "planes split true near-pairs) — the accuracy/cost dial of the "
    "bucketed scan, measured not assumed.  ONE shared auto-G assignment "
    "and ONE shared 16-plane bucket frame feed all arms (bucket bits are "
    "prefix-stable, so each arm is a mask); 3 output rows",
)
def q_planes_budget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    assigned = track_cached(_sim.ivf_assign_2level(emb, 250, None))
    return _ppv_sweep_frame(emb, assigned)


@register(
    "p_semantic_dedup_incremental_bucketed",
    _sim.semantic_dedup_incremental_sql(tau=_DROP_TAU, n_batches=2, n_planes=4),
    tags=("pipeline", "dedup", "similarity", "incremental"),
    doc="the incremental ingest fold composed with the bucketed scan — "
    "the production shape for a continuously-arriving corpus: each batch "
    "scans only the (cell, LSH bucket) groups it touches.  The "
    "hyperplanes are corpus-INDEPENDENT literals, so bucketing preserves "
    "batch-split invariance EXACTLY (the plane count is frozen with the "
    "centroid set — changing it is a reindex, not an ingest); the state "
    f"carries the bucket column through the driver hash.  tau={_DROP_TAU} "
    "exercises drops (functions/similarity.semantic_dedup_ingest)",
)
def q_semantic_dedup_incremental_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _sim.semantic_dedup_incremental(
        load_table(spark, sf_dir, "embeddings"),
        tau=_DROP_TAU,
        n_batches=2,
        n_planes=4,
    )


def _trained_fullscan_sql(tau: float) -> str:
    """Trained fixed-K assignment + the UNBUCKETED within-cell scan at
    ``tau`` — single-sourced from pipeline_r11's builder (the same
    _TR_K/_TR_ITERS design point as p_semantic_dedup_trained), projected
    to (vec_id, kept) by the agreement wrapper."""
    from kafka_replicator_spark.queries.pipeline_r11 import (
        _semantic_dedup_trained_sql,
    )

    return _semantic_dedup_trained_sql(tau)


@register(
    "p_semdedup_trained_bucketed_agreement",
    f"""
WITH fullscan AS MATERIALIZED (
  SELECT vec_id, kept FROM ({_trained_fullscan_sql(_DROP_TAU)})
),
bucketed AS MATERIALIZED (
  SELECT vec_id, kept, n_planes
  FROM ({_sim.semantic_dedup_bucketed_trained_sql(tau=_DROP_TAU)})
),
j AS (
  SELECT f.kept AS kept_full, b.kept AS kept_bucketed, b.n_planes
  FROM fullscan f JOIN bucketed b USING (vec_id)
)
{_agreement_tail_sql()}
""",
    tags=("pipeline", "dedup", "eval"),
    doc="retention audit of the fully LINEAR flavor: the trained-cell "
    f"FULL scan vs the trained-cell auto-planes bucketed scan at "
    f"tau={_DROP_TAU} — the bucketed pair set is a subset, so the 2x2 "
    "degenerates to drop_retention_ppm + counts; K=16 cells are much "
    "larger than auto-G's (N/16 vs ~stride), so the derived plane count "
    "and the retention floor both differ from "
    "p_semdedup_bucketed_auto_agreement — this row is the linear "
    "flavor's own measured accuracy cost",
)
def q_semdedup_trained_bucketed_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = track_cached(load_table(spark, sf_dir, "embeddings"))
    assigned = track_cached(
        _sim.ivf_assign_trained(emb, n_clusters=16, iters=2)
    )
    full = _sim._semantic_scan(assigned, _DROP_TAU).select(
        "vec_id", F.col("kept").alias("kept_full")
    )
    # compose the bucketed arm from the SAME cached assignment (review
    # pass 2: semantic_dedup_bucketed_trained would re-train the k-means
    # from scratch) — identical semantics by construction
    p = _sim.derive_n_planes(assigned)
    ab = assigned.join(_sim.lsh_buckets(emb, p), "vec_id")
    buck = (
        _sim._semantic_scan(ab, _DROP_TAU, keys=("centroid_id", "bucket"))
        .select(
            "vec_id",
            F.col("kept").alias("kept_bucketed"),
            F.lit(p).cast("long").alias("n_planes"),
        )
    )
    return _agreement_agg(full.join(buck, "vec_id"))


# ------------------------------------- shared-SQL surface + analytics

_DAY_US = 86_400_000_000


@register(
    "a_grubbs_price",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY day
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sq
  FROM d
),
dev AS (
  SELECT day, abs(CAST(m.n AS HUGEINT) * cents - m.s) AS adev FROM d, m
),
mx AS (SELECT max(adev) AS mdev FROM dev)
SELECT m.n AS n_days,
       CAST((SELECT min(day) FROM dev, mx WHERE adev = mdev) AS BIGINT)
         AS outlier_day,
       CAST((1000000 * (m.n - 1) * (SELECT mdev * mdev FROM mx))
            // (m.n * (m.n * m.sq - m.s * m.s)) AS BIGINT) AS g2_ppm
FROM m
""",
    tags=("analytics", "stats"),
    doc="Grubbs outlier statistic over daily revenue: G^2 = "
    "max(x - mean)^2 / s^2 as ONE exact integer ratio — "
    "G2 = (n-1)*max(n*x - S)^2 / (n*(n*sum(x^2) - S^2)) with cents via "
    "floor(x*100+0.5), every fold HUGEINT/DECIMAL-lifted (max|n*x-S|^2 "
    "reaches ~1e24), outlier_day = min day attaining the max deviation "
    "(deterministic tie-break).  Completes the outlier-test family next "
    "to a_jarque_bera_price (moments) and a_pettitt_changepoint (ranks); "
    "1 output row",
)
def q_grubbs_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
                "day"
            ),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    from kafka_replicator_spark.cacheutil import track_cached

    d = track_cached(d)
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq"),
    )
    dev = d.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        "s",
        "sq",
        F.abs(F.col("n").cast("decimal(38,0)") * F.col("cents") - F.col("s")).alias(
            "adev"
        ),
    )
    from kafka_replicator_spark.cacheutil import track_cached as _tc

    dev = _tc(dev)
    mx = dev.agg(F.max("adev").alias("mdev"))
    outlier = (
        dev.join(F.broadcast(mx), dev.adev == mx.mdev)
        .agg(F.min("day").alias("outlier_day"))
    )
    return (
        m.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(outlier))
        .select(
            F.col("n").alias("n_days"),
            F.col("outlier_day").cast("long").alias("outlier_day"),
            F.expr(
                "CAST((1000000 * (n - 1) * (mdev * mdev))"
                " div (n * (n * sq - s * s)) AS BIGINT)"
            ).alias("g2_ppm"),
        )
    )
