"""Round-13 pipeline queries.

First entry: the drift-triggered RETRAIN DECISION over a persisted
coarse-quantizer model (VERDICT r12 #2 — the index-build vs serve split).
A production 100 TB continuously-ingesting index trains its kmeans model
ONCE at build time (here: on the index-build-time half of the corpus, the
vectors with vec_id below the midpoint) and persists it; the serve side
loads the frozen artifact, assigns ALL current vectors against it, and
periodically asks "has the corpus drifted enough under each frozen cell
that the cell should retrain?".  The drift statistic is the
centroid-shift recipe (p_dedup_centroid_shift / p_split_centroid_shift)
applied per cell: squared L2 between the frozen centroid and the cell's
CURRENT member mean, both in exact integer micro-units.  The policy is a
literal-threshold relative gate — retrain the cells whose drift exceeds
1.2x the mean cell drift (pure integer comparison:
``10 * shift * K > 12 * total``) — with the absolute statistic shipped
alongside so an absolute gate can be calibrated from the same output.

The Spark side drives the REAL persisted path end-to-end: kmeans_train →
save_kmeans_model (self-describing parquet artifact) → load_kmeans_model
→ ivf_assign_trained(model=loaded) — save→load→assign is bit-identical
to assigning from the in-lineage frame (the artifact stores the exact
micro-derived doubles), so the DuckDB oracle replays the whole chain
relationally with the shared kmeans/assignment builders.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import similarity as _sim
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

# ------------------------------------------ persisted-model retrain gate

#: the index-build-time corpus: vectors below the vec_id midpoint
#: (lo + span // 2 with span = hi - lo + 1 — the incremental family's
#: integer-division bound rule, replayed by the scalar subquery below)
_HALF_REL = (
    "(SELECT vec_id, embedding FROM embeddings WHERE vec_id < "
    "(SELECT min(vec_id) + ((max(vec_id) - min(vec_id) + 1) // 2) "
    "FROM embeddings))"
)

_RETRAIN_K = 8
_RETRAIN_ITERS = 2


def _retrain_decision_sql() -> str:
    """Half-corpus kmeans model (shared builders, rel-parameterized) +
    full-corpus frozen assignment + per-cell centroid-shift + the
    relative retrain gate."""
    return f"""
{_sim.kmeans_model_sql_ctes(_RETRAIN_K, _RETRAIN_ITERS, rel=_HALF_REL)},
embfull AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
assignedf AS (
  SELECT vec_id, e, cluster AS centroid_id FROM (
    SELECT f.vec_id, f.e, m.cluster,
           row_number() OVER (
             PARTITION BY f.vec_id
             ORDER BY list_dot_product(f.e, f.e) - 2 * list_dot_product(f.e, cd)
                      + list_dot_product(cd, cd) ASC,
                      m.cluster ASC
           ) AS rn
    FROM embfull f, model m
  ) WHERE rn = 1
),
frozen AS (
  SELECT cluster, dim,
         CAST(floor(s_micro / CAST(n_members AS DOUBLE) + 0.5) AS BIGINT) AS mu_frozen
  FROM s{_RETRAIN_ITERS}
),
cur AS (
  SELECT centroid_id, CAST(t.dim AS BIGINT) AS dim,
         CAST(sum(CAST(floor(e[t.dim] * 1e6 + 0.5) AS BIGINT)) // count(*) AS BIGINT) AS mu_cur,
         count(*) AS n
  FROM assignedf, range(1, 65) t(dim)
  GROUP BY 1, 2
),
per AS MATERIALIZED (
  SELECT c.centroid_id AS cluster, CAST(min(c.n) AS BIGINT) AS n_members_now,
         CAST(sum((c.mu_cur - f.mu_frozen) * (c.mu_cur - f.mu_frozen)) AS BIGINT)
           AS shift_sq_micro2
  FROM cur c JOIN frozen f ON f.cluster = c.centroid_id AND f.dim = c.dim
  GROUP BY 1
),
tot AS (SELECT sum(shift_sq_micro2) AS t FROM per)
SELECT cluster, n_members_now, shift_sq_micro2,
       CAST(CASE WHEN 10 * shift_sq_micro2 * {_RETRAIN_K} > 12 * t
            THEN 1 ELSE 0 END AS INTEGER) AS retrain
FROM per, tot
"""


@register(
    "p_model_retrain_decision",
    _retrain_decision_sql(),
    tags=("pipeline", "similarity", "model"),
    doc="drift-triggered retrain/keep decision over a PERSISTED kmeans "
    "coarse-quantizer model (VERDICT r12 #2): train on the index-build-"
    "time half of the corpus (vec_id below the integer midpoint), "
    "save_kmeans_model → load_kmeans_model (the Spark side runs the real "
    "parquet artifact roundtrip — bit-identical by the micro-derived-"
    "double contract), assign the FULL corpus against the frozen model, "
    "then per cell: squared-L2 centroid shift between the frozen "
    "centroid and the cell's current member mean in exact integer "
    "micro-units, and a literal relative gate (retrain iff "
    "10*shift*K > 12*total — drift above 1.2x the mean cell drift; both "
    "branches fire at every tested scale).  The absolute statistic "
    "ships alongside the flag so an absolute gate can be calibrated "
    "(functions/similarity.save_kmeans_model, .load_kmeans_model; the "
    "reference has no model lifecycle — this is the 100 TB serve-path "
    "addition the north-star mandate calls for)",
)
def q_model_retrain_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    mid = int(lo) + (int(hi) - int(lo) + 1) // 2
    half = emb.filter(F.col("vec_id") < mid)
    kt = track_cached(
        _sim.kmeans_train(half, k=_RETRAIN_K, iters=_RETRAIN_ITERS)
    )
    # the REAL persisted path: save the trained model, load it back, and
    # assign from the LOADED frame (the artifact dir must outlive this
    # function — the returned frame is lazy, so no cleanup here; k rows)
    path = tempfile.mkdtemp(prefix="krs_model_") + "/kmeans"
    _sim.save_kmeans_model(
        _sim.kmeans_model_from_train(kt), path,
        n_clusters=_RETRAIN_K, iters=_RETRAIN_ITERS, dim=64,
    )
    loaded, meta = _sim.load_kmeans_model(spark, path)
    assert meta["n_clusters"] == _RETRAIN_K
    assigned = _sim.ivf_assign_trained(
        emb, n_clusters=_RETRAIN_K, model=loaded
    )
    dims = assigned.select(
        "centroid_id",
        F.posexplode(
            F.transform("e", lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long"))
        ).alias("dim0", "v"),
    )
    cur = dims.groupBy(
        "centroid_id", (F.col("dim0") + 1).cast("long").alias("dim")
    ).agg(
        F.expr("CAST(sum(v) div count(1) AS BIGINT)").alias("mu_cur"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    per = (
        cur.join(kt, (cur.centroid_id == kt.cluster) & (cur.dim == kt.dim))
        .groupBy("centroid_id")
        .agg(
            F.min("n").cast("long").alias("n_members_now"),
            F.sum(
                (F.col("mu_cur") - F.col("centroid_micro"))
                * (F.col("mu_cur") - F.col("centroid_micro"))
            )
            .cast("long")
            .alias("shift_sq_micro2"),
        )
        .select(
            F.col("centroid_id").alias("cluster"),
            "n_members_now",
            "shift_sq_micro2",
        )
    )
    per = track_cached(per)  # 8 rows; consumed twice (total + flag)
    tot = per.agg(F.sum("shift_sq_micro2").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "cluster",
        "n_members_now",
        "shift_sq_micro2",
        (
            F.lit(10) * F.col("shift_sq_micro2") * F.lit(_RETRAIN_K)
            > F.lit(12) * F.col("t")
        )
        .cast("int")
        .alias("retrain"),
    )
