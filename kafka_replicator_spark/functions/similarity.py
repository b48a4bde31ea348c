"""Similarity search over an embedding column (``array<float>``).

Two tiers, mirroring what a 100 TB pipeline needs:

  * **brute-force cosine top-k** — the exactness baseline: broadcast the
    (small) probe set against the corpus, one pass, no shuffle of the
    corpus side.  Cost O(N·P); correct at any scale where P is small.
  * **sign-LSH (random hyperplanes)** — the scale path: bucket every vector
    by the sign pattern of P hyperplane projections (one map pass), then
    search only within the probe's bucket.  Hyperplane weights are
    deterministic integers derived in Python (seeded), so the DuckDB oracle
    reproduces the buckets exactly.

All float math is double-precision with identical evaluation order on both
engines (sequential fold over the array), so cosine values are bit-equal.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _spread_emb(embeddings: DataFrame) -> DataFrame:
    from kafka_replicator_spark.functions.hashing import spread

    return spread(embeddings)


def _dbl(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order — matches DuckDB's
    list_dot_product evaluation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b)))


def brute_force_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    The probe side is broadcast; the corpus never shuffles.  Ranking ties
    are broken by neighbor id for determinism.
    """
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    pairs = emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_col(F.col("pe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def brute_force_topk_sql(probe_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id IN ({ids})),
scored AS (
  SELECT probe_id, vec_id AS neighbor_id,
         list_dot_product(pe, e)
           / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(e, e))) AS cos
  FROM emb, probes WHERE vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------------- sign-LSH

def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic integer hyperplane weights in [-7, 7], seeded by
    md5(plane:dim) — computed driver-side in Python, embedded as literals in
    both engines' plans, so bucket assignment is engine-independent.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 15) - 7)
        planes.append(row)
    return planes


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p of the bucket = [e·w_p >= 0]."""
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(hyperplanes(n_planes, dim)):
        w = F.array(*[F.lit(float(x)) for x in plane])
        proj = dot_col(F.col("e"), w)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.select("vec_id", bucket.alias("bucket"))


def lsh_buckets_sql(n_planes: int = 8, dim: int = 64) -> str:
    terms = []
    for p, plane in enumerate(hyperplanes(n_planes, dim)):
        arr = "[" + ", ".join(f"{x}.0" for x in plane) + "]"
        terms.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}::DOUBLE[]) >= 0 "
            f"THEN {1 << p} ELSE 0 END"
        )
    expr = " + ".join(terms)
    return f"SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM embeddings"


def ann_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the probe's
    LSH bucket.  At scale the bucket join replaces the N·P cross product
    with bucket-local candidate sets (expected N/2^planes per bucket).
    """
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    buckets = lsh_buckets(embeddings, n_planes, dim)
    # probes + candidates both read this subtree; cache beats 2× recompute
    emb_b = emb.join(buckets, "vec_id").cache()
    probes = emb_b.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"), "bucket"
    )
    cands = emb_b.join(F.broadcast(probes), ["bucket"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_col(F.col("pe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def ann_topk_sql(probe_ids: list[int], k: int = 5, n_planes: int = 8, dim: int = 64) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
buckets AS ({lsh_buckets_sql(n_planes, dim)}),
emb_b AS (SELECT emb.vec_id, e, bucket FROM emb JOIN buckets USING (vec_id)),
probes AS (SELECT vec_id AS probe_id, e AS pe, bucket FROM emb_b WHERE vec_id IN ({ids})),
scored AS (
  SELECT probe_id, c.vec_id AS neighbor_id,
         list_dot_product(pe, e)
           / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(e, e))) AS cos
  FROM emb_b c JOIN probes USING (bucket) WHERE c.vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: only pairs that
    collide in a bucket are scored (the embedding analog of MinHash-LSH)."""
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    emb_b = emb.join(lsh_buckets(embeddings, n_planes, dim), "vec_id").cache()
    a = emb_b.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), "bucket")
    b = emb_b.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def embedding_neardup_pairs_sql(threshold: float = 0.95, n_planes: int = 8, dim: int = 64) -> str:
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
buckets AS ({lsh_buckets_sql(n_planes, dim)}),
emb_b AS (SELECT emb.vec_id, e, bucket FROM emb JOIN buckets USING (vec_id))
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
FROM emb_b a JOIN emb_b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e)
       / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= {threshold}
"""


# ------------------------------------------------------------- IVF-style

def ivf_assign(embeddings: DataFrame, centroid_stride: int = 250) -> DataFrame:
    """IVF coarse quantization with deterministic centroids: every
    ``centroid_stride``-th vector by id serves as a centroid (a k-means-free
    stand-in with the same plan shape — swap in trained centroids without
    touching the query).  Assignment = argmax cosine over the broadcast
    centroid set; one map pass over the corpus, no shuffle.
    """
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    cents = emb.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "e",
        "centroid_id",
        cosine_col(F.col("e"), F.col("ce")).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5, centroid_stride: int = 250
) -> DataFrame:
    """IVF search: rank candidates only within the probe's coarse cell
    (nprobe=1).  The scale path when buckets must follow the data
    distribution rather than random hyperplanes."""
    assigned = ivf_assign(embeddings, centroid_stride).cache()  # probes + cands
    probes = assigned.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"), "centroid_id"
    )
    cands = assigned.join(F.broadcast(probes), ["centroid_id"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_col(F.col("pe"), F.col("e")).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def ivf_topk_sql(probe_ids: list[int], k: int = 5, centroid_stride: int = 250) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, e AS ce FROM emb WHERE vec_id % {centroid_stride} = 0),
assigned AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT emb.vec_id, emb.e, cents.centroid_id,
           row_number() OVER (
             PARTITION BY emb.vec_id
             ORDER BY list_dot_product(e, ce)
                      / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(ce, ce))) DESC,
                      centroid_id ASC
           ) AS rn
    FROM emb, cents
  ) WHERE rn = 1
),
probes AS (SELECT vec_id AS probe_id, e AS pe, centroid_id FROM assigned WHERE vec_id IN ({ids})),
scored AS (
  SELECT probe_id, c.vec_id AS neighbor_id,
         list_dot_product(pe, e)
           / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(e, e))) AS cos
  FROM assigned c JOIN probes USING (centroid_id) WHERE c.vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""
