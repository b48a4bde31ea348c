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
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions.litfast import (
    lit_doubles,
    lit_doubles2d,
    lit_longs,
)


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


def dot_int_col(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two integer-array columns (micro-unit /
    int8-quantized vectors) — the integer sibling of :func:`dot_col`.
    Every query folding an integer dot MUST use this (anisotropy,
    separability, quantized top-k) so the fold can never silently fork."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b)))


def brute_force_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    The probe side is broadcast; the corpus never shuffles.  Ranking ties
    are broken by neighbor id for determinism.
    """
    # per-row norm hoist: sqrt(dot(e,e)) once per corpus row / probe row
    # instead of once per (probe, candidate) pair — identical IEEE value
    # (same per-operand fold; float multiply is commutative)
    norm = F.sqrt(dot_col(F.col("e"), F.col("e")))
    emb = _spread_emb(embeddings).select(
        "vec_id", _dbl("embedding").alias("e")
    ).withColumn("en", norm)
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"),
        F.col("en").alias("pn"),
    )
    pairs = emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
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


def dot_topk(embeddings: DataFrame, probe_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k neighbors by RAW dot product (no normalization) — the
    norm-sensitive ranking MIPS systems serve; :func:`brute_force_topk` is
    the cosine twin.  Same plan shape: probes broadcast, corpus never
    shuffles, ties broken by neighbor id."""
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    pairs = emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        dot_col(F.col("pe"), F.col("e")).alias("dp"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("dp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("dp", 6).alias("dot"))
    )


def dot_topk_sql(probe_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id IN ({ids})),
scored AS (
  SELECT probe_id, vec_id AS neighbor_id, list_dot_product(pe, e) AS dp
  FROM emb, probes WHERE vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, dp,
         row_number() OVER (PARTITION BY probe_id ORDER BY dp DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(dp, 6) AS dot
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
        w = lit_doubles(float(x) for x in plane)
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
    # probes + candidates both read this subtree; cache beats 2× recompute.
    # The per-row norm rides in the cache so the bucket-local scoring folds
    # ONE dot per pair (identical IEEE value — see brute_force_topk).
    emb_b = track_cached(
        emb.join(buckets, "vec_id").withColumn(
            "en", F.sqrt(dot_col(F.col("e"), F.col("e")))
        )
    )
    probes = emb_b.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"), "bucket",
        F.col("en").alias("pn"),
    )
    cands = emb_b.join(F.broadcast(probes), ["bucket"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
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
    # per-row norm hoist: one dot per bucket-collision pair (see
    # brute_force_topk); the norm rides the cached bucket frame
    emb_b = track_cached(
        emb.join(lsh_buckets(embeddings, n_planes, dim), "vec_id").withColumn(
            "en", F.sqrt(dot_col(F.col("e"), F.col("e")))
        )
    )
    a = emb_b.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), "bucket",
        F.col("en").alias("na"),
    )
    b = emb_b.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), "bucket",
        F.col("en").alias("nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_col(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
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

    MEASURED CAVEAT (tools/scale_bench.py, round 8): the stride rule grows
    the centroid count WITH the corpus, so this flat
    every-vector-vs-every-centroid scoring is N²/stride — 173x wall at
    100x corpus in the SemDeDup harness.  Fine below ~10^5 vectors per
    executor; past that, use :func:`ivf_assign_2level` (hierarchical
    assignment, 22.8x at 100x) or a fixed trained centroid count.
    """
    # per-row norm hoist: each vector's norm folds once, not once per
    # centroid; each centroid's norm rides the broadcast (identical IEEE
    # value — same per-operand fold, float multiply is commutative)
    norm = F.sqrt(dot_col(F.col("e"), F.col("e")))
    emb = _spread_emb(embeddings).select(
        "vec_id", _dbl("embedding").alias("e")
    ).withColumn("en", norm)
    cents = emb.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce"),
        F.col("en").alias("cn"),
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "e",
        "centroid_id",
        (dot_col(F.col("e"), F.col("ce")) / (F.col("en") * F.col("cn"))).alias("ccos"),
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
    assigned = track_cached(ivf_assign(embeddings, centroid_stride))  # probes + cands
    an = assigned.withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    probes = an.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"), "centroid_id",
        F.col("en").alias("pn"),
    )
    cands = an.join(F.broadcast(probes), ["centroid_id"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def ivf_assign_sql_ctes(centroid_stride: int = 250) -> str:
    """The emb/cents/assigned CTE block mirroring :func:`ivf_assign` —
    shared by every oracle that starts from the coarse assignment
    (ivf_topk, semantic dedup, the sweep, the balance audit) so the
    assignment rule can never silently diverge between oracles."""
    return f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
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
)"""


def ivf_topk_sql(probe_ids: list[int], k: int = 5, centroid_stride: int = 250) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
{ivf_assign_sql_ctes(centroid_stride)},
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


# ------------------------------------------------------- k-means training

def _kmeans_inline_final_sums(
    embeddings: DataFrame,
    k: int,
    iters: int,
    snapshots: dict[int, list[tuple[int, int, int, int]]] | None = None,
) -> list[tuple[int, int, int, int]] | None:
    """THE one driver-driven inline Lloyd loop (VERDICT r12 #4), shared by
    :func:`kmeans_train` and :func:`kmeans_model`: each iteration's
    centroids are K rows of metadata, so they are collected and embedded
    as literal arrays, and the per-vector argmin is ONE whole-stage-codegen
    map expression (``array_min`` over a transform of the K cells) — no
    N·K row inflation, no groupBy(vec_id) shuffle, no join-back.

    Returns the FINAL iteration's per-(cluster, dim) integer component
    sums as driver rows ``[(cluster, dim, s_micro, n_members), ...]``
    sorted by (cluster, dim) — every downstream model/centroid derivation
    is a pure-integer driver fold over them — or ``None`` on an empty
    corpus (empty literal arrays have no type; callers fall back to the
    window/join path, which reproduces the empty output).

    One collect per iteration (k·dim rows each) plus the k-row init
    collect; bit-identity with the window path is pinned by
    test_kmeans_train_inline_matches_window_path.

    ``snapshots`` (r13 optimization): a caller-owned dict that receives
    {iter_count: final sums after that many iterations} for every key it
    is pre-seeded with — a Lloyd run at ``iters`` computes every prefix's
    sums anyway (each iteration's collect feeds the next centroids), so
    an iteration-ladder consumer trains ONCE instead of once per rung;
    each prefix's sums are exactly the sums its own shorter run returns.
    """
    w_init = Window.orderBy("vec_id")
    emb = track_cached(  # scanned once per iteration; tracked so sweep/
        # bench harnesses can release it between queries (this loop
        # materializes it EAGERLY at construction via the init collect)
        _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("long").alias("cluster"),
            F.transform(
                "e", lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long")
            ).alias("cm"),
        )
    )
    cm_rows = sorted(
        (int(r["cluster"]), [int(m) for m in r["cm"]]) for r in cents.collect()
    )
    if not cm_rows:
        return None
    final: list[tuple[int, int, int, int]] = []
    for it in range(iters):
        cds = [[m / 1e6 for m in cm] for _, cm in cm_rows]
        # litfast renderings are bit-identical to F.lit (see litfast.py)
        # and ~150x cheaper to construct — this ran once per iteration
        ids = lit_longs(c for c, _ in cm_rows)
        cdl = lit_doubles2d(cds)
        ccs = lit_doubles(_py_dot(cd, cd) for cd in cds)
        scored_arr = F.transform(
            F.sequence(F.lit(0), F.lit(len(cm_rows) - 1)),
            lambda i: F.struct(
                (
                    F.col("ee")
                    - 2 * dot_col(F.col("e"), F.get(cdl, i))
                    + F.get(ccs, i)
                ).alias("d"),
                F.get(ids, i).cast("long").alias("c"),
            ),
        )
        assigned = (
            emb.withColumn("ee", dot_col(F.col("e"), F.col("e")))
            .select("vec_id", "e", F.array_min(scored_arr)["c"].alias("cluster"))
        )
        sums = (
            assigned.select("cluster", F.posexplode("e").alias("dim0", "x"))
            .groupBy("cluster", (F.col("dim0") + 1).cast("long").alias("dim"))
            .agg(
                F.sum(
                    F.floor(F.col("x") * 1e6 + F.lit(0.5)).cast("long")
                ).alias("s_micro"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        final = sorted(
            (int(r["cluster"]), int(r["dim"]), int(r["s_micro"]), int(r["n_members"]))
            for r in sums.collect()
        )
        if snapshots is not None and (it + 1) in snapshots:
            snapshots[it + 1] = list(final)
        if it < iters - 1:
            # next round's centroids: the integer mean mirrors the column
            # expression exactly (long→double conversion on BOTH operands,
            # then divide)
            cm_rows = _next_round_cm(final)
    return final


def _next_round_cm(
    final: list[tuple[int, int, int, int]],
) -> list[tuple[int, list[int]]]:
    """The next Lloyd round's integer micro centroids from one round's
    (cluster, dim, s_micro, n_members) sums — the rounding mean
    ``floor(s/n + 0.5)`` with BOTH operands converted to double first,
    mirroring the column expression exactly (shared by the single-arm and
    fused inline loops)."""
    by_c: dict[int, dict[int, tuple[int, int]]] = {}
    for c, d, s, n in final:
        by_c.setdefault(c, {})[d] = (s, n)
    return sorted(
        (
            c,
            [
                math.floor(float(comps[d][0]) / float(comps[d][1]) + 0.5)
                for d in sorted(comps)
            ],
        )
        for c, comps in by_c.items()
    )


def _kmeans_inline_final_sums_fused(
    embeddings: DataFrame,
    arm_filters: list[Column | None],
    k: int,
    iters: int,
) -> list[list[tuple[int, int, int, int]] | None]:
    """The inline Lloyd loop of :func:`_kmeans_inline_final_sums` trained
    over SEVERAL filter-arms of ONE corpus at once (r13 optimization —
    the retrain-audit queries train a frozen half-corpus model AND a
    full-corpus model back to back, paying two cached scans and two sum
    jobs per iteration for sums one job can produce):

    * one shared spread+cached (vec_id, e) scan — each arm is a FILTER on
      the cache (``None`` = the whole corpus), so the half-corpus arm
      stops materializing its own copy of the corpus;
    * per iteration, each arm's assignment keeps the EXACT single-arm
      expression (its own literal centroid arrays, the same
      ``ee − 2·e·c + c·c`` fold, the same ``array_min`` tie-break) — the
      arms are unionByName'd with an arm tag and the component sums fold
      in ONE ``groupBy(arm, cluster, dim)`` job instead of one job per
      arm.  Integer sums are associative, so splitting them by ``arm``
      cannot change any arm's sums: every arm's final sums are
      BIT-IDENTICAL to its own :func:`_kmeans_inline_final_sums` run
      (pinned by test_kmeans_models_fused_matches_separate).

    Returns one final-sums list per arm (``None`` for an empty arm —
    callers fall back to the per-arm path, which reproduces the empty
    output).
    """
    base = track_cached(  # ONE cached corpus scan shared by every arm
        _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    )
    arms = [base if f is None else base.filter(f) for f in arm_filters]
    # the init collects fuse into ONE job too: each arm's first-k frame is
    # tagged and unioned, and row_number partitions by arm — identical
    # rows per arm to the single-arm init (the global window over a k-row
    # frame IS the per-arm window over that arm's k rows)
    tagged_init = None
    for t, fr in enumerate(arms):
        part = fr.orderBy("vec_id").limit(k).select(
            F.lit(t).cast("int").alias("arm"), "vec_id", "e"
        )
        tagged_init = (
            part if tagged_init is None else tagged_init.unionByName(part)
        )
    w_init = Window.partitionBy("arm").orderBy("vec_id")
    cents = tagged_init.select(
        "arm",
        (F.row_number().over(w_init) - 1).cast("long").alias("cluster"),
        F.transform(
            "e", lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long")
        ).alias("cm"),
    )
    rows_by_arm: dict[int, list[tuple[int, list[int]]]] = {}
    for r in cents.collect():
        rows_by_arm.setdefault(int(r["arm"]), []).append(
            (int(r["cluster"]), [int(m) for m in r["cm"]])
        )
    cm_by_arm: list[list[tuple[int, list[int]]] | None] = [
        sorted(rows_by_arm.get(t, [])) or None for t in range(len(arms))
    ]
    finals: list[list[tuple[int, int, int, int]] | None] = [None] * len(arms)
    live = [t for t in range(len(arms)) if cm_by_arm[t]]
    if not live:
        return finals
    for it in range(iters):
        tagged = None
        for t in live:
            cm_rows = cm_by_arm[t]
            cds = [[m / 1e6 for m in cm] for _, cm in cm_rows]
            ids = lit_longs(c for c, _ in cm_rows)
            cdl = lit_doubles2d(cds)
            ccs = lit_doubles(_py_dot(cd, cd) for cd in cds)
            scored_arr = F.transform(
                F.sequence(F.lit(0), F.lit(len(cm_rows) - 1)),
                lambda i: F.struct(
                    (
                        F.col("ee")
                        - 2 * dot_col(F.col("e"), F.get(cdl, i))
                        + F.get(ccs, i)
                    ).alias("d"),
                    F.get(ids, i).cast("long").alias("c"),
                ),
            )
            part = (
                arms[t]
                .withColumn("ee", dot_col(F.col("e"), F.col("e")))
                .select(
                    F.lit(t).cast("int").alias("arm"),
                    "e",
                    F.array_min(scored_arr)["c"].alias("cluster"),
                )
            )
            tagged = part if tagged is None else tagged.unionByName(part)
        sums = (
            tagged.select("arm", "cluster", F.posexplode("e").alias("dim0", "x"))
            .groupBy(
                "arm", "cluster", (F.col("dim0") + 1).cast("long").alias("dim")
            )
            .agg(
                F.sum(
                    F.floor(F.col("x") * 1e6 + F.lit(0.5)).cast("long")
                ).alias("s_micro"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        per_arm: dict[int, list[tuple[int, int, int, int]]] = {t: [] for t in live}
        for r in sums.collect():
            per_arm[int(r["arm"])].append(
                (int(r["cluster"]), int(r["dim"]), int(r["s_micro"]), int(r["n_members"]))
            )
        for t in live:
            finals[t] = sorted(per_arm[t])
            if it < iters - 1:
                cm_by_arm[t] = _next_round_cm(finals[t])
    return finals


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    inline: bool | None = None,
) -> DataFrame:
    """Lloyd's k-means over the embedding corpus in pure DataFrame ops —
    the trainer that turns ``ivf_assign``'s stride-picked stand-in centroids
    into data-driven ones (nothing else in the IVF query changes).

    Determinism across engines (the part float arithmetic would break):

    * init: the ``k`` smallest ``vec_id`` vectors, cluster = id rank
    * assignment: squared-L2 argmin decomposed as e.e - 2 e.c + c.c, each
      dot an in-order sequential fold (identical IEEE op order on both
      engines); ties break to the smaller cluster
    * update: component sums in exact integer micro-units
      (floor(x*1e6 + 0.5) as BIGINT) — associative, so shuffle/partial-agg
      order can't change the result — then one double division per
      component, re-quantized to micro-units for the next round

    Each iteration = one broadcast of k centroids (metadata-scale) + one
    shuffle of the dim-exploded corpus; iterations are a fixed small count,
    the standard big-data k-means shape.  The per-dim explode (64×) keeps
    the oracle SQL a literal mirror; the explode-free flavor (64 aggregate
    columns) is a drop-in if the 64× shuffle ever dominates.

    Returns the final long-format model: one row per (cluster, dim) with
    the integer micro-unit centroid component and the cluster's member
    count — integer-only output, no float compare anywhere.

    ``inline`` (default: auto — on when k·dim ≤ 65536 literals) is the
    VERDICT r12 #4 restructuring of the training constant: each
    iteration's centroids are K rows of metadata, so they are COLLECTED
    (init once + one k·dim-row collect per non-final iteration) and the
    per-vector argmin becomes one whole-stage-codegen map expression —
    the N·K row_number window (a full shuffle+sort of N·K rows carrying
    the 64-double vectors, per iteration) disappears entirely; the only
    remaining per-iteration shuffle is the map-side-combined
    groupBy(cluster, dim) component-sum agg.  Bit-identity with the
    window path: cd = cm/1e6 is the same IEEE divide driver-side, the
    distance is the identical ``ee − 2·e·c + c·c`` fold chain
    (:func:`_py_dot` for c·c over the identical doubles), ``array_min``
    over (d, c) structs replays the (dist asc, cluster asc) tie-break,
    and the next-round integer mean ``floor(s/n + 0.5)`` is the same
    long→double division on both sides.  The SQL oracle is unchanged.
    Pinned by the inline-vs-window bit-identity test.
    """
    if inline is None:
        inline = k * dim <= 65536
    if inline:
        rows = _kmeans_inline_final_sums(embeddings, k, iters)
        if rows is not None:
            # the final sums are k·dim rows of METADATA, already collected
            # by the driver-driven loop — return them as a LOCAL relation
            # so every downstream consumer (model fold, save, the inline
            # assignment's collect, broadcast joins) pays ZERO Spark jobs
            # instead of re-running the final training job per
            # materialization.  centroid_micro is the same rounding mean,
            # driver-side: float(s)/float(n) mirrors the column's
            # long→double division exactly (both operands converted first).
            data = [
                (c, d, math.floor(float(s) / float(n) + 0.5), n)
                for c, d, s, n in rows
            ]
            sc = embeddings.sparkSession.sparkContext
            return embeddings.sparkSession.createDataFrame(
                sc.parallelize(data, 1),
                "cluster long, dim long, centroid_micro long, n_members long",
            )
        inline = False  # empty corpus: empty literals have no type
    w_init = Window.orderBy("vec_id")
    emb = track_cached(  # scanned once per iteration
        _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w_init) - 1).cast("long").alias("cluster"),
            F.transform(
                "e", lambda x: F.floor(x * 1e6 + F.lit(0.5)).cast("long")
            ).alias("cm"),
        )
    )
    sums = None
    for _ in range(iters):
        cd = F.transform(F.col("cm"), lambda m: m / F.lit(1e6))
        scored = emb.join(F.broadcast(cents)).select(
            "vec_id",
            "e",
            "cluster",
            (
                dot_col(F.col("e"), F.col("e"))
                - 2 * dot_col(F.col("e"), cd)
                + dot_col(cd, cd)
            ).alias("dist"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cluster"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "e", "cluster")
        )
        sums = (
            assigned.select("cluster", F.posexplode("e").alias("dim0", "x"))
            .groupBy("cluster", (F.col("dim0") + 1).cast("long").alias("dim"))
            .agg(
                F.sum(F.floor(F.col("x") * 1e6 + F.lit(0.5)).cast("long")).alias("s_micro"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
        mean_micro = F.floor(F.col("s_micro") / F.col("n_members").cast("double") + F.lit(0.5)).cast("long")
        cents = (
            sums.withColumn("m_micro", mean_micro)
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m_micro"))),
                    lambda s: s["m_micro"],
                ).alias("cm")
            )
        )
    return sums.select(
        "cluster",
        "dim",
        F.floor(F.col("s_micro") / F.col("n_members").cast("double") + F.lit(0.5))
        .cast("long")
        .alias("centroid_micro"),
        F.col("n_members").cast("long").alias("n_members"),
    )


def kmeans_train_sql(
    k: int = 8, iters: int = 2, dim: int = 64, rel: str = "embeddings"
) -> str:
    """Unrolled-iteration oracle: c0 → (assign → sum → centroid)ⁿ, a
    literal SQL mirror of the Spark plan above.  ``rel`` lets a composed
    oracle train on a different relation (a vec_id-bounded subquery — the
    retrain-decision query trains on the index-build-time half of the
    corpus); the default text is byte-identical to the pre-param form."""
    d1 = dim + 1
    parts = [
        f"emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {rel})",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster,
         list_transform(e, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS cm
  FROM emb ORDER BY vec_id LIMIT {k}
)""",
    ]
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        parts.append(f"""a{it} AS (
  SELECT vec_id, e, cluster FROM (
    SELECT emb.vec_id, emb.e, c.cluster,
           row_number() OVER (
             PARTITION BY emb.vec_id
             ORDER BY list_dot_product(e, e)
                      - 2 * list_dot_product(e, list_transform(cm, m -> m / 1000000.0))
                      + list_dot_product(list_transform(cm, m -> m / 1000000.0),
                                         list_transform(cm, m -> m / 1000000.0)) ASC,
                      c.cluster ASC
           ) AS rn
    FROM emb, {prev} c
  ) WHERE rn = 1
)""")
        parts.append(f"""s{it} AS (
  SELECT cluster, CAST(t.dim AS BIGINT) AS dim,
         SUM(CAST(floor(e[t.dim] * 1e6 + 0.5) AS BIGINT)) AS s_micro,
         COUNT(*) AS n_members
  FROM a{it}, range(1, {d1}) t(dim)
  GROUP BY 1, 2
)""")
        parts.append(f"""c{it} AS (
  SELECT cluster,
         list(CAST(floor(s_micro / CAST(n_members AS DOUBLE) + 0.5) AS BIGINT)
              ORDER BY dim) AS cm
  FROM s{it} GROUP BY cluster
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cluster, dim,
       CAST(floor(s_micro / CAST(n_members AS DOUBLE) + 0.5) AS BIGINT) AS centroid_micro,
       CAST(n_members AS BIGINT) AS n_members
FROM s{iters}
"""
    )


def kmeans_model_from_train(train: DataFrame) -> DataFrame:
    """Fold a :func:`kmeans_train` long-format frame (cluster, dim,
    centroid_micro, n_members) into the broadcast-ready (cluster, cd)
    model shape — THE one micro→double conversion, shared by
    :func:`kmeans_model` and callers that keep the long frame around
    (the retrain-decision query joins the frozen micro components AND
    assigns from the same single training run)."""
    return train.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid_micro"))),
            lambda s: s["centroid_micro"] / F.lit(1e6),
        ).alias("cd")
    )


def _model_rows_from_sums(
    rows: list[tuple[int, int, int, int]],
) -> list[tuple[int, list[float]]]:
    """(cluster, dim, s_micro, n_members) driver rows → (cluster, cd)
    model rows: the SAME rounding mean floor(s/n + 0.5) and micro→double
    division (``m / 1e6``) as :func:`kmeans_model_from_train`'s column
    expressions — float(s)/float(n) and int/1e6 are the identical IEEE
    ops driver-side."""
    by_c: dict[int, dict[int, tuple[int, int]]] = {}
    for c, d, s, n in rows:
        by_c.setdefault(c, {})[d] = (s, n)
    return sorted(
        (
            c,
            [
                math.floor(float(comps[d][0]) / float(comps[d][1]) + 0.5) / 1e6
                for d in sorted(comps)
            ],
        )
        for c, comps in by_c.items()
    )


def kmeans_model(
    embeddings: DataFrame, n_clusters: int = 8, iters: int = 2, dim: int = 64
) -> DataFrame:
    """The trained centroid table as broadcast-ready DOUBLE arrays:
    (cluster, cd) from :func:`kmeans_train`'s integer micro-unit
    components divided once — THE one Spark-side builder of the model
    frame, shared by :func:`ivf_assign_trained` and the inertia audits.

    Inline regime (k·dim ≤ 65536, the same gate as :func:`kmeans_train`):
    the model is folded driver-side from the collected final sums and
    returned as a LOCAL k-row relation — consumers' collects and
    broadcasts pay no recompute and need no cache."""
    if n_clusters * dim <= 65536:
        rows = _kmeans_inline_final_sums(embeddings, n_clusters, iters)
        if rows is not None:
            sc = embeddings.sparkSession.sparkContext
            return embeddings.sparkSession.createDataFrame(
                sc.parallelize(_model_rows_from_sums(rows), 1),
                "cluster long, cd array<double>",
            )
    return kmeans_model_from_train(
        kmeans_train(embeddings, k=n_clusters, iters=iters, dim=dim, inline=False)
    )


def kmeans_models_fused(
    embeddings: DataFrame,
    arm_filters: list[Column | None],
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> list[DataFrame]:
    """One :func:`kmeans_model` per filter-arm of ONE corpus, trained over
    a single shared cached scan with the per-iteration component-sum jobs
    fused across arms (:func:`_kmeans_inline_final_sums_fused`) — the r13
    optimization for the retrain-audit queries, which train a frozen
    half-corpus model and a full-corpus model back to back.  Each arm's
    model is BIT-IDENTICAL to its own :func:`kmeans_model` call (same
    per-row expressions, associative integer sums, same driver fold);
    outside the inline regime (or for an empty arm) it falls back to the
    per-arm path, which reproduces the same output by the existing
    bit-identity pins.  ``None`` in ``arm_filters`` means the whole
    corpus."""
    spark = embeddings.sparkSession

    def _arm_frame(f: Column | None) -> DataFrame:
        return embeddings if f is None else embeddings.filter(f)

    if n_clusters * dim <= 65536:
        finals = _kmeans_inline_final_sums_fused(
            embeddings, arm_filters, n_clusters, iters
        )
        return [
            spark.createDataFrame(
                spark.sparkContext.parallelize(_model_rows_from_sums(rows), 1),
                "cluster long, cd array<double>",
            )
            if rows is not None
            else kmeans_model(
                _arm_frame(f), n_clusters=n_clusters, iters=iters, dim=dim
            )
            for f, rows in zip(arm_filters, finals)
        ]
    return [
        kmeans_model(_arm_frame(f), n_clusters=n_clusters, iters=iters, dim=dim)
        for f in arm_filters
    ]


def kmeans_models_prefix(
    embeddings: DataFrame,
    iters_list: list[int],
    n_clusters: int = 8,
    dim: int = 64,
) -> list[DataFrame]:
    """One :func:`kmeans_model` per iteration count in ``iters_list``
    from a SINGLE inline training run at ``max(iters_list)`` (r13
    optimization — the inertia-descent ladder trained once per rung):
    Lloyd's loop computes every prefix's component sums on the way to the
    deepest rung, so each rung's model is folded from the snapshot its
    own shorter run would have returned — bit-identical by construction
    (same init, same per-iteration expressions; pinned by
    test_kmeans_models_prefix_matches_separate).  Rungs the snapshot
    cannot serve (iters < 1, empty corpus, outside the inline regime)
    fall back to their own :func:`kmeans_model` call."""
    spark = embeddings.sparkSession
    if n_clusters * dim <= 65536 and iters_list and max(iters_list) >= 1:
        snaps: dict[int, list[tuple[int, int, int, int]]] = {
            i: [] for i in iters_list if i >= 1
        }
        rows = _kmeans_inline_final_sums(
            embeddings, n_clusters, max(iters_list), snapshots=snaps
        )
        if rows is not None:
            return [
                spark.createDataFrame(
                    spark.sparkContext.parallelize(
                        _model_rows_from_sums(snaps[i]), 1
                    ),
                    "cluster long, cd array<double>",
                )
                if i >= 1
                else kmeans_model(embeddings, n_clusters=n_clusters, iters=i, dim=dim)
                for i in iters_list
            ]
    return [
        kmeans_model(embeddings, n_clusters=n_clusters, iters=i, dim=dim)
        for i in iters_list
    ]


def kmeans_model_sql_ctes(
    n_clusters: int = 8, iters: int = 2, dim: int = 64, rel: str = "embeddings"
) -> str:
    """Open WITH block ending in ``model`` = (cluster, cd) — the SQL twin
    of :func:`kmeans_model` (kmeans_train_sql's unrolled body + the model
    list), shared by :func:`ivf_assign_trained_sql_ctes` and the inertia
    audits so the model derivation is single-sourced.  ``rel`` forwards to
    :func:`kmeans_train_sql` (byte-identical default)."""
    km = kmeans_train_sql(k=n_clusters, iters=iters, dim=dim, rel=rel)
    body = km.partition("WITH ")[2].rpartition("\nSELECT cluster, dim,")[0]
    return f"""WITH {body},
model AS (
  SELECT cluster,
         list(CAST(floor(s_micro / CAST(n_members AS DOUBLE) + 0.5) AS BIGINT) / 1000000.0
              ORDER BY dim) AS cd
  FROM s{iters} GROUP BY cluster
)"""


def save_kmeans_model(
    model: DataFrame, path: str, n_clusters: int, iters: int, dim: int
) -> None:
    """Persist a trained coarse-quantizer model (VERDICT r12 #2 — the
    index-build vs serve split): a production 100 TB continuously-ingesting
    index trains ONCE at build time and every serve/ingest path loads the
    frozen artifact; before this, the model only lived inside a query's
    lineage and "frozen" meant re-deriving it per session.

    The artifact is a SELF-DESCRIBING parquet table: one row per cluster
    with (cluster BIGINT, cd ARRAY<DOUBLE>, k INT, iters INT, dim INT) —
    the training hyperparameters ride as constant metadata columns, so
    load needs no sidecar and the table remains queryable by any engine.
    Doubles roundtrip bit-exactly through parquet, and the model
    components are integer micro-units divided once (:func:`kmeans_model`),
    so save→load→assign is BIT-IDENTICAL to assigning from the in-lineage
    frame (pinned by the roundtrip test).  k rows = metadata scale; one
    file via coalesce(1).

    Raises if ``model`` is not the (cluster, cd) shape with exactly
    ``n_clusters`` rows of ``dim`` components — the ivf_assign_trained
    ``model=`` guard applied at WRITE time, where a bad artifact would
    otherwise poison every future load.
    """
    row = model.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("cd")).alias("dmin"),
        F.max(F.size("cd")).alias("dmax"),
    ).collect()[0]
    if row["n"] != n_clusters or row["dmin"] != dim or row["dmax"] != dim:
        raise ValueError(
            f"save_kmeans_model: expected {n_clusters} clusters of dim {dim}; "
            f"got {row['n']} rows with dim range [{row['dmin']}, {row['dmax']}]"
        )
    (
        model.select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("cd").cast("array<double>").alias("cd"),
            F.lit(n_clusters).cast("int").alias("k"),
            F.lit(iters).cast("int").alias("iters"),
            F.lit(dim).cast("int").alias("dim"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_kmeans_model(spark, path: str) -> tuple[DataFrame, dict[str, int]]:
    """Load a :func:`save_kmeans_model` artifact: returns the (cluster, cd)
    model frame (feed it to ``ivf_assign_trained(model=...)`` /
    ``trained_multiprobe_scored(model=...)``) plus the training metadata
    ``{"n_clusters", "iters", "dim"}`` read from the artifact's constant
    metadata columns.  Validates internal consistency (exactly one
    metadata tuple; row count == k) so a corrupt or mixed-write artifact
    fails at load, not silently mis-assigns at serve time."""
    df = spark.read.parquet(path)
    # ONE validation job: metadata uniqueness, row count and cd-length
    # bounds from a single aggregate over the k-row artifact
    row = df.agg(
        F.count_distinct(F.struct("k", "iters", "dim")).alias("n_meta"),
        F.min("k").alias("k"),
        F.min("iters").alias("iters"),
        F.min("dim").alias("dim"),
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("cd")).alias("dmin"),
        F.max(F.size("cd")).alias("dmax"),
    ).collect()[0]
    if row["n_meta"] != 1:
        raise ValueError(
            f"load_kmeans_model: {path} holds {row['n_meta']} distinct metadata "
            "tuples — not a single saved model"
        )
    meta = {
        "n_clusters": int(row["k"]),
        "iters": int(row["iters"]),
        "dim": int(row["dim"]),
    }
    model = df.select("cluster", "cd")
    if row["n"] != meta["n_clusters"]:
        raise ValueError(
            f"load_kmeans_model: artifact claims k={meta['n_clusters']} but "
            f"holds {row['n']} cluster rows"
        )
    # the save-side shape guard applied at LOAD too: rows whose cd length
    # contradicts the dim metadata would null-poison downstream distance
    # folds and silently mis-assign at serve time
    if row["dmin"] != meta["dim"] or row["dmax"] != meta["dim"]:
        raise ValueError(
            f"load_kmeans_model: artifact claims dim={meta['dim']} but cd "
            f"lengths span [{row['dmin']}, {row['dmax']}]"
        )
    return model, meta


def kmeans_model_as_centroids(model: DataFrame) -> DataFrame:
    """Adapt a (cluster, cd) kmeans model to the frozen-centroid shape
    (centroid_id, ce) that :func:`ivf_assign_frozen` /
    :func:`semantic_dedup_ingest` consume — the loaded artifact drives the
    incremental SemDeDup ingest directly (the persisted-model serve
    path)."""
    return model.select(
        F.col("cluster").cast("long").alias("centroid_id"), F.col("cd").alias("ce")
    )


def _py_dot(a: list[float], b: list[float]) -> float:
    """Driver-side sequential-fold dot product — the EXACT Python twin of
    :func:`dot_col` (in-order ``acc + x*y`` over IEEE doubles), so a
    centroid self-dot computed here is bit-identical to the JVM fold over
    the same collected components."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def ivf_assign_trained(
    embeddings: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
    model: DataFrame | None = None,
    inline_model: bool | None = None,
) -> DataFrame:
    """Assign every vector to its nearest TRAINED k-means centroid — the
    fixed-K coarse quantizer that makes IVF assignment LINEAR in the corpus
    (N·K with K a constant), vs the stride rule whose centroid count grows
    with the corpus (``vec_id % stride`` ⇒ C = N/stride, so even the
    two-level assignment is N·√C = N^1.5 — the one superlinear curve
    VERDICT r10 flagged).  This is FAISS IVF's actual design: nlist is
    fixed at deployment, training cost is iters·N·K, assignment is one
    broadcast of the k×dim model + a map-side argmin per vector.

    Determinism matches :func:`kmeans_train` / :func:`ivf_topk_trained`
    exactly: squared-L2 decomposed as e·e − 2·e·c + c·c with each dot an
    in-order sequential fold, centroid components exact integer micro-units
    divided once to DOUBLE, ties to the smaller cluster id.  The argmin is
    a map-side ``min(struct(dist, cluster))`` partial aggregation — no
    N·K-row shuffle; the SQL oracle's row_number window replays it exactly
    (same ordering key).

    Returns (vec_id, e, centroid_id) — the same frame shape as
    :func:`ivf_assign` / :func:`ivf_assign_2level`, so the IVFPQ chain and
    the SemDeDup scan compose unchanged.  ``model`` lets a caller that
    already materialized (and typically cached) the :func:`kmeans_model`
    frame share it instead of paying the training iterations twice (the
    multiprobe path ranks probe cells against the same model).

    ``inline_model`` (default: auto — on when K·dim ≤ 65536 literals) is
    the VERDICT r12 #4 restructuring of the serve-path hot spot: the
    k-row model is collected ONCE (metadata scale — the same frame the
    persisted-artifact path materializes anyway) and embedded as literal
    arrays, and the argmin becomes ONE whole-stage-codegen map expression
    per vector (``array_min`` over a transform of the K cells) — no N·K
    row inflation, no groupBy(vec_id) shuffle, no join-back.  The plan
    drops from two N-row exchanges to ZERO.  Output is bit-identical to
    the join path: the distance is the same ``ee − 2·e·c + c·c`` with the
    same in-order folds (``ee`` hoisted to a column — the same double the
    per-row fold produced K times; ``c·c`` folded driver-side by
    :func:`_py_dot`, IEEE-identical over the identical collected
    components), and ``array_min`` over (d, c) structs is exactly the
    lexicographic ``min(struct(dist, cluster))`` tie-break.  The SQL
    oracle is unchanged (its row_number window replays the same ordering
    key).  Pinned by the inline-vs-join bit-identity test.
    """
    if inline_model is None:
        inline_model = n_clusters * dim <= 65536
    rows = None
    if model is None and inline_model:
        # in-lineage training: fold the model rows driver-side from the
        # shared inline loop — no intermediate model frame, no collect
        sums = _kmeans_inline_final_sums(embeddings, n_clusters, iters)
        if sums is not None:
            rows = _model_rows_from_sums(sums)
    if model is None and rows is None:
        cents = kmeans_model(embeddings, n_clusters=n_clusters, iters=iters, dim=dim)
    elif not inline_model:
        # the forwarding contract: the supplied frame must be the model the
        # n_clusters param claims — a k-mismatched (or foreign-corpus) frame
        # would silently assign against the wrong cells (the minhash_bands
        # sig= guard's spirit; one count job on a k-row, typically cached
        # frame).  The inline path enforces the same contract on its
        # collected rows below — no separate count job.
        n_model = model.count()
        if n_model != n_clusters:
            raise ValueError(
                f"ivf_assign_trained(model=...) expects a {n_clusters}-row "
                f"kmeans_model frame; supplied frame has {n_model} clusters"
            )
        cents = model
    else:
        cents = model
    emb = track_cached(
        _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    )
    if inline_model and rows is None:
        rows = sorted(
            (int(r["cluster"]), [float(x) for x in r["cd"]])
            for r in cents.select("cluster", "cd").collect()
        )
        if model is not None and len(rows) != n_clusters:
            raise ValueError(
                f"ivf_assign_trained(model=...) expects a {n_clusters}-row "
                f"kmeans_model frame; supplied frame has {len(rows)} clusters"
            )
        if not rows:
            # degenerate empty-corpus model: an empty literal array has no
            # inferable type — the join path reproduces the (empty) output
            inline_model = False
    if inline_model:
        ids = lit_longs(c for c, _ in rows)
        cds = lit_doubles2d(cd for _, cd in rows)
        ccs = lit_doubles(_py_dot(cd, cd) for _, cd in rows)
        scored = F.transform(
            F.sequence(F.lit(0), F.lit(len(rows) - 1)),
            lambda i: F.struct(
                (
                    F.col("ee")
                    - 2 * dot_col(F.col("e"), F.get(cds, i))
                    + F.get(ccs, i)
                ).alias("d"),
                F.get(ids, i).cast("long").alias("c"),
            ),
        )
        return (
            emb.withColumn("ee", dot_col(F.col("e"), F.col("e")))
            .select("vec_id", "e", F.array_min(scored)["c"].alias("centroid_id"))
        )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "cluster",
        (
            dot_col(F.col("e"), F.col("e"))
            - 2 * dot_col(F.col("e"), F.col("cd"))
            + dot_col(F.col("cd"), F.col("cd"))
        ).alias("dist"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct(F.col("dist").alias("d"), F.col("cluster").alias("c"))).alias("b")
    )
    return emb.join(
        best.select("vec_id", F.col("b.c").alias("centroid_id")), "vec_id"
    ).select("vec_id", "e", "centroid_id")


def ivf_topk_trained(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 2,
) -> DataFrame:
    """IVF search over TRAINED centroids: assign every vector to its
    nearest k-means centroid (:func:`ivf_assign_trained` — squared-L2,
    same decomposed fold as the trainer), then rank candidates only within
    the probe's cell — the end-to-end trained flavor of ``ivf_topk``.
    Model and corpus stay DataFrames throughout; the k×dim model
    broadcasts."""
    assigned = track_cached(
        ivf_assign_trained(embeddings, n_clusters=n_clusters, iters=iters)
    )  # probes + candidates
    an = assigned.withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    probes = an.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"), "centroid_id",
        F.col("en").alias("pn"),
    )
    cands = an.join(F.broadcast(probes), ["centroid_id"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    ranked = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos_sim"))
    )


def ivf_assign_trained_sql_ctes(
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
    rel: str = "embeddings",
    assign_rel: str | None = None,
) -> str:
    """Open WITH block ending in ``assigned`` = (vec_id, e, centroid_id):
    the trained fixed-K coarse assignment mirroring
    :func:`ivf_assign_trained` — kmeans_train_sql's unrolled iterations,
    the model list, and the per-vector argmin (row_number window replaying
    the Spark side's map-side ``min(struct(dist, cluster))`` — identical
    ordering key, identical tie-break).  THE one generator of the trained
    assignment text, shared by ivf_topk_trained_sql and the trained IVFPQ
    oracle so the rule can never silently diverge.

    ``rel`` forwards to the kmeans builder (train on a subquery relation);
    ``assign_rel`` assigns a DIFFERENT relation against that model — the
    frozen serve path (train on the index-build-time corpus, assign the
    current one).  Both default to the byte-identical original text."""
    if assign_rel is None:
        return f"""{kmeans_model_sql_ctes(n_clusters, iters, dim, rel=rel)},
assigned AS (
  SELECT vec_id, e, cluster AS centroid_id FROM (
    SELECT emb.vec_id, emb.e, m.cluster,
           row_number() OVER (
             PARTITION BY emb.vec_id
             ORDER BY list_dot_product(e, e) - 2 * list_dot_product(e, cd)
                      + list_dot_product(cd, cd) ASC,
                      m.cluster ASC
           ) AS rn
    FROM emb, model m
  ) WHERE rn = 1
)"""
    return f"""{kmeans_model_sql_ctes(n_clusters, iters, dim, rel=rel)},
emba AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM {assign_rel}),
assigned AS (
  SELECT vec_id, e, cluster AS centroid_id FROM (
    SELECT f.vec_id, f.e, m.cluster,
           row_number() OVER (
             PARTITION BY f.vec_id
             ORDER BY list_dot_product(f.e, f.e) - 2 * list_dot_product(f.e, cd)
                      + list_dot_product(cd, cd) ASC,
                      m.cluster ASC
           ) AS rn
    FROM emba f, model m
  ) WHERE rn = 1
)"""


def ivf_topk_trained_sql(
    probe_ids: list[int], k: int = 5, n_clusters: int = 8, iters: int = 2, dim: int = 64
) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
{ivf_assign_trained_sql_ctes(n_clusters, iters, dim)},
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


# ------------------------------------------------- int8 quantized search

def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``q_i = floor(x_i * 127 /
    max|x| + 0.5)`` — the storage/compute scale path for ANN (4× smaller
    vectors, integer SIMD dot products on real hardware).

    ``floor(v + 0.5)`` is used instead of ``round`` deliberately: Spark and
    DuckDB disagree on round-half semantics, but evaluate this floor form
    bit-identically, so the quantized vectors are engine-exact integers.
    All-zero vectors quantize to zeros (scale is null-guarded).
    """
    emb = _spread_emb(embeddings).select("vec_id", _dbl("embedding").alias("e"))
    scale = F.nullif(F.array_max(F.transform(F.col("e"), F.abs)), F.lit(0.0))
    return emb.select(
        "vec_id",
        F.transform(
            F.col("e"),
            lambda x: F.coalesce(
                F.floor(x * F.lit(127.0) / scale + F.lit(0.5)), F.lit(0)
            ).cast("long"),
        ).alias("qe"),
        F.round(F.coalesce(scale, F.lit(0.0)), 6).alias("scale"),
    )


def quantized_topk(embeddings: DataFrame, probe_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k by integer dot product over int8-quantized vectors —
    the quantized analog of ``brute_force_topk``; scores are exact BIGINTs
    so ranking is engine-deterministic with no float rounding at all.
    """
    q = quantize_embeddings(embeddings).select("vec_id", "qe")
    probes = q.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("qe").alias("pq")
    )
    pairs = q.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        dot_int_col(F.col("pq"), F.col("qe")).alias("qdot"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qdot")
    )


#: the scaled/q CTE pair WITHOUT the leading emb CTE — for oracles that
#: already define emb (e.g. via ivf_assign_sql_ctes) and must not repeat
#: the CTE name; single-sourced so the quantization rule text cannot fork
_QUANT_SCALED_Q = """scaled AS (
  SELECT vec_id, e,
         nullif(list_aggregate(list_transform(e, x -> abs(x)), 'max'), 0.0) AS s
  FROM emb
),
q AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(coalesce(floor(x * 127.0 / s + 0.5), 0) AS BIGINT)) AS qe,
         round(coalesce(s, 0.0), 6) AS scale
  FROM scaled
)"""


def _quantized_sql_cte() -> str:
    return f"""
emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_QUANT_SCALED_Q}"""


def quantized_topk_sql(probe_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH {_quantized_sql_cte()},
probes AS (SELECT vec_id AS probe_id, qe AS pq FROM q WHERE vec_id IN ({ids})),
scored AS (
  SELECT probe_id, q.vec_id AS neighbor_id,
         CAST(list_dot_product(pq::DOUBLE[], qe::DOUBLE[]) AS BIGINT) AS qdot
  FROM q, probes WHERE q.vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, qdot,
         row_number() OVER (PARTITION BY probe_id ORDER BY qdot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, qdot
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------- product quantization

def _l2_int_arrays(a, b):
    """Exact squared L2 between two int arrays as a BIGINT fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_subvectors(embeddings: DataFrame, m: int = 8, dim: int = 64) -> DataFrame:
    """Split int8-quantized vectors into ``m`` subvectors: one row per
    (vec_id, subspace s, sub array) — the shared front half of the PQ
    family (pq_topk, pq_distortion)."""
    d_sub = dim // m
    q = quantize_embeddings(embeddings).select("vec_id", "qe")
    return q.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("s"),
                    F.slice("qe", s * d_sub + 1, d_sub).alias("sub"),
                ),
            )
        ).alias("x"),
    ).select("vec_id", "x.s", "x.sub")


def pq_code_assign(subs: DataFrame, code_entries: DataFrame) -> DataFrame:
    """Nearest-codebook-entry assignment per (vec, subspace): broadcast the
    codebook, exact BIGINT L2, deterministic code_id tiebreak.  Returns
    (vec_id, s, code_id, cdist) — ``cdist`` is the per-subspace squared
    quantization error the distortion audit aggregates.

    r13-opt note: a map-side ``min(struct(cdist, code_id))`` aggregate
    (the ivf_assign_2level idiom) was tried here and measured 1.8x WORSE
    at 30x corpus (18.8 -> 34.7 s in the p_ivf_pq_rerank scale kernel):
    struct aggregates compile to SortAggregate, whose interpreted struct
    comparisons cost more per scored pair than the window's UnsafeRow
    sort — the rank window stands."""
    w_assign = Window.partitionBy("vec_id", "s").orderBy(F.asc("cdist"), F.asc("code_id"))
    return (
        subs.join(F.broadcast(code_entries), "s")
        .select(
            "vec_id",
            "s",
            "code_id",
            _l2_int_arrays(F.col("sub"), F.col("csub")).alias("cdist"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code_id", "cdist")
    )


def exact_int8_topk(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5
) -> DataFrame:
    """Exact brute-force top-``k`` neighbors by int8 L2 — THE ANN
    ground-truth recipe (quantize → probe-broadcast corpus scan →
    BIGINT L2 → per-probe rank, ties to the smaller neighbor id),
    single-sourced for every recall/curve eval so two evals can never
    silently measure against different truths.  Probe-bounded broadcast
    scan, never all-pairs.  Returns (probe_id, neighbor_id)."""
    q = quantize_embeddings(embeddings).select("vec_id", "qe")
    probes = q.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("qe").alias("pqe")
    )
    scored = q.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id")).select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        _l2_int_arrays(F.col("pqe"), F.col("qe")).alias("l2"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("l2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id")
    )


def exact_int8_topk_sql_scope(probe_ids: list[int], k: int = 5) -> str:
    """The nested-scope SQL twin of :func:`exact_int8_topk` — the body of
    an ``exact AS MATERIALIZED ( ... )`` CTE (its own WITH scope, so it
    composes beside other IVFPQ chains without alias collisions)."""
    ids = ", ".join(str(i) for i in probe_ids)
    dist = _PQ_DIST_SQL
    return f"""WITH {_quantized_sql_cte()},
  probes AS (SELECT vec_id AS probe_id, qe AS pqe FROM q WHERE vec_id IN ({ids})),
  scored AS (
    SELECT probe_id, q.vec_id AS neighbor_id,
           {dist.format(a='pqe', b='qe')} AS l2
    FROM q, probes WHERE q.vec_id <> probe_id
  )
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id ORDER BY l2 ASC, neighbor_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {k}"""


def pq_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    m: int = 8,
    dim: int = 64,
    code_stride: int = 250,
) -> DataFrame:
    """Product-quantization ADC top-k — the memory-scale tier of the ANN
    family (Jégou et al. 2011): vectors split into ``m`` subspaces, each
    subvector replaced by the id of its nearest codebook entry; search
    scans the (tiny) code table and sums per-subspace distances from a
    lookup, never touching the raw vectors.

    Engine-exact by construction: runs over the int8-quantized vectors
    (``quantize_embeddings`` — floor(x+0.5) is bit-identical cross-engine)
    so every L2 distance is an exact BIGINT; codebooks are deterministic
    (every ``code_stride``-th vector's subvectors, the same k-means-free
    stand-in as ``ivf_assign``).  Asymmetric distance: probes use their own
    quantized subvectors against candidates' codebook entries.

    Scale: codebooks and the probe set broadcast (m × n_codes × 8 ints);
    the corpus side is one map pass to assign codes and one aggregation of
    m partial distances per (probe, candidate) — no corpus shuffle.
    """
    subs = pq_subvectors(embeddings, m=m, dim=dim)
    code_entries = subs.filter(F.col("vec_id") % code_stride == 0).select(
        F.col("vec_id").alias("code_id"), "s", F.col("sub").alias("csub")
    )
    l2 = _l2_int_arrays
    codes = pq_code_assign(subs, code_entries).select("vec_id", "s", "code_id")
    probe_subs = subs.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "s", F.col("sub").alias("psub")
    )
    partials = (
        codes.filter(~F.col("vec_id").isin(probe_ids))
        .join(F.broadcast(probe_subs), "s")
        .join(F.broadcast(code_entries), ["s", "code_id"])
        .select("probe_id", "vec_id", l2(F.col("psub"), F.col("csub")).alias("pd"))
    )
    dists = partials.groupBy("probe_id", "vec_id").agg(F.sum("pd").alias("adc_dist"))
    w_rank = Window.partitionBy("probe_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        dists.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("adc_dist").cast("long").alias("adc_dist"),
        )
    )


#: ||a-b||^2 via three dot products — list_dot_product returns DOUBLE but
#: int8 subvector dots stay far below 2^53, so the BIGINT cast is exact.
#: Shared by pq_topk_sql and pq_distortion_sql so the two oracles can't
#: silently diverge.
_PQ_DIST_SQL = (
    "CAST(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])"
    " - 2 * list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " + list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]) AS BIGINT)"
)


def pq_codes_cte_sql(
    m: int = 8, dim: int = 64, code_stride: int = 250, code_limit: int | None = None
) -> str:
    """The subs/code_entries/codes CTE block (emitted inside an open WITH
    that already defines ``q``) — THE one generator of the PQ code
    assignment text, shared by pq_topk_sql, pq_distortion_sql and the
    IVF+PQ rerank oracle so the assignment rule can never silently diverge
    between oracles.  ``codes`` carries BOTH code_id and cdist; consumers
    project what they need.  ``code_limit`` caps the codebook at the first
    ``code_limit`` stride points (vec_id < stride·limit) — a FIXED-size
    codebook (FAISS PQ's fixed-256 analog) so the corpus-side code
    assignment stays N·m·limit instead of N·m·(N/stride); default ``None``
    keeps the historical unbounded-stride text byte-identical."""
    d_sub = dim // m
    dist = _PQ_DIST_SQL
    cap = (
        f" AND vec_id < {code_stride * code_limit}" if code_limit is not None else ""
    )
    return f"""subs AS (
  SELECT vec_id, s, qe[s * {d_sub} + 1 : s * {d_sub} + {d_sub}] AS sub
  FROM q, (SELECT unnest(range(0, {m})) AS s)
),
code_entries AS (
  SELECT vec_id AS code_id, s, sub AS csub FROM subs WHERE vec_id % {code_stride} = 0{cap}
),
codes AS (
  SELECT vec_id, s, code_id, cdist FROM (
    SELECT subs.vec_id, subs.s, code_entries.code_id,
           {dist.format(a='sub', b='csub')} AS cdist,
           row_number() OVER (
             PARTITION BY subs.vec_id, subs.s
             ORDER BY {dist.format(a='sub', b='csub')} ASC, code_id ASC
           ) AS rn
    FROM subs JOIN code_entries USING (s)
  ) WHERE rn = 1
)"""


def pq_topk_sql(
    probe_ids: list[int], k: int = 5, m: int = 8, dim: int = 64, code_stride: int = 250
) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    dist = _PQ_DIST_SQL
    return f"""
WITH {_quantized_sql_cte()},
{pq_codes_cte_sql(m, dim, code_stride)},
probe_subs AS (
  SELECT vec_id AS probe_id, s, sub AS psub FROM subs WHERE vec_id IN ({ids})
),
partials AS (
  SELECT probe_id, c.vec_id,
         {dist.format(a='psub', b='csub')} AS pd
  FROM codes c
  JOIN probe_subs USING (s)
  JOIN code_entries USING (s, code_id)
  WHERE c.vec_id NOT IN ({ids})
),
dists AS (
  SELECT probe_id, vec_id, CAST(sum(pd) AS BIGINT) AS adc_dist
  FROM partials GROUP BY probe_id, vec_id
),
ranked AS (
  SELECT probe_id, vec_id AS neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY probe_id ORDER BY adc_dist ASC, vec_id ASC) AS rank
  FROM dists
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, adc_dist
FROM ranked WHERE rank <= {k}
"""


def pq_distortion(
    embeddings: DataFrame, m: int = 8, dim: int = 64, code_stride: int = 250
) -> DataFrame:
    """Per-subspace PQ quantization distortion — the "is the codebook any
    good" audit next to pq_topk: mean and max squared L2 between each
    subvector and its assigned codebook entry, exact integer milli-units.

    Same plan as pq_topk's assignment half (shared ``pq_subvectors`` /
    ``pq_code_assign``): one broadcast codebook join + the per-(vec, s)
    argmin window, then an m-row aggregation.  Output (m rows): s,
    n_vectors, mean_err_milli, max_err.
    """
    subs = pq_subvectors(embeddings, m=m, dim=dim)
    code_entries = subs.filter(F.col("vec_id") % code_stride == 0).select(
        F.col("vec_id").alias("code_id"), "s", F.col("sub").alias("csub")
    )
    codes = pq_code_assign(subs, code_entries)
    return codes.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        # DECIMAL lift: the corpus-wide error sum x1000 wraps int64 at scale
        F.expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * sum(cdist)) div count(1) AS BIGINT)"
        ).alias("mean_err_milli"),
        F.max("cdist").cast("long").alias("max_err"),
    )


def pq_distortion_sql(m: int = 8, dim: int = 64, code_stride: int = 250) -> str:
    return f"""
WITH {_quantized_sql_cte()},
{pq_codes_cte_sql(m, dim, code_stride)}
SELECT s, CAST(count(*) AS BIGINT) AS n_vectors,
       CAST((1000 * sum(cdist)) // count(*) AS BIGINT) AS mean_err_milli,
       CAST(max(cdist) AS BIGINT) AS max_err
FROM codes GROUP BY s
"""


# ------------------------------------------------- IVF + PQ with rerank

def ivf_pq_rerank(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    shortlist: int = 20,
    m: int = 8,
    dim: int = 64,
    centroid_stride: int = 250,
    code_stride: int = 250,
    two_level: bool = True,
    coarse_factor: int | None = None,
    coarse_codebook: str = "stride",
    n_clusters: int = 16,
    train_iters: int = 2,
    code_limit: int | None = None,
) -> DataFrame:
    """The composed FAISS-style IVFPQ + refine architecture (Jégou et al.
    2011 §V; the standard billion-scale ANN deployment): IVF coarse cell
    restriction (nprobe=1) → PQ asymmetric-distance scan of the cell →
    exact rerank of the top-``shortlist`` on the int8-quantized vectors.

    Every stage is engine-exact: cell assignment is the deterministic
    argmax of :func:`ivf_assign_2level` (default: auto-G — the measured
    N^1.5 scale path; ``two_level=False`` drops to the flat
    :func:`ivf_assign`, whose N²/stride cost the scale bench exposed);
    ADC distances are BIGINT sums of per-subspace integer L2
    (pq_code_assign); the refine step re-scores only the shortlist with
    full exact integer L2.  Scale shape: the corpus never shuffles —
    codebooks, probe subvectors and probe cells broadcast; the only
    aggregations are per-(probe, candidate) partial-distance sums within
    one coarse cell, and the rerank join touches ``shortlist`` rows per
    probe.

    ``coarse_codebook="trained"`` swaps the stride-derived cells for the
    fixed-K trained codebook (:func:`ivf_assign_trained`) and, with
    ``code_limit``, a fixed-size PQ codebook — the LINEAR assignment path
    (VERDICT r10 #1: the stride rule's centroid count grows with the
    corpus, making even the auto-G assignment N^1.5; a fixed K makes it
    N·K).  The stride rule stays the default for the existing oracles.

    Reference context: the reference engine has no ANN surface — this is
    part of the training-data-pipeline extension (SURVEY.md §6).
    """
    rr = ivf_pq_scored(
        embeddings,
        probe_ids,
        shortlist=shortlist,
        m=m,
        dim=dim,
        centroid_stride=centroid_stride,
        code_stride=code_stride,
        two_level=two_level,
        coarse_factor=coarse_factor,
        coarse_codebook=coarse_codebook,
        n_clusters=n_clusters,
        train_iters=train_iters,
        code_limit=code_limit,
    )
    w_rank = Window.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("l2_dist").cast("long").alias("l2_dist"),
        )
    )


def ivf_pq_scored(
    embeddings: DataFrame,
    probe_ids: list[int],
    shortlist: int = 20,
    m: int = 8,
    dim: int = 64,
    centroid_stride: int = 250,
    code_stride: int = 250,
    two_level: bool = True,
    coarse_factor: int | None = None,
    coarse_codebook: str = "stride",
    n_clusters: int = 16,
    train_iters: int = 2,
    code_limit: int | None = None,
    prefilter_label: bool = False,
) -> DataFrame:
    """The IVFPQ candidate frame the rerank and its tuning curves share:
    per (probe_id, neighbor_id) the ADC shortlist rank (``adc_rank`` <=
    ``shortlist``) and the exact int8 L2 (``l2_dist``) — THE one
    implementation of the cell-restrict -> ADC-scan -> exact-rescore
    chain, so the top-k query and the shortlist-sensitivity curve can
    never fork (see :func:`ivf_pq_rerank` for the architecture notes,
    incl. the ``coarse_codebook="trained"`` / ``code_limit`` linear
    assignment path).

    ``prefilter_label=True`` is the filter-AWARE search mode (VERDICT r10
    #4): candidates are restricted to the probe's own ``label`` BEFORE
    the ADC ranking, so the shortlist is spent entirely on qualifying
    rows — a selective filter can no longer empty it, the failure mode
    p_ivfpq_label_filtered documents for naive post-filtering.  The
    label lookup is a corpus-map join plus a broadcast of the bounded
    probe-label frame."""
    if coarse_codebook == "trained":
        assigned = track_cached(
            ivf_assign_trained(
                embeddings, n_clusters=n_clusters, iters=train_iters, dim=dim
            )
        )
    else:
        assigned = track_cached(
            ivf_assign_2level(embeddings, centroid_stride, coarse_factor)
            if two_level
            else ivf_assign(embeddings, centroid_stride)
        )
    probes_cell = assigned.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "centroid_id"
    )
    cands = (
        assigned.join(F.broadcast(probes_cell), ["centroid_id"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
    )
    if prefilter_label:
        lab = embeddings.select("vec_id", "label")
        plab = lab.filter(F.col("vec_id").isin(probe_ids)).select(
            F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
        )
        cands = (
            cands.join(lab, "vec_id")
            .join(F.broadcast(plab), "probe_id")
            .filter(F.col("label") == F.col("plabel"))
            .select("probe_id", "vec_id")
        )
    subs = pq_subvectors(embeddings, m=m, dim=dim)
    code_filter = F.col("vec_id") % code_stride == 0
    if code_limit is not None:
        code_filter = code_filter & (F.col("vec_id") < code_stride * code_limit)
    code_entries = subs.filter(code_filter).select(
        F.col("vec_id").alias("code_id"), "s", F.col("sub").alias("csub")
    )
    codes = pq_code_assign(subs, code_entries).select("vec_id", "s", "code_id")
    probe_subs = subs.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "s", F.col("sub").alias("psub")
    )
    partials = (
        cands.join(codes, "vec_id")
        .join(F.broadcast(probe_subs), ["probe_id", "s"])
        .join(F.broadcast(code_entries), ["s", "code_id"])
        .select("probe_id", "vec_id", _l2_int_arrays(F.col("psub"), F.col("csub")).alias("pd"))
    )
    adc = partials.groupBy("probe_id", "vec_id").agg(F.sum("pd").alias("adc_dist"))
    w_short = Window.partitionBy("probe_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    short = (
        adc.withColumn("adc_rank", F.row_number().over(w_short))
        .filter(F.col("adc_rank") <= shortlist)
        .select("probe_id", "vec_id", "adc_rank")
    )
    q = quantize_embeddings(embeddings).select("vec_id", "qe")
    probe_q = q.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("qe").alias("pqe")
    )
    return (
        short.join(q, "vec_id")
        .join(F.broadcast(probe_q), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("adc_rank").cast("int").alias("adc_rank"),
            _l2_int_arrays(F.col("pqe"), F.col("qe")).alias("l2_dist"),
        )
    )


def ivf_pq_rerank_sql(
    probe_ids: list[int],
    k: int = 5,
    shortlist: int = 20,
    m: int = 8,
    dim: int = 64,
    centroid_stride: int = 250,
    code_stride: int = 250,
    two_level: bool = True,
    coarse_factor: int | None = None,
    coarse_codebook: str = "stride",
    n_clusters: int = 16,
    train_iters: int = 2,
    code_limit: int | None = None,
) -> str:
    return f"""
{ivf_pq_scored_sql_ctes(probe_ids, shortlist, m, dim, centroid_stride, code_stride, two_level, coarse_factor, coarse_codebook, n_clusters, train_iters, code_limit)},
ranked AS (
  SELECT probe_id, neighbor_id, l2_dist,
         row_number() OVER (
           PARTITION BY probe_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rank
  FROM rr
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, l2_dist
FROM ranked WHERE rank <= {k}
"""


def ivf_pq_scored_sql_ctes(
    probe_ids: list[int],
    shortlist: int = 20,
    m: int = 8,
    dim: int = 64,
    centroid_stride: int = 250,
    code_stride: int = 250,
    two_level: bool = True,
    coarse_factor: int | None = None,
    coarse_codebook: str = "stride",
    n_clusters: int = 16,
    train_iters: int = 2,
    code_limit: int | None = None,
    prefilter_label: bool = False,
) -> str:
    """The full IVFPQ candidate CTE chain (open WITH, ending in ``rr`` =
    (probe_id, neighbor_id, adc_rn, l2_dist)) mirroring
    :func:`ivf_pq_scored` — THE one generator of the oracle text, shared
    by the rerank oracle and the shortlist-sensitivity curve.
    ``coarse_codebook="trained"`` composes the trained fixed-K assignment
    block (:func:`ivf_assign_trained_sql_ctes`) instead of the stride
    rule's; ``prefilter_label=True`` restricts candidates to the probe's
    own label BEFORE the ADC ranking (the filter-aware search mode)."""
    ids = ", ".join(str(i) for i in probe_ids)
    dist = _PQ_DIST_SQL
    if coarse_codebook == "trained":
        assign_ctes = ivf_assign_trained_sql_ctes(n_clusters, train_iters, dim)
    elif two_level:
        assign_ctes = ivf_assign_2level_sql_ctes(centroid_stride, coarse_factor)
    else:
        assign_ctes = ivf_assign_sql_ctes(centroid_stride)
    if prefilter_label:
        cands_ctes = f"""cands0 AS (
  SELECT probe_id, a.vec_id FROM assigned a JOIN probes_cell USING (centroid_id)
  WHERE a.vec_id <> probe_id
),
plab_pre AS (
  SELECT vec_id AS probe_id, label AS plabel FROM embeddings WHERE vec_id IN ({ids})
),
cands AS (
  SELECT c.probe_id, c.vec_id
  FROM cands0 c
  JOIN embeddings l ON l.vec_id = c.vec_id
  JOIN plab_pre p ON p.probe_id = c.probe_id
  WHERE l.label = p.plabel
),"""
    else:
        cands_ctes = """cands AS (
  SELECT probe_id, a.vec_id FROM assigned a JOIN probes_cell USING (centroid_id)
  WHERE a.vec_id <> probe_id
),"""
    return f"""{assign_ctes},
{_QUANT_SCALED_Q},
{pq_codes_cte_sql(m, dim, code_stride, code_limit)},
probes_cell AS (
  SELECT vec_id AS probe_id, centroid_id FROM assigned WHERE vec_id IN ({ids})
),
{cands_ctes}
probe_subs AS (
  SELECT vec_id AS probe_id, s, sub AS psub FROM subs WHERE vec_id IN ({ids})
),
partials AS (
  SELECT c.probe_id, c.vec_id, {dist.format(a='psub', b='csub')} AS pd
  FROM cands c
  JOIN codes co ON co.vec_id = c.vec_id
  JOIN probe_subs ps ON ps.probe_id = c.probe_id AND ps.s = co.s
  JOIN code_entries ce ON ce.s = co.s AND ce.code_id = co.code_id
),
adc AS (
  SELECT probe_id, vec_id, CAST(sum(pd) AS BIGINT) AS adc_dist
  FROM partials GROUP BY probe_id, vec_id
),
short AS (
  SELECT probe_id, vec_id, adc_rn FROM (
    SELECT probe_id, vec_id,
           row_number() OVER (
             PARTITION BY probe_id ORDER BY adc_dist ASC, vec_id ASC) AS adc_rn
    FROM adc
  ) WHERE adc_rn <= {shortlist}
),
probe_q AS (SELECT vec_id AS probe_id, qe AS pqe FROM q WHERE vec_id IN ({ids})),
rr AS (
  SELECT s.probe_id, s.vec_id AS neighbor_id, s.adc_rn,
         {dist.format(a='pqe', b='qe')} AS l2_dist
  FROM short s
  JOIN q ON q.vec_id = s.vec_id
  JOIN probe_q pq ON pq.probe_id = s.probe_id
)"""


# ------------------------------------------------------ semantic dedup

def _semantic_scan(
    assigned: DataFrame, tau: float, keys: tuple[str, ...] = ("centroid_id",)
) -> DataFrame:
    """Shared SemDeDup near-dup scan over an assignment frame
    (vec_id, e, centroid_id): inside each cluster drop any vector whose
    cosine to a *lower-id* cluster-mate reaches ``tau``.  Cosines are
    rounded to 6 dp before the threshold compare so both engines make the
    same keep/drop call at the boundary.  ``keys`` is the pair-blocking
    key set — the bucketed variant adds the LSH ``bucket`` column so the
    all-pairs scan runs per (cell, bucket) instead of per cell."""
    keep_cols = list(keys)
    # each side's norm is hoisted to a per-ROW column before the pair
    # join — the per-pair cosine then folds ONE dot instead of three
    # (sqrt(dot(e,e)) per side was recomputed for every candidate pair;
    # same expression tree, identical IEEE value, guide §2.3).  The 8-byte
    # norm column is noise next to the dim-double embedding it rides with.
    an = F.sqrt(dot_col(F.col("e"), F.col("e")))
    a = assigned.select(
        *keep_cols, F.col("vec_id").alias("a_id"), F.col("e").alias("ae"),
        an.alias("an"),
    )
    b = assigned.select(
        *keep_cols, F.col("vec_id").alias("b_id"), F.col("e").alias("be"),
        an.alias("bn"),
    )
    near = (
        a.join(b, keep_cols)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "b_id",
            F.round(
                dot_col(F.col("ae"), F.col("be")) / (F.col("an") * F.col("bn")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= tau)
        .groupBy("b_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        assigned.join(near, assigned.vec_id == near.b_id, "left")
        .select(
            "vec_id",
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.coalesce("n_near", F.lit(0)).cast("int").alias("n_near"),
            (F.col("n_near").isNull()).cast("int").alias("kept"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame, tau: float = 0.92, centroid_stride: int = 250
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the corpus coarsely (``ivf_assign`` — deterministic centroids), then
    inside each cluster drop any vector whose cosine to a *lower-id*
    cluster-mate reaches ``tau``; the lowest id of each near-duplicate
    group survives.

    Scale: the all-pairs comparison is confined to single clusters — the
    O(N²) term becomes Σ|cluster|², the same bound the paper exploits.
    MEASURED CAVEAT (tools/scale_bench.py, round 8): the flat ``ivf_assign``
    scores every vector against ALL centroids, and the stride rule grows
    the centroid count with the corpus, so the *assignment* is the N²/stride
    term — 16.1x wall-time at 30x corpus.  :func:`semantic_dedup_2level`
    is the measured scale path (same scan, hierarchical assignment).
    """
    assigned = track_cached(ivf_assign(embeddings, centroid_stride))
    return _semantic_scan(assigned, tau)


def semantic_dedup_sql(tau: float = 0.92, centroid_stride: int = 250) -> str:
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
near AS (
  SELECT b.vec_id AS b_id, count(*) AS n_near
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.e, b.e)
              / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
        >= {tau}
  GROUP BY b.vec_id
)
SELECT s.vec_id,
       CAST(s.centroid_id AS BIGINT) AS centroid_id,
       CAST(coalesce(n.n_near, 0) AS INTEGER) AS n_near,
       CAST(CASE WHEN n.n_near IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM assigned s LEFT JOIN near n ON s.vec_id = n.b_id
"""


def ivf_assign_2level(
    embeddings: DataFrame,
    centroid_stride: int = 250,
    coarse_factor: int | None = 16,
    broadcast_fine_limit: int = 500_000,
) -> DataFrame:
    """Two-level IVF assignment — the measured scale fix for the flat
    ``ivf_assign`` (whose every-vector-vs-every-centroid scoring is the
    N²/stride term tools/scale_bench.py exposed at 30x corpus).

    The fine centroids (every ``centroid_stride``-th id) are themselves
    coarse-quantized over a ``coarse_factor``-times sparser centroid set;
    a vector then scores ONLY the fine centroids of its nearest coarse
    cell.  Cost: N·(C/G) + C·(C/G) + N·G vs the flat N·C — at C ∝ N this
    turns quadratic into ~N·√N when G ~ √C.  With ``coarse_factor=None``
    G auto-scales as floor(sqrt(C)+0.5) from a one-job count of the fine
    set (VERDICT r08 #4: a FIXED G leaves per-cell fine scans growing as
    C/G, superlinear again past 30x; √C holds N^1.5 at any corpus size;
    floor(x+0.5) rather than round() — IEEE sqrt is correctly rounded on
    both engines and an exact .5 would need sqrt(C)=k+0.5, impossible for
    integer C — so the DuckDB oracle derives the identical G).  Both
    argmax levels break ties by ascending centroid id, so the oracle
    replays the assignment exactly; cell-boundary vectors may land in a
    different cell than the flat assignment — the standard IVF
    approximation, here made deterministic.

    Assignment argmaxes are map-side partial aggregations
    (max of struct(cos, -id)), not windows — no N-row shuffle per level
    beyond the final vec_id joins.  The per-cell fine table broadcasts
    only while the fine set is small (``broadcast_fine_limit`` rows, ~600 B
    each at 64 dims); past that it falls back to a shuffle join on
    coarse_id — a broadcast that grows with C ∝ N is itself a scale
    ceiling.

    Completeness contract (ADVICE r08): the final assignment inner-joins
    through the vector's coarse cell, so a vector whose coarse cell has
    zero fine members is DROPPED from the output — possible only when two
    coarse centroids are exactly parallel and FP asymmetry splits the two
    argmax levels (never observed on real data; the flat ``ivf_assign``
    covers every vec_id).  The SQL oracle mirrors the drop, so parity
    holds; callers needing total coverage should use the flat assignment.
    """
    # per-row norm hoist (see ivf_assign): every scoring stage below folds
    # ONE dot per pair, with each side's norm computed once per row and
    # riding the cache/broadcast — identical IEEE values
    emb = track_cached(
        _spread_emb(embeddings)
        .select("vec_id", _dbl("embedding").alias("e"))
        .withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    )
    fine = emb.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("fid"), F.col("e").alias("fe"),
        F.col("en").alias("fn"),
    )
    # one cheap count job over the cached frame: sizes both the auto coarse
    # factor and the broadcast-vs-shuffle decision for the per-cell table
    n_fine = fine.count()
    if coarse_factor is None:
        import math

        coarse_factor = max(1, int(math.floor(math.sqrt(n_fine) + 0.5)))
    coarse = emb.filter(
        F.col("vec_id") % (centroid_stride * coarse_factor) == 0
    ).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce"),
        F.col("en").alias("cn"),
    )

    def _argmax(scored: DataFrame, id_col: str, cos: Column, cand: str, out: str) -> DataFrame:
        best = scored.groupBy(id_col).agg(
            F.max(F.struct(cos.alias("c"), (-F.col(cand)).alias("ni"))).alias("b")
        )
        return best.select(id_col, (-F.col("b.ni")).alias(out))

    f2c = _argmax(
        fine.join(F.broadcast(coarse)),
        "fid",
        dot_col(F.col("fe"), F.col("ce")) / (F.col("fn") * F.col("cn")),
        "cid",
        "coarse_id",
    )
    v2c = _argmax(
        emb.join(F.broadcast(coarse)),
        "vec_id",
        dot_col(F.col("e"), F.col("ce")) / (F.col("en") * F.col("cn")),
        "cid",
        "coarse_id",
    )
    # past the limit the fine table must NOT broadcast anywhere (it grows
    # with C ∝ N) — and without an explicit hint Catalyst would still
    # auto-broadcast it whenever its estimate sits under
    # autoBroadcastJoinThreshold, so the fallback pins sort-merge joins for
    # both fine-table joins (the cell build on fid and the per-cell probe on
    # coarse_id).  VERDICT r09 #3: the branch is now exercised +
    # plan-asserted in tests/test_round8_properties.py.
    if n_fine <= broadcast_fine_limit:
        cell_side = F.broadcast(f2c.join(fine, "fid"))
    else:
        cell_side = f2c.join(fine.hint("merge"), "fid").hint("merge")
    cands = emb.join(v2c, "vec_id").join(cell_side, "coarse_id")
    final = _argmax(
        cands,
        "vec_id",
        dot_col(F.col("e"), F.col("fe")) / (F.col("en") * F.col("fn")),
        "fid",
        "centroid_id",
    )
    return emb.join(final, "vec_id").select("vec_id", "e", "centroid_id")


def semantic_dedup_2level(
    embeddings: DataFrame,
    tau: float = 0.92,
    centroid_stride: int = 250,
    coarse_factor: int | None = 16,
) -> DataFrame:
    """SemDeDup over the two-level IVF assignment — identical near-dup scan
    (``_semantic_scan``), hierarchical assignment: the corpus-size-robust
    variant of :func:`semantic_dedup` (see the measured caveat there).
    ``coarse_factor=None`` auto-scales G ∝ √C (VERDICT r08 #4).

    SCALE NOTE (honest r11 re-measurement, SCALE_r11 honest_*): the
    within-cell all-pairs NEAR SCAN is itself 58.8x wall at 100x once the
    cells skew — the family's scale path is
    :func:`semantic_dedup_bucketed` with the auto-derived plane count,
    which caps the scan at linear work."""
    assigned = track_cached(
        ivf_assign_2level(embeddings, centroid_stride, coarse_factor)
    )
    return _semantic_scan(assigned, tau)


#: the float-cosine SQL template every 2-level oracle composes
_LIST_COS_SQL = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def ivf_assign_2level_sql_ctes(
    centroid_stride: int = 250, coarse_factor: int | None = 16
) -> str:
    """The emb/fine/coarse/f2c/v2c/assigned CTE block mirroring
    :func:`ivf_assign_2level` — THE one generator of the two-level
    assignment text, shared by semantic_dedup_2level_sql (and the auto-G
    variant) and the IVFPQ rerank oracle so the assignment rule can never
    silently diverge between oracles.  ``coarse_factor=None`` derives G in
    SQL exactly as the Spark side does: greatest(1, floor(sqrt(C)+0.5))
    over the fine-centroid count — IEEE sqrt is correctly rounded on both
    engines and an exact half is impossible for integer C, so the two
    derivations agree bit-for-bit."""
    cos = _LIST_COS_SQL
    if coarse_factor is None:
        coarse_mod = (
            f"({centroid_stride} * (SELECT greatest(1, "
            f"CAST(floor(sqrt(count(*)) + 0.5) AS BIGINT)) FROM fine))"
        )
    else:
        coarse_mod = str(centroid_stride * coarse_factor)
    return f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
fine AS (SELECT vec_id AS fid, e AS fe FROM emb WHERE vec_id % {centroid_stride} = 0),
coarse AS (SELECT vec_id AS cid, e AS ce
           FROM emb WHERE vec_id % {coarse_mod} = 0),
f2c AS (
  SELECT fid, cid AS coarse_id FROM (
    SELECT fine.fid, coarse.cid,
           row_number() OVER (PARTITION BY fine.fid
             ORDER BY {cos.format(a='fe', b='ce')} DESC, cid ASC) AS rn
    FROM fine, coarse
  ) WHERE rn = 1
),
v2c AS (
  SELECT vec_id, cid AS coarse_id FROM (
    SELECT emb.vec_id, coarse.cid,
           row_number() OVER (PARTITION BY emb.vec_id
             ORDER BY {cos.format(a='e', b='ce')} DESC, cid ASC) AS rn
    FROM emb, coarse
  ) WHERE rn = 1
),
assigned AS (
  SELECT vec_id, e, fid AS centroid_id FROM (
    SELECT emb.vec_id, emb.e, f.fid,
           row_number() OVER (PARTITION BY emb.vec_id
             ORDER BY {cos.format(a='e', b='fe')} DESC, f.fid ASC) AS rn
    FROM emb
    JOIN v2c USING (vec_id)
    JOIN f2c USING (coarse_id)
    JOIN fine f USING (fid)
  ) WHERE rn = 1
)"""


def semantic_dedup_2level_sql(
    tau: float = 0.92, centroid_stride: int = 250, coarse_factor: int | None = 16
) -> str:
    """See :func:`ivf_assign_2level_sql_ctes` for the shared assignment
    block and the auto-G (``coarse_factor=None``) derivation."""
    cos = _LIST_COS_SQL
    return f"""
{ivf_assign_2level_sql_ctes(centroid_stride, coarse_factor)},
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


def derive_n_planes(
    assigned: DataFrame,
    pairs_per_vec: int = 64,
    min_planes: int = 4,
    max_planes: int = 16,
) -> int:
    """Auto-scale the sign-LSH plane count from the measured cell-size
    skew (VERDICT r11 #1: a FIXED n_planes is a 2^n constant-factor pair
    cut — the within-(cell,bucket) groups grow linearly again once cells
    skew): pick the smallest p with ``Σ|cell|² <= pairs_per_vec · N · 2^p``
    — the bucketed scan's expected candidate-pair volume is Σ|cell|²/2^p
    (unrelated cell-mates share all p sign bits w.p. 2^-p), so the rule
    caps the scan at ~``pairs_per_vec`` candidate pairs per vector, i.e.
    LINEAR total work, at any corpus size and any skew.

    One metadata-scale job (two nested aggregates over the assignment
    frame, one collected row); per-cell count squares are lifted to
    DECIMAL(38,0) BEFORE the sum (Σc² reaches ~1e18 at 1e9 vectors — the
    LONG-overflow rule), and the comparison ladder is pure integer
    arithmetic, so the DuckDB oracle derives the identical p — the same
    derive-the-knob-in-SQL discipline as auto-G
    (:func:`ivf_assign_2level`).
    """
    row = (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sumsq"),
            F.sum("c").alias("n"),
        )
        .collect()[0]
    )
    sumsq = int(row["sumsq"] or 0)
    n = int(row["n"] or 0)
    for p in range(min_planes, max_planes):
        if sumsq <= pairs_per_vec * n * (1 << p):
            return p
    return max_planes


def derive_n_planes_case_sql(
    pairs_per_vec: int = 64, min_planes: int = 4, max_planes: int = 16
) -> str:
    """The integer CASE ladder mirroring :func:`derive_n_planes`, over a
    relation ``cellsz(c)`` of per-cell counts — THE one generator of the
    plane-count rule's SQL text.  No log2 anywhere (float log2 is not
    trusted cross-engine even at powers of two — the r07 rule); p is
    bounded, so the ladder is max_planes - min_planes literal integer
    comparisons.  The per-cell count is lifted to HUGEINT BEFORE the
    multiply (ADVICE r12: bare ``c * c`` would overflow BIGINT for a
    single cell above ~3.04e9 rows — the same pre-multiply lift the Spark
    twin does with DECIMAL(38,0)), and the sums are coalesced to 0 so an
    EMPTY assignment relation derives ``min_planes`` on both engines
    (0 <= 0 satisfies the first arm) instead of NULL-falling to the ELSE
    ``max_planes`` arm (ADVICE r12)."""
    arms = "\n    ".join(
        f"WHEN coalesce(sum(CAST(c AS HUGEINT) * c), 0)"
        f" <= {pairs_per_vec} * coalesce(sum(c), 0) * {1 << p} THEN {p}"
        for p in range(min_planes, max_planes)
    )
    return f"SELECT CASE {arms}\n    ELSE {max_planes} END AS p FROM cellsz"


def semantic_dedup_bucketed(
    embeddings: DataFrame,
    tau: float = 0.92,
    centroid_stride: int = 250,
    coarse_factor: int | None = None,
    n_planes: int | None = None,
    dim: int = 64,
    pairs_per_vec: int = 64,
) -> DataFrame:
    """SemDeDup with an LSH-BUCKETED near-dup scan — the structural answer
    to the honest scale measurement (SCALE_r11 honest_*: the within-cell
    all-pairs scan, previously count-pruned out of every wall number, is
    58.8x at 100x even under auto-G's growing cell count): vectors are
    additionally sign-LSH bucketed (:func:`lsh_buckets`, deterministic
    integer hyperplanes) and the pair scan runs per (cell, bucket), an
    expected 2^n_planes reduction of the pair volume.

    ``n_planes=None`` (the family default since round 12) AUTO-SCALES the
    plane count with the measured cell-size skew via
    :func:`derive_n_planes` — the fixed-plane form is a 2^n constant
    factor, the auto form caps the scan at ~``pairs_per_vec`` candidate
    pairs per vector (linear total work) at any corpus size.

    Semantics are a DETERMINISTIC relaxation, not an approximation with
    hidden randomness: a vector is dropped iff a lower-id near-dup (6dp
    cosine >= tau) shares BOTH its cell and its bucket.  A true near-dup
    pair at cosine c crosses one hyperplane with probability arccos(c)/pi
    (~0.045 at c=0.99), so retention falls gently with n_planes — the
    companion agreement query measures it on real data rather than
    assuming it.  Everything stays oracle-exact: the hyperplanes are
    driver-side literals (prefix-stable in p, so the derived-p plan equals
    the masked max-plane bucket the oracle computes), the bucket is an
    integer, the scan rule is the shared :func:`_semantic_scan` with the
    bucket in its blocking key.

    SCALE ROUTING (the last hop of the docstring chain — VERDICT r12 #5):
    this flavor's scan is linear, but its auto-G ASSIGNMENT still carries
    the stride rule's N^1.5 term, and past ~10^5 vectors that term
    dominates (SCALE_r12.json: marginal cost RISES 0.032→0.123 ms/vec
    from 10x to 100x while the trained flavor's FALLS 0.158→0.101).  When
    N is large enough that assignment dominates — the measured crossover
    sits between 30x and 100x of the sf0.1 corpus (~60k-200k vectors) —
    use :func:`semantic_dedup_bucketed_trained`: trained fixed-K
    assignment (N·K) + the same auto-planes scan, every stage O(N).
    """
    assigned = track_cached(
        ivf_assign_2level(embeddings, centroid_stride, coarse_factor)
    )
    if n_planes is None:
        n_planes = derive_n_planes(assigned, pairs_per_vec)
    ab = assigned.join(lsh_buckets(embeddings, n_planes, dim), "vec_id")
    return _semantic_scan(ab, tau, keys=("centroid_id", "bucket"))


def semantic_dedup_bucketed_auto(
    embeddings: DataFrame,
    tau: float = 0.92,
    centroid_stride: int = 250,
    coarse_factor: int | None = None,
    dim: int = 64,
    pairs_per_vec: int = 64,
) -> DataFrame:
    """:func:`semantic_dedup_bucketed` with the auto-derived plane count
    EXPOSED as an ``n_planes`` output column, so the knob derivation
    itself flows through the driver's value hash (the auto-G precedent:
    the derived constant must be oracle-replayed, not assumed)."""
    assigned = track_cached(
        ivf_assign_2level(embeddings, centroid_stride, coarse_factor)
    )
    p = derive_n_planes(assigned, pairs_per_vec)
    ab = assigned.join(lsh_buckets(embeddings, p, dim), "vec_id")
    return _semantic_scan(ab, tau, keys=("centroid_id", "bucket")).select(
        "*", F.lit(p).cast("long").alias("n_planes")
    )


def semantic_dedup_bucketed_trained(
    embeddings: DataFrame,
    tau: float = 0.92,
    n_clusters: int = 16,
    iters: int = 2,
    dim: int = 64,
    pairs_per_vec: int = 64,
) -> DataFrame:
    """The fully LINEAR SemDeDup: trained fixed-K coarse assignment (N·K —
    :func:`ivf_assign_trained`) + the auto-planes bucketed scan (pair
    volume capped at ~pairs_per_vec per vector by :func:`derive_n_planes`).

    This closes the design matrix semantic_dedup_trained opened: fixed-K
    cells alone are the all-pairs scan's NEGATIVE control (|cell| = N/K ⇒
    Σ|cell|² = N²/K, quadratic — measured 92.6x at 30x), but the
    auto-planes rule reacts to exactly that growth — Σc² = N²/K forces
    p ≈ log2(N/(K·ppv)), so the plane count climbs logarithmically and
    the scan stays at ~ppv·N pairs.  Assignment linear, bucketing linear
    (p dot products per vector), scan linear: the only SemDeDup flavor
    whose every stage is O(N) at fixed K.  Derived p ships as an output
    column; the oracle replays assignment, ladder, and mask exactly."""
    assigned = track_cached(
        ivf_assign_trained(embeddings, n_clusters=n_clusters, iters=iters, dim=dim)
    )
    p = derive_n_planes(assigned, pairs_per_vec)
    ab = assigned.join(lsh_buckets(embeddings, p, dim), "vec_id")
    return _semantic_scan(ab, tau, keys=("centroid_id", "bucket")).select(
        "*", F.lit(p).cast("long").alias("n_planes")
    )


def semantic_dedup_bucketed_trained_sql(
    tau: float = 0.92,
    n_clusters: int = 16,
    iters: int = 2,
    dim: int = 64,
    pairs_per_vec: int = 64,
) -> str:
    """DuckDB mirror of :func:`semantic_dedup_bucketed_trained` — the
    shared trained-assignment block (:func:`ivf_assign_trained_sql_ctes`)
    plus the auto-planes bucket chain and the shared scan tail."""
    np_col = ",\n       CAST((SELECT p FROM npl) AS BIGINT) AS n_planes"
    return f"""
{ivf_assign_trained_sql_ctes(n_clusters, iters, dim)},
{_bucketed_bk_cte_sql(None, dim, pairs_per_vec)},
{_bucketed_scan_tail_sql(tau, np_col)}"""


def _bucketed_bk_cte_sql(
    n_planes: int | None, dim: int, pairs_per_vec: int
) -> str:
    """The ``bk`` CTE chain for the bucketed SemDeDup oracles: a literal
    plane count embeds :func:`lsh_buckets_sql` directly; ``None`` derives
    p in SQL exactly as :func:`derive_n_planes` does (cellsz/npl CTEs) and
    MASKS the max-plane bucket to the low p bits — sign-LSH bucket bits
    are prefix-stable in p (plane seeds depend only on the plane index),
    so ``bucket % 2^p`` over 16 planes equals the p-plane bucket the Spark
    side computes."""
    if n_planes is not None:
        return f"bk AS MATERIALIZED ({lsh_buckets_sql(n_planes, dim)})"
    return f"""cellsz AS (SELECT count(*) AS c FROM assigned GROUP BY centroid_id),
npl AS MATERIALIZED ({derive_n_planes_case_sql(pairs_per_vec)}),
bkfull AS ({lsh_buckets_sql(16, dim)}),
bk AS MATERIALIZED (
  SELECT vec_id,
         CAST(bucket % (1::BIGINT << (SELECT p FROM npl)) AS BIGINT) AS bucket
  FROM bkfull
)"""


def _bucketed_scan_tail_sql(tau: float, np_col: str) -> str:
    """The (cell, bucket)-blocked near scan + final select over the
    ``assigned`` + ``bk`` CTEs — THE one generator of the bucketed scan
    text, shared by :func:`semantic_dedup_bucketed_sql` (2-level
    assignment) and :func:`semantic_dedup_bucketed_trained_sql` (trained
    assignment) so the scan rule can never silently fork between the
    family's oracles."""
    cos = _LIST_COS_SQL
    return f"""ab AS MATERIALIZED (
  SELECT a.vec_id, a.e, a.centroid_id, bk.bucket
  FROM assigned a JOIN bk USING (vec_id)
),
near AS (
  SELECT b.vec_id AS b_id, count(*) AS n_near
  FROM ab a JOIN ab b
    ON a.centroid_id = b.centroid_id AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id
  WHERE round({cos.format(a='a.e', b='b.e')}, 6) >= {tau}
  GROUP BY b.vec_id
)
SELECT s.vec_id,
       CAST(s.centroid_id AS BIGINT) AS centroid_id,
       CAST(coalesce(n.n_near, 0) AS INTEGER) AS n_near,
       CAST(CASE WHEN n.n_near IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept{np_col}
FROM ab s LEFT JOIN near n ON s.vec_id = n.b_id
"""


def semantic_dedup_bucketed_sql(
    tau: float = 0.92,
    centroid_stride: int = 250,
    coarse_factor: int | None = None,
    n_planes: int | None = None,
    dim: int = 64,
    pairs_per_vec: int = 64,
    with_n_planes_col: bool = False,
) -> str:
    """DuckDB mirror of :func:`semantic_dedup_bucketed` — the shared
    2-level assignment block plus the literal-hyperplane bucket CTE, the
    near scan blocked on (centroid_id, bucket).  ``n_planes=None`` (the
    family default, matching the Spark side) derives the plane count in
    SQL (see :func:`_bucketed_bk_cte_sql`); ``with_n_planes_col`` appends
    the derived count as an output column (the
    :func:`semantic_dedup_bucketed_auto` mirror)."""
    np_col = ""
    if with_n_planes_col:
        np_expr = (
            "(SELECT p FROM npl)" if n_planes is None else str(n_planes)
        )
        np_col = f",\n       CAST({np_expr} AS BIGINT) AS n_planes"
    return f"""
{ivf_assign_2level_sql_ctes(centroid_stride, coarse_factor)},
{_bucketed_bk_cte_sql(n_planes, dim, pairs_per_vec)},
{_bucketed_scan_tail_sql(tau, np_col)}"""


# ------------------------------------------ incremental semantic dedup

def ivf_assign_frozen(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid in an EXPLICIT, frozen
    centroid frame (cosine, ties broken by ascending centroid id) — the
    incremental-ingest quantizer: the centroid set must NOT be re-derived
    per batch (a stride/trained rule over a growing corpus yields
    different centroids at different ingest points, destroying batch-split
    invariance), so callers freeze it once and pass it in.  Assignment is
    a map-side max(struct(cos, -id)) partial aggregation over the
    broadcast centroid set — N·K linear, no window, no N-row shuffle.

    ``vectors``: (vec_id, embedding); ``centroids``: (centroid_id, ce).
    Returns (vec_id, e, centroid_id).
    """
    # per-row norm hoist (see ivf_assign): one dot per (vector, centroid)
    emb = vectors.select("vec_id", _dbl("embedding").alias("e")).withColumn(
        "en", F.sqrt(dot_col(F.col("e"), F.col("e")))
    )
    cents = centroids.withColumn(
        "cn", F.sqrt(dot_col(F.col("ce"), F.col("ce")))
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "e",
        "centroid_id",
        (dot_col(F.col("e"), F.col("ce")) / (F.col("en") * F.col("cn"))).alias("ccos"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(
            F.struct(F.col("ccos").alias("c"), (-F.col("centroid_id")).alias("ni"))
        ).alias("b")
    )
    return (
        emb.join(best, "vec_id")
        .select("vec_id", "e", (-F.col("b.ni")).cast("long").alias("centroid_id"))
    )


def semantic_dedup_ingest(
    state: DataFrame | None,
    batch: DataFrame,
    centroids: DataFrame,
    tau: float = 0.92,
    n_planes: int | None = None,
    dim: int = 64,
    validate: bool = False,
) -> DataFrame:
    """One incremental SemDeDup ingest step (VERDICT r11 #6 — the vector
    family's mergeability contract, the twin of p_minhash_mergeability):
    fold batches through this and the final state is BIT-IDENTICAL to the
    one-shot scan over the whole corpus with the same frozen centroids,
    provided batches arrive in vec_id order (every id in ``batch`` exceeds
    every id in ``state`` — the ingest monotonicity contract a
    continuously-arriving corpus satisfies by construction).

    ``state`` is the dedup metadata table WITH the embedding column —
    (vec_id, e, centroid_id, n_near, kept) — i.e. the corpus index, not
    just the survivors.  Scanning survivors only would NOT be exact:
    near-duplication is not transitive (u dropped by w, v near u but far
    from w ⇒ the full scan drops v, a survivors-only scan keeps it), so
    the family's drop-iff-any-lower-near-mate rule needs the dropped
    vectors' embeddings too.  What makes the step INCREMENTAL is the cell
    restriction: only prior rows in cells the batch actually touches are
    scanned — per-batch cost ∝ touched-cell content × batch size, never a
    corpus rescan — and prior rows' own (n_near, kept) never change (their
    lower-id mate set is frozen by id monotonicity).

    ``n_planes`` additionally blocks the scan per (cell, LSH bucket) —
    the bucketed relaxation composed with ingest.  The hyperplanes are
    corpus-INDEPENDENT literals (:func:`hyperplanes` seeds by plane
    index), so bucketing preserves batch-split invariance exactly; the
    plane count is FROZEN like the centroid set (a production index
    derives it at build time — changing it is a reindex, not an ingest).
    State rows then carry a ``bucket`` column.

    ``validate=True`` enforces the monotonicity contract eagerly (two
    single-row metadata aggregates: min batch id vs max state id) and
    raises ``ValueError`` on a violation — the ivf_assign_trained(model=)
    / minhash_bands(sig=) guard precedent (ADVICE r12; without it a
    contract breach silently freezes stale (n_near, kept) on prior rows).
    Off by default so steady-state ingest pays no extra jobs; turn it on
    for first-use / test paths.

    Returns the updated state covering ``state`` ∪ ``batch``.
    """
    if validate and state is not None:
        state_hi = state.agg(F.max("vec_id")).collect()[0][0]
        batch_lo = batch.agg(F.min("vec_id")).collect()[0][0]
        if state_hi is not None and batch_lo is not None and batch_lo <= state_hi:
            raise ValueError(
                "semantic_dedup_ingest: monotonicity contract violated — "
                f"min(batch.vec_id)={batch_lo} <= max(state.vec_id)={state_hi}; "
                "every batch id must exceed every state id (prior rows' "
                "(n_near, kept) are frozen by id monotonicity)"
            )
    ab = ivf_assign_frozen(batch, centroids)
    keys = ["centroid_id"]
    if n_planes is not None:
        ab = ab.join(lsh_buckets(batch, n_planes, dim), "vec_id")
        keys.append("bucket")
    ab = track_cached(ab)
    # per-row norm hoist, as in _semantic_scan: one dot per candidate pair
    # instead of three (identical IEEE expression tree per operand)
    norm = F.sqrt(dot_col(F.col("e"), F.col("e")))
    cand = ab.select(
        *keys, F.col("vec_id").alias("a_id"), F.col("e").alias("ae"),
        norm.alias("an"),
    )
    if state is not None:
        touched = ab.select(*keys).distinct()
        prior = state.join(F.broadcast(touched), keys).select(
            *keys, F.col("vec_id").alias("a_id"), F.col("e").alias("ae"),
            norm.alias("an"),
        )
        cand = prior.unionByName(cand)
    near = (
        cand.join(
            ab.select(
                *keys,
                F.col("vec_id").alias("b_id"),
                F.col("e").alias("be"),
                norm.alias("bn"),
            ),
            keys,
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "b_id",
            F.round(
                dot_col(F.col("ae"), F.col("be")) / (F.col("an") * F.col("bn")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= tau)
        .groupBy("b_id")
        .agg(F.count(F.lit(1)).alias("nn"))
    )
    new_rows = ab.join(near, ab.vec_id == near.b_id, "left").select(
        "vec_id",
        "e",
        *([F.col("bucket").cast("long").alias("bucket")] if n_planes is not None else []),
        F.col("centroid_id").cast("long").alias("centroid_id"),
        F.coalesce("nn", F.lit(0)).cast("int").alias("n_near"),
        (F.col("nn").isNull()).cast("int").alias("kept"),
    )
    return new_rows if state is None else state.unionByName(new_rows)


def semantic_dedup_incremental(
    embeddings: DataFrame,
    tau: float = 0.92,
    centroid_stride: int = 250,
    n_batches: int = 2,
    n_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Fold :func:`semantic_dedup_ingest` over ``n_batches`` consecutive
    vec_id ranges of the corpus (batch k = [lo + span·k // n,
    lo + span·(k+1) // n) with span = hi − lo + 1, pure integer division)
    with the frozen stride-rule centroid set, returning the
    final dedup state WITHOUT the embedding column — (vec_id,
    centroid_id, n_near, kept), the driver-hashable shape (plus
    ``bucket`` when ``n_planes`` blocks the scan per (cell, LSH bucket)).
    With the same frozen centroids (and corpus-independent hyperplanes)
    the result is independent of ``n_batches`` (the batch-split
    invariance the property test pins at 1/2/4 splits)."""
    # batch k covers [lo + span*k // n, lo + span*(k+1) // n) with
    # span = hi - lo + 1 — the same integer-division bounds the SQL mirror
    # computes
    emb = track_cached(_spread_emb(embeddings))
    centroids = emb.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), _dbl("embedding").alias("ce")
    )
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    span = int(hi) - int(lo) + 1
    state = None
    for k in range(n_batches):
        b_lo = int(lo) + (span * k) // n_batches
        b_hi = int(lo) + (span * (k + 1)) // n_batches
        batch = emb.filter((F.col("vec_id") >= b_lo) & (F.col("vec_id") < b_hi))
        state = track_cached(
            semantic_dedup_ingest(
                state, batch, centroids, tau, n_planes=n_planes, dim=dim
            )
        )
    cols = ["vec_id", "centroid_id", "n_near", "kept"]
    if n_planes is not None:
        cols.insert(1, "bucket")
    return state.select(*cols)


def semantic_dedup_incremental_sql(
    tau: float = 0.92,
    centroid_stride: int = 250,
    n_batches: int = 2,
    n_planes: int | None = None,
    dim: int = 64,
    audit: bool = False,
) -> str:
    """DuckDB mirror of :func:`semantic_dedup_incremental`: per-batch
    sibling CTE chains (assign → touched-cell prior ∪ batch → near →
    state rows), final state the UNION ALL of every batch's rows.  The
    argmax is replayed by a row_number window (ties by ascending
    centroid id), batch bounds by the same integer-division rule.
    ``n_planes`` adds the LSH bucket to the blocking key (literal
    hyperplanes, one shared bucket CTE; the touched filter becomes a
    tuple IN).

    ``audit=True`` keeps EVERY CTE identical (single-source — the audit
    can never diverge from the ingest it audits) but swaps the final
    select for the per-batch COST STATISTICS of the touched-cells
    contract: batch size, distinct touched blocking groups, prior state
    rows the scan actually reads (cand minus the batch's own rows), and
    the total prior state size — the driver-hashable form of 'each batch
    scans only the cells it touches, never the corpus'.  The bucketed
    form counts (cell, bucket) groups under the column name
    ``touched_groups`` (the unbucketed column stays ``touched_cells`` —
    its registered text predates the extension)."""
    cos = _LIST_COS_SQL
    bucketed = n_planes is not None
    ctes = [
        "emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"cents AS MATERIALIZED (SELECT vec_id AS centroid_id, e AS ce "
        f"FROM emb WHERE vec_id % {centroid_stride} = 0)",
        "bounds AS (SELECT min(vec_id) AS lo, max(vec_id) - min(vec_id) + 1 AS span FROM emb)",
    ]
    if bucketed:
        ctes.append(
            f"bks AS MATERIALIZED ({lsh_buckets_sql(n_planes, dim)})"
        )
    keys = "centroid_id, bucket" if bucketed else "centroid_id"
    on_keys = (
        "u.centroid_id = v.centroid_id AND u.bucket = v.bucket"
        if bucketed
        else "u.centroid_id = v.centroid_id"
    )
    finals = []
    prior_states: list[str] = []
    for k in range(n_batches):
        b = f"b{k}"
        ctes.append(
            f"""{b} AS (
  SELECT vec_id, e FROM emb, bounds
  WHERE vec_id >= lo + (span * {k}) // {n_batches}
    AND vec_id <  lo + (span * {k + 1}) // {n_batches}
)"""
        )
        assign_body = f"""
  SELECT vec_id, e, centroid_id FROM (
    SELECT {b}.vec_id, {b}.e, cents.centroid_id,
           row_number() OVER (PARTITION BY {b}.vec_id
             ORDER BY {cos.format(a='e', b='ce')} DESC, centroid_id ASC) AS rn
    FROM {b}, cents
  ) WHERE rn = 1
"""
        if bucketed:
            assign_body = f"""
  SELECT x.vec_id, x.e, x.centroid_id, bks.bucket
  FROM ({assign_body.strip()}) x JOIN bks USING (vec_id)
"""
        ctes.append(f"a{b} AS MATERIALIZED ({assign_body})")
        if prior_states:
            # DuckDB rejects (a, b) IN (subquery) — tuple membership is
            # spelled EXISTS (round-12 engine note)
            def _touched(s: str) -> str:
                if bucketed:
                    return (
                        f"EXISTS (SELECT 1 FROM a{b} t WHERE "
                        f"t.centroid_id = {s}.centroid_id AND t.bucket = {s}.bucket)"
                    )
                return f"centroid_id IN (SELECT DISTINCT centroid_id FROM a{b})"

            prior_union = " UNION ALL ".join(
                f"SELECT {keys}, vec_id AS a_id, e AS ae FROM {s} "
                f"WHERE {_touched(s)}"
                for s in prior_states
            )
            cand = f"{prior_union} UNION ALL SELECT {keys}, vec_id, e FROM a{b}"
        else:
            cand = f"SELECT {keys}, vec_id AS a_id, e AS ae FROM a{b}"
        # audit mode reads cand{b} twice (the near join AND the audit
        # count) — the r06 rule: multiply-referenced oracle CTEs pin AS
        # MATERIALIZED (DuckDB inlines plain CTEs per reference); the
        # single-referenced non-audit form keeps the original text
        cand_kw = "AS MATERIALIZED" if audit else "AS"
        ctes.append(f"cand{b} {cand_kw} ({cand})")
        ctes.append(
            f"""n{b} AS (
  SELECT v.vec_id AS b_id, count(*) AS nn
  FROM cand{b} u JOIN a{b} v
    ON {on_keys} AND u.a_id < v.vec_id
  WHERE round({cos.format(a='u.ae', b='v.e')}, 6) >= {tau}
  GROUP BY v.vec_id
)"""
        )
        s_bucket = ", a.bucket" if bucketed else ""
        ctes.append(
            f"""s{b} AS MATERIALIZED (
  SELECT a.vec_id, a.e, a.centroid_id{s_bucket},
         coalesce(n.nn, 0) AS n_near,
         CASE WHEN n.nn IS NULL THEN 1 ELSE 0 END AS kept
  FROM a{b} a LEFT JOIN n{b} n ON a.vec_id = n.b_id
)"""
        )
        if audit:
            prior_total = (
                " + ".join(f"(SELECT count(*) FROM {s})" for s in prior_states)
                or "0"
            )
            touched = (
                f"(SELECT CAST(count(*) AS BIGINT) FROM "
                f"(SELECT DISTINCT centroid_id, bucket FROM a{b}))\n"
                "         AS touched_groups"
                if bucketed
                else f"(SELECT CAST(count(DISTINCT centroid_id) AS BIGINT) "
                f"FROM a{b})\n         AS touched_cells"
            )
            finals.append(
                f"""SELECT CAST({k} AS BIGINT) AS batch,
       (SELECT CAST(count(*) AS BIGINT) FROM a{b}) AS batch_size,
       {touched},
       CAST((SELECT count(*) FROM cand{b}) - (SELECT count(*) FROM a{b})
            AS BIGINT) AS prior_rows_scanned,
       CAST({prior_total} AS BIGINT) AS prior_rows_total"""
            )
        prior_states.append(f"s{b}")
        f_bucket = "CAST(bucket AS BIGINT) AS bucket, " if bucketed else ""
        if not audit:
            finals.append(
                f"SELECT vec_id, {f_bucket}CAST(centroid_id AS BIGINT) AS centroid_id, "
                f"CAST(n_near AS INTEGER) AS n_near, CAST(kept AS INTEGER) AS kept "
                f"FROM s{b}"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(finals)


# ---------------------------------------------------- IVF multiprobe

def ivf_topk_multiprobe(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    centroid_stride: int = 250,
) -> DataFrame:
    """IVF search with ``nprobe`` cells per probe — the recall knob of the
    IVF family: a query near a cell boundary also scans its runner-up
    cells, the standard fix for nprobe=1's boundary misses (``ivf_topk``).

    One extra broadcast row per (probe, extra cell); candidate volume
    scales linearly with nprobe, corpus passes stay at one.
    """
    assigned = track_cached(ivf_assign(embeddings, centroid_stride))
    an = assigned.withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    cents = an.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce"),
        F.col("en").alias("cn"),
    ).dropDuplicates(["centroid_id"])
    probes = an.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"),
        F.col("en").alias("pn"),
    )
    pw = Window.partitionBy("probe_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    probe_cells = (
        probes.join(F.broadcast(cents))
        .select(
            "probe_id", "pe", "pn", "centroid_id",
            (dot_col(F.col("pe"), F.col("ce")) / (F.col("pn") * F.col("cn"))).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("probe_id", "pe", "pn", "centroid_id")
    )
    cands = an.join(F.broadcast(probe_cells), ["centroid_id"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def ivf_topk_multiprobe_sql(
    probe_ids: list[int], k: int = 5, nprobe: int = 2, centroid_stride: int = 250
) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    cos = (
        "list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, e AS ce FROM emb WHERE vec_id % {centroid_stride} = 0),
assigned AS (
  SELECT vec_id, e, centroid_id FROM (
    SELECT emb.vec_id, emb.e, cents.centroid_id,
           row_number() OVER (
             PARTITION BY emb.vec_id
             ORDER BY {cos.format(a='e', b='ce')} DESC, centroid_id ASC
           ) AS rn
    FROM emb, cents
  ) WHERE rn = 1
),
probes AS (SELECT vec_id AS probe_id, e AS pe FROM assigned WHERE vec_id IN ({ids})),
probe_cells AS (
  SELECT probe_id, pe, centroid_id FROM (
    SELECT probes.probe_id, probes.pe, cents.centroid_id,
           row_number() OVER (
             PARTITION BY probe_id
             ORDER BY {cos.format(a='pe', b='ce')} DESC, centroid_id ASC
           ) AS rn
    FROM probes, cents
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT probe_id, c.vec_id AS neighbor_id,
         {cos.format(a='pe', b='c.e')} AS cos
  FROM assigned c JOIN probe_cells USING (centroid_id)
  WHERE c.vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


def trained_multiprobe_scored(
    embeddings: DataFrame,
    probe_ids: list[int],
    nprobe: int,
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
    model: DataFrame | None = None,
) -> DataFrame:
    """The trained-multiprobe candidate frame — (probe_id, cell_rank,
    neighbor_id, cos) over each probe's top ``nprobe`` trained cells: THE
    one Spark-side builder of the probe-cell ranking (the assignment's own
    squared-L2 key, ties to the smaller cluster id — a window on the
    bounded |probes|·K frame, never corpus grain) and the cell-union
    cosine scan, shared by :func:`ivf_topk_trained_multiprobe` and the
    nprobe recall-curve sweep (which carves its arms from one call at the
    widest nprobe via ``cell_rank``).  The k×dim model trains ONCE and is
    shared with the assignment via the ``model=`` forwarding contract;
    a caller-supplied ``model`` (e.g. a :func:`load_kmeans_model`
    artifact, or a stale index-build-time model for the staleness audit)
    serves BOTH the probe-cell ranking and the assignment, exactly the
    persisted-artifact serve path."""
    if model is None:
        model = kmeans_model(embeddings, n_clusters=n_clusters, iters=iters, dim=dim)
        if n_clusters * dim > 65536:
            # outside the inline regime kmeans_model is a distributed
            # training lineage — cache it so the probe-cell ranking and
            # the assignment don't train twice (inline models are LOCAL
            # k-row relations: caching them only adds scan jobs)
            model = track_cached(model)
    assigned = track_cached(
        ivf_assign_trained(
            embeddings, n_clusters=n_clusters, iters=iters, dim=dim, model=model
        )
    )
    an = assigned.withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    probes = an.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"),
        F.col("en").alias("pn"),
    )
    pw = Window.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("cluster"))
    probe_cells = (
        probes.join(F.broadcast(model))
        .select(
            "probe_id",
            "pe",
            "pn",
            "cluster",
            (
                dot_col(F.col("pe"), F.col("pe"))
                - 2 * dot_col(F.col("pe"), F.col("cd"))
                + dot_col(F.col("cd"), F.col("cd"))
            ).alias("dist"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select(
            "probe_id",
            "pe",
            "pn",
            F.col("cluster").alias("centroid_id"),
            F.col("rn").alias("cell_rank"),
        )
    )
    return (
        an.join(F.broadcast(probe_cells), ["centroid_id"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "cell_rank",
            F.col("vec_id").alias("neighbor_id"),
            (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
        )
    )


def ivf_topk_trained_multiprobe(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF multiprobe over TRAINED fixed-K cells (VERDICT r11 #7: the
    recall knob existed only for the stride path) — each probe scans its
    top ``nprobe`` cells, the standard fix for nprobe=1 boundary misses;
    candidate volume scales linearly with nprobe, corpus passes stay at
    one.  The candidate frame comes from the shared
    :func:`trained_multiprobe_scored` builder."""
    scored = trained_multiprobe_scored(
        embeddings, probe_ids, nprobe, n_clusters=n_clusters, iters=iters, dim=dim
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def ivf_topk_trained_multiprobe_sql(
    probe_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    n_clusters: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB mirror of :func:`ivf_topk_trained_multiprobe` — the shared
    trained-assignment block plus the probe-cell rank (same squared-L2
    ordering key as the assignment argmin) and the cell-union scan
    (:func:`trained_multiprobe_tail_sql` — the tail composes over ANY
    block providing ``assigned`` + ``model``, e.g. the staleness audit's
    half-corpus model block)."""
    return f"""
{ivf_assign_trained_sql_ctes(n_clusters, iters, dim)},{trained_multiprobe_tail_sql(probe_ids, k, nprobe)}"""


def trained_multiprobe_tail_sql(probe_ids: list[int], k: int, nprobe: int) -> str:
    """The probes → probe_cells → scored → ranked tail over relations
    ``assigned`` (vec_id, e, centroid_id) and ``model`` (cluster, cd) —
    THE one generator of the multiprobe scan text."""
    ids = ", ".join(str(i) for i in probe_ids)
    cos = _LIST_COS_SQL
    return f"""
probes AS (SELECT vec_id AS probe_id, e AS pe FROM assigned WHERE vec_id IN ({ids})),
probe_cells AS (
  SELECT probe_id, pe, cluster AS centroid_id FROM (
    SELECT probes.probe_id, probes.pe, m.cluster,
           row_number() OVER (
             PARTITION BY probe_id
             ORDER BY list_dot_product(pe, pe) - 2 * list_dot_product(pe, cd)
                      + list_dot_product(cd, cd) ASC,
                      m.cluster ASC
           ) AS rn
    FROM probes, model m
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT probe_id, c.vec_id AS neighbor_id,
         {cos.format(a='pe', b='c.e')} AS cos
  FROM assigned c JOIN probe_cells USING (centroid_id)
  WHERE c.vec_id <> probe_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------- label-blocked kNN graph

def _micro(c: str | Column) -> Column:
    """Embedding components quantized to exact integer micro-units — the
    same ``floor(x·1e6 + 0.5)`` convention as :func:`kmeans_train`, so all
    distance arithmetic is associative int64 math both engines reproduce."""
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long"))


def micro_units(c: str | Column) -> Column:
    """Public form of the micro-unit quantization rule (see :func:`_micro`).
    Every query that quantizes an embedding column MUST use this (and
    :func:`micro_units_sql` on the oracle side) so the rule can never
    silently diverge between call sites."""
    return _micro(c)


def micro_units_sql(expr: str = "embedding") -> str:
    """DuckDB mirror of :func:`micro_units`."""
    return (
        f"list_transform({expr}, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))"
    )


def label_knn_graph(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """k-nearest-neighbor graph confined to label blocks: exact integer
    squared L2 (micro-units) between every pair sharing a label, top-``k``
    edges per vector — the within-class graph SemDeDup-style pruning and
    kNN-graph diversity filters consume.

    The block key bounds the join fan-out exactly like the IVF cell /
    LSH bucket in the ANN family: no all-pairs stage, the per-vector rank
    window sees only its block.  At 100 TB the label is whatever coarse
    quantizer the pipeline already has (IVF cell id, cluster id).
    Micro-unit products stay far under 2^53, so the DuckDB mirror's DOUBLE
    ``list_dot_product`` arithmetic is exact too.
    """
    m = _spread_emb(embeddings).select("vec_id", "label", _micro("embedding").alias("em"))
    a = m.select(F.col("vec_id").alias("vec_id"), "label", F.col("em").alias("ea"))
    b = m.select(F.col("vec_id").alias("neighbor_id"), "label", F.col("em").alias("eb"))
    d2 = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "label")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "label", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "neighbor_id")
    return (
        pairs.withColumn("nn_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("nn_rank") <= k)
        .select("vec_id", F.col("label").cast("int").alias("label"), "nn_rank", "neighbor_id", "d2")
    )


def label_knn_graph_sql(k: int = 3, dim: int = 64) -> str:
    return f"""
WITH m AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS em
  FROM embeddings
), p AS (
  SELECT a.vec_id, a.label, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {dim + 1}),
                                      i -> (a.em[i] - b.em[i]) * (a.em[i] - b.em[i])))
              AS BIGINT) AS d2
  FROM m a JOIN m b ON a.label = b.label AND a.vec_id <> b.vec_id
), r AS (
  SELECT vec_id, CAST(label AS INTEGER) AS label, neighbor_id, d2,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY d2, neighbor_id)
              AS INTEGER) AS nn_rank
  FROM p
)
SELECT vec_id, label, nn_rank, neighbor_id, d2 FROM r WHERE nn_rank <= {k}
"""


# ----------------------------------------------------- embedding statistics

def embedding_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding statistics: vector count, mean vector norm, and
    the centroid norm (‖mean vector‖ — the collapse indicator: ≈ mean norm
    when a label's vectors align, ≈ 0 when they cancel).

    All folds are exact: per-vector squared norms are int64 micro² sums,
    per-vector norms re-quantized to DECIMAL before the label fold, centroid
    components re-quantized to integer micro-units (the kmeans_train mean
    convention) before the final norm.  Two shuffles: per-label norms and
    the (label, dim) component sums.
    """
    m = _spread_emb(embeddings).select("label", _micro("embedding").alias("em"))
    n2 = F.aggregate(
        F.transform("em", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    norms = m.select("label", F.round(F.sqrt(n2.cast("double")) / 1e6, 6).cast("decimal(18,6)").alias("nrm"))
    per_label = norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum("nrm").cast("double") / F.count(F.lit(1)), 6).alias("avg_norm"),
    )
    dims = m.select("label", F.posexplode("em").alias("dim", "v"))
    sums = dims.groupBy("label", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mm = F.floor(F.col("s").cast("double") / F.col("n").cast("double") + F.lit(0.5)).cast("long")
    cn = (
        sums.select("label", mm.alias("mm"))
        .groupBy("label")
        .agg(F.sum(F.col("mm") * F.col("mm")).alias("cn2"))
        .select("label", F.round(F.sqrt(F.col("cn2").cast("double")) / 1e6, 6).alias("centroid_norm"))
    )
    return per_label.join(cn, "label").select(
        F.col("label").cast("int").alias("label"),
        F.col("n_vectors").cast("long").alias("n_vectors"),
        "avg_norm",
        "centroid_norm",
    )


def embedding_stats_sql(dim: int = 64) -> str:
    return f"""
WITH m AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS em
  FROM embeddings
), norms AS (
  SELECT label,
         CAST(round(sqrt(CAST(list_sum(list_transform(em, x -> x * x)) AS DOUBLE)) / 1e6, 6)
              AS DECIMAL(18,6)) AS nrm
  FROM m
), per_label AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
         round(CAST(sum(nrm) AS DOUBLE) / count(*), 6) AS avg_norm
  FROM norms GROUP BY label
), dims AS (
  SELECT label, i AS dim, em[i] AS v
  FROM m, unnest(range(1, {dim + 1})) AS t(i)
), sums AS (
  SELECT label, dim, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
  FROM dims GROUP BY label, dim
), cm AS (
  SELECT label, CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS mm
  FROM sums
), cn AS (
  SELECT label, CAST(sum(mm * mm) AS BIGINT) AS cn2 FROM cm GROUP BY label
)
SELECT CAST(label AS INTEGER) AS label, n_vectors, avg_norm,
       round(sqrt(CAST(cn2 AS DOUBLE)) / 1e6, 6) AS centroid_norm
FROM per_label JOIN cn USING (label)
"""


# --------------------------------------------------------- coreset select

def coreset_select(embeddings: DataFrame, centroid_stride: int = 100) -> DataFrame:
    """Coreset/representative selection: assign every vector to its nearest
    coarse centroid (the :func:`ivf_assign` quantizer), keep the closest
    member per cell — the medoid-style representative set a data-pruning
    pipeline trains on instead of the full corpus (one row per cell,
    however large the corpus).

    One broadcast map pass for assignment + one cell-keyed argmax/count
    aggregate (map-side partial, no rank window).
    """
    emb = _spread_emb(embeddings).select(
        "vec_id", _dbl("embedding").alias("e")
    ).withColumn("en", F.sqrt(dot_col(F.col("e"), F.col("e"))))
    cents = emb.filter(F.col("vec_id") % centroid_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce"),
        F.col("en").alias("cn"),
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        (dot_col(F.col("e"), F.col("ce")) / (F.col("en") * F.col("cn"))).alias("ccos"),
    )
    # both ranks are rn=1 argmaxes, so each becomes a map-side
    # max(struct(ccos, -id)) aggregate (r08 idiom, exact same tie-breaks),
    # and the per-cell size count fuses into the SAME per-centroid
    # aggregate — 2 windows + 1 join collapse to 2 hash aggregations
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("ccos").alias("c"), (-F.col("centroid_id")).alias("ni"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.ni")).alias("centroid_id"), F.col("b.c").alias("ccos"))
    )
    return (
        assigned.groupBy("centroid_id")
        .agg(
            F.max(
                F.struct(F.col("ccos").alias("c"), (-F.col("vec_id")).alias("ni"))
            ).alias("b"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "centroid_id",
            (-F.col("b.ni")).alias("representative_id"),
            F.round(F.col("b.c"), 6).alias("rep_cos"),
            "n_members",
        )
    )


def coreset_select_sql(centroid_stride: int = 100) -> str:
    cos = (
        "list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, e AS ce FROM emb WHERE vec_id % {centroid_stride} = 0),
assigned AS (
  SELECT vec_id, centroid_id, ccos FROM (
    SELECT emb.vec_id, cents.centroid_id,
           {cos.format(a='e', b='ce')} AS ccos,
           row_number() OVER (
             PARTITION BY emb.vec_id
             ORDER BY {cos.format(a='e', b='ce')} DESC, centroid_id ASC
           ) AS rn
    FROM emb, cents
  ) WHERE rn = 1
),
sizes AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_members
          FROM assigned GROUP BY centroid_id),
reps AS (
  SELECT centroid_id, vec_id, ccos,
         row_number() OVER (
           PARTITION BY centroid_id ORDER BY ccos DESC, vec_id ASC
         ) AS rep_rn
  FROM assigned
)
SELECT r.centroid_id, r.vec_id AS representative_id,
       round(r.ccos, 6) AS rep_cos, s.n_members
FROM reps r JOIN sizes s USING (centroid_id) WHERE r.rep_rn = 1
"""


# ------------------------------------------------- covariance / truncation


def embedding_covariance(embeddings: DataFrame, n_dims: int = 8) -> DataFrame:
    """Covariance + correlation matrix over the first ``n_dims`` embedding
    dimensions — the redundancy/whitening diagnostic before PCA or
    dimension truncation.

    Components quantize to exact integer micro-units (the kmeans
    convention), so the second-moment sums are exact BIGINTs at corpus
    scale; covariance and Pearson correlation are fixed double expressions
    over those exact sums (bit-identical cross-engine), reported in
    original (micro^2-descaled) units.

    Plan: one positional explode to (vec, dim, q), one self-join keyed on
    vec_id with i <= j (fan-out n_dims^2/2 per vector), one pair-grain
    aggregation; diagonal moments broadcast back for the correlation.
    At extreme corpus sizes lift the sums to DECIMAL(38,0) — same shape.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    # the exploded frame feeds BOTH sides of the vec-keyed self-join —
    # cache it or the scan + explode runs twice
    dims = track_cached(
        _spread_emb(embeddings).select(
            "vec_id",
            F.posexplode(
                F.expr(
                    f"transform(slice(embedding, 1, {n_dims}),"
                    " x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))"
                )
            ).alias("dim", "q"),
        )
    )
    a = dims.select("vec_id", F.col("dim").alias("i"), F.col("q").alias("qi"))
    b = dims.select("vec_id", F.col("dim").alias("j"), F.col("q").alias("qj"))
    m = (
        a.join(b, "vec_id")
        .where(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qi").alias("si"),
            F.sum("qj").alias("sj"),
            F.sum(F.col("qi") * F.col("qj")).alias("sij"),
        )
    )
    from kafka_replicator_spark.cacheutil import track_cached

    m = track_cached(m)
    diag = m.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("n").alias("dn"), F.col("si").alias("ds"),
        F.col("sij").alias("dss"),
    )
    di = diag.select(F.col("d").alias("i"), F.col("ds").alias("sii_s"), F.col("dss").alias("sii"))
    dj = diag.select(F.col("d").alias("j"), F.col("ds").alias("sjj_s"), F.col("dss").alias("sjj"))
    cov = (
        F.col("sij").cast("double") / F.col("n")
        - (F.col("si").cast("double") / F.col("n"))
        * (F.col("sj").cast("double") / F.col("n"))
    ) / F.lit(1e12)
    corr_num = F.col("n") * F.col("sij").cast("double") - F.col("si").cast(
        "double"
    ) * F.col("sj").cast("double")
    corr_den = F.sqrt(
        (F.col("n") * F.col("sii").cast("double") - F.col("sii_s").cast("double") * F.col("sii_s").cast("double"))
        * (F.col("n") * F.col("sjj").cast("double") - F.col("sjj_s").cast("double") * F.col("sjj_s").cast("double"))
    )
    return (
        m.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            F.col("n").cast("long").alias("n_vectors"),
            F.round(cov, 6).alias("covariance"),
            F.round(corr_num / F.nullif(corr_den, F.lit(0.0)), 6).alias("correlation"),
        )
    )


def embedding_covariance_sql(n_dims: int = 8) -> str:
    return f"""
WITH dims AS (
  SELECT vec_id,
         generate_subscripts(embedding[1:{n_dims}], 1) - 1 AS dim,
         unnest(list_transform(embedding[1:{n_dims}],
                               x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS q
  FROM embeddings
),
m AS (
  SELECT a.dim AS i, b.dim AS j, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.q) AS BIGINT) AS si, CAST(sum(b.q) AS BIGINT) AS sj,
         CAST(sum(a.q * b.q) AS BIGINT) AS sij
  FROM dims a JOIN dims b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
),
diag AS (SELECT i AS d, si AS ds, sij AS dss FROM m WHERE i = j)
SELECT CAST(m.i AS INTEGER) AS dim_i, CAST(m.j AS INTEGER) AS dim_j,
       m.n AS n_vectors,
       round((CAST(m.sij AS DOUBLE) / m.n
              - (CAST(m.si AS DOUBLE) / m.n) * (CAST(m.sj AS DOUBLE) / m.n))
             / 1e12, 6) AS covariance,
       round((m.n * CAST(m.sij AS DOUBLE)
              - CAST(m.si AS DOUBLE) * CAST(m.sj AS DOUBLE))
             / nullif(sqrt((m.n * CAST(di.dss AS DOUBLE)
                            - CAST(di.ds AS DOUBLE) * CAST(di.ds AS DOUBLE))
                           * (m.n * CAST(dj.dss AS DOUBLE)
                              - CAST(dj.ds AS DOUBLE) * CAST(dj.ds AS DOUBLE))), 0),
             6) AS correlation
FROM m
JOIN diag di ON di.d = m.i
JOIN diag dj ON dj.d = m.j
"""


def dim_truncation_recall(
    embeddings: DataFrame, probe_ids: list[int], k: int = 5, trunc: int = 32
) -> DataFrame:
    """Matryoshka-style truncation audit: overlap between the exact top-k
    under the first ``trunc`` dimensions and under the full vector, per
    probe — the retrieval-quality price of dimension truncation.

    Both rankings are the broadcast-probe brute-force plan (corpus never
    shuffles); the overlap join is k-row-per-probe scale.
    """
    full = brute_force_topk(embeddings, probe_ids, k=k).select(
        "probe_id", "neighbor_id"
    )
    t = embeddings.select(
        "vec_id", F.expr(f"slice(embedding, 1, {trunc})").alias("embedding")
    )
    part = brute_force_topk(t, probe_ids, k=k).select(
        "probe_id", F.col("neighbor_id").alias("t_neighbor_id")
    )
    hits = full.join(
        part,
        (full.probe_id == part.probe_id)
        & (full.neighbor_id == part.t_neighbor_id),
    ).groupBy(full.probe_id.alias("probe_id")).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    base = full.groupBy("probe_id").agg(F.count(F.lit(1)).alias("k_eff"))
    return base.join(hits, "probe_id", "left").select(
        "probe_id",
        F.col("k_eff").cast("long").alias("k_eff"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        F.expr("(1000000 * coalesce(n_overlap, 0)) div k_eff").alias("recall_ppm"),
    )


def dim_truncation_recall_sql(probe_ids: list[int], k: int = 5, trunc: int = 32) -> str:
    ids = ", ".join(str(i) for i in probe_ids)
    cos = (
        "list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                    (embedding[1:{trunc}])::DOUBLE[] AS et FROM embeddings),
probes AS (SELECT vec_id AS probe_id, e AS pe, et AS pet FROM emb
           WHERE vec_id IN ({ids})),
full_r AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY {cos.format(a='pe', b='e')} DESC, vec_id ASC) AS rank
    FROM emb, probes WHERE vec_id <> probe_id
  ) WHERE rank <= {k}
),
trunc_r AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY {cos.format(a='pet', b='et')} DESC, vec_id ASC) AS rank
    FROM emb, probes WHERE vec_id <> probe_id
  ) WHERE rank <= {k}
),
hits AS (
  SELECT f.probe_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM full_r f JOIN trunc_r t
    ON t.probe_id = f.probe_id AND t.neighbor_id = f.neighbor_id
  GROUP BY f.probe_id
),
base AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS k_eff
         FROM full_r GROUP BY probe_id)
SELECT base.probe_id, base.k_eff,
       coalesce(hits.n_overlap, 0) AS n_overlap,
       (1000000 * coalesce(hits.n_overlap, 0)) // base.k_eff AS recall_ppm
FROM base LEFT JOIN hits USING (probe_id)
"""


def pca_power_iteration(
    embeddings: DataFrame, n_dims: int = 8, n_iter: int = 3
) -> DataFrame:
    """Dominant principal component by fixed-iteration power method over
    the (quantized) covariance matrix of the first ``n_dims`` dimensions —
    the distributed PCA core (deflation for further components repeats the
    same plan).

    The covariance entries come from :func:`embedding_covariance` (exact
    moment sums, 6-dp quantized), so the matrix is engine-independent;
    each iteration is a matrix-vector multiply as a dims^2-row join with
    9-dp re-quantized DECIMAL folds (the registry's exact-fold convention)
    and a broadcast 1-row normalizer.  ``n_iter`` is fixed — every engine
    reproduces the trajectory bit-for-bit, no convergence test, no driver
    state.  Output: (dim, loading, eigenvalue-estimate = final |Cv|).
    """
    import math

    from kafka_replicator_spark.cacheutil import track_cached

    cov = embedding_covariance(embeddings, n_dims=n_dims).select(
        F.col("dim_i").alias("i"), F.col("dim_j").alias("j"),
        F.col("covariance").alias("c"),
    )
    cm = track_cached(
        cov.union(
            cov.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "c"
            )
        )
    )
    spark = embeddings.sparkSession
    v0 = round(1.0 / math.sqrt(n_dims), 9)
    v = spark.range(n_dims).select(
        F.col("id").cast("int").alias("dim"), F.lit(v0).alias("v")
    )
    nrm = None
    for _ in range(n_iter):
        w = (
            cm.join(F.broadcast(v), cm.j == v.dim)
            .select("i", F.round(F.col("c") * F.col("v"), 9).cast("decimal(28,9)").alias("t"))
            .groupBy("i")
            .agg(F.sum("t").cast("double").alias("s"))
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("s") * F.col("s"), 9).cast("decimal(28,9)")
                ).cast("double")
            ).alias("nrm")
        )
        v = w.join(F.broadcast(nrm)).select(
            F.col("i").alias("dim"), F.round(F.col("s") / F.col("nrm"), 9).alias("v")
        )
    return v.join(F.broadcast(nrm)).select(
        "dim",
        F.round("v", 6).alias("loading"),
        F.round("nrm", 6).alias("eigenvalue"),
    )


def pca_power_iteration_sql(n_dims: int = 8, n_iter: int = 3) -> str:
    import math

    v0 = round(1.0 / math.sqrt(n_dims), 9)
    sql = f"""
WITH cov AS (
  SELECT dim_i AS i, dim_j AS j, covariance AS c
  FROM ({embedding_covariance_sql(n_dims=n_dims)})
),
cm AS (
  SELECT i, j, c FROM cov
  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i <> j
),
v0 AS (SELECT CAST(unnest(range({n_dims})) AS INTEGER) AS dim, {v0!r}::DOUBLE AS v)"""
    prev = "v0"
    for k in range(1, n_iter + 1):
        sql += f""",
w{k} AS (
  SELECT cm.i, CAST(sum(CAST(round(cm.c * p.v, 9) AS DECIMAL(28,9))) AS DOUBLE) AS s
  FROM cm JOIN {prev} p ON p.dim = cm.j GROUP BY cm.i
),
n{k} AS (
  SELECT sqrt(CAST(sum(CAST(round(s * s, 9) AS DECIMAL(28,9))) AS DOUBLE)) AS nrm
  FROM w{k}
),
v{k} AS (SELECT i AS dim, round(s / nrm, 9) AS v FROM w{k}, n{k})"""
        prev = f"v{k}"
    sql += f"""
SELECT dim, round(v, 6) AS loading, round(nrm, 6) AS eigenvalue
FROM {prev}, n{n_iter}
"""
    return sql
