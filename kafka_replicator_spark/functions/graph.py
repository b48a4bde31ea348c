"""Graph operators over similarity edges — fixed-iteration PageRank.

An LLM data pipeline uses graph centrality over kNN/duplicate graphs to
pick representative documents (rank-aware dedup survivors, coreset
selection).  PageRank here is the **fixed-iteration, join-based** variant:
each iteration is one shuffle join of the edge list against the current
rank frame plus one aggregation — the classic Pregel-free DataFrame
restatement that scales with |E| per round and needs no driver-side state.

Cross-engine determinism: per-edge contributions are ``round(pr/outdeg, 9)``
summed as DECIMAL (order-independent), each new rank re-quantized to 9 dp —
the registry's exact-fold convention, so any engine reproduces the
trajectory bit-for-bit.  Dangling mass is not redistributed (documented
simplification — kNN graphs have uniform out-degree k by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
BASE = 0.15


def pagerank_fixed(
    edges: DataFrame,
    src: str = "vec_id",
    dst: str = "neighbor_id",
    n_iter: int = 2,
) -> DataFrame:
    """PageRank after ``n_iter`` exact synchronous iterations from pr₀ = 1.

    ``edges`` is a directed edge list; out-degrees come from one
    aggregation and ride the edge frame.  Nodes with no in-edges settle at
    the base score; every node present as source or target appears in the
    output.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("to")).join(
        outdeg, "node"
    )
    pr = nodes.withColumn("pr", F.lit(1.0))
    for _ in range(n_iter):
        contrib = (
            e.join(pr, "node")
            .select(
                F.col("to").alias("node"),
                F.round(F.col("pr") / F.col("outdeg"), 9)
                .cast("decimal(18,9)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            F.round(
                F.lit(BASE) + F.lit(DAMPING) * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                9,
            ).alias("pr"),
        )
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


def pagerank_fixed_sql(edges_cte: str, n_iter: int = 2) -> str:
    """DuckDB mirror: ``edges_cte`` must yield (vec_id, neighbor_id)."""
    sql = f"""
WITH edges AS ({edges_cte}),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT vec_id AS node FROM edges
    UNION ALL SELECT neighbor_id AS node FROM edges
  )
),
outdeg AS (SELECT vec_id AS node, count(*) AS outdeg FROM edges GROUP BY vec_id),
e AS (
  SELECT edges.vec_id AS node, edges.neighbor_id AS to_node, outdeg.outdeg
  FROM edges JOIN outdeg ON outdeg.node = edges.vec_id
),
pr0 AS (SELECT node, 1.0::DOUBLE AS pr FROM nodes)"""
    prev = "pr0"
    for i in range(1, n_iter + 1):
        sql += f""",
c{i} AS (
  SELECT e.to_node AS node,
         sum(CAST(round(p.pr / e.outdeg, 9) AS DECIMAL(18,9))) AS s
  FROM e JOIN {prev} p ON p.node = e.node
  GROUP BY e.to_node
),
pr{i} AS (
  SELECT nodes.node,
         round({BASE} + {DAMPING} * coalesce(CAST(c{i}.s AS DOUBLE), 0.0), 9) AS pr
  FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node
)"""
        prev = f"pr{i}"
    sql += f"\nSELECT node, round(pr, 6) AS pagerank FROM {prev}"
    return sql


# ---------------------------------------------------------------------------
# undirected simple-graph analytics (triangles / degrees / link prediction)


def undirect(edges: DataFrame, src: str = "vec_id", dst: str = "neighbor_id") -> DataFrame:
    """Canonicalize a directed edge list to an undirected simple graph:
    ``(u, v)`` with ``u < v``, self-loops dropped, duplicates collapsed."""
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    )
    return e.where(F.col("u") != F.col("v")).distinct()


def undirect_sql(edges_cte: str) -> str:
    return f"""
SELECT DISTINCT least(vec_id, neighbor_id) AS u,
                greatest(vec_id, neighbor_id) AS v
FROM ({edges_cte}) WHERE vec_id <> neighbor_id"""


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of an undirected simple graph (1 output row):
    nodes, edges, triangles, wedges, and the global clustering coefficient
    ``3·triangles/wedges`` in exact integer ppm.

    Scale: the classic degree-ordered orientation (each edge points from
    its lower-(degree, id) endpoint) bounds every node's out-degree by
    O(√m), so the wedge join materializes O(m^1.5) rows worst-case instead
    of Σ deg² — the standard distributed triangle-count plan (one degree
    aggregation + two |E|-keyed shuffle joins).

    ``edges`` must already be canonical (:func:`undirect` output).
    """
    deg = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient by (degree, id): lower endpoint → higher endpoint
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("b"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("c"))
    wedges = w1.join(w2, "s").where(F.col("b") < F.col("c"))
    closing = edges.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    )  # canonical edges already have b < c
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(deg * (deg - 1)) div 2").alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        summary.join(F.broadcast(n_edges))
        .join(F.broadcast(tri))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.expr(
                "CASE WHEN n_wedges = 0 THEN 0"
                " ELSE (1000000 * 3 * n_triangles) div n_wedges END"
            ).alias("clustering_ppm"),
        )
    )


def triangle_stats_sql(edges_cte: str) -> str:
    """DuckDB mirror over the id-ordered form (a<b<c triple join) — same
    count as the degree-ordered plan, simplest exact restatement."""
    return f"""
WITH e AS ({undirect_sql(edges_cte)}),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges
  FROM deg
),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
SELECT s.n_nodes, m.n_edges, tri.n_triangles, s.n_wedges,
       CASE WHEN s.n_wedges = 0 THEN 0
            ELSE (1000000 * 3 * tri.n_triangles) // s.n_wedges END AS clustering_ppm
FROM s, m, tri
"""


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree → node-count histogram of an undirected simple graph (plus
    share in exact ppm).  Two aggregations; output bounded by max degree."""
    deg = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    tot = hist.agg(F.sum("n_nodes").alias("t"))
    return hist.join(F.broadcast(tot)).select(
        F.col("degree").cast("long").alias("degree"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.expr("(1000000 * n_nodes) div t").alias("share_ppm"),
    )


def degree_histogram_sql(edges_cte: str) -> str:
    return f"""
WITH e AS ({undirect_sql(edges_cte)}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY degree),
tot AS (SELECT sum(n_nodes) AS t FROM hist)
SELECT degree, n_nodes,
       (1000000 * n_nodes) // CAST(t AS BIGINT) AS share_ppm
FROM hist, tot
"""


def common_neighbor_candidates(edges: DataFrame, min_common: int = 2) -> DataFrame:
    """Link prediction by common neighbors: non-adjacent node pairs sharing
    ≥ ``min_common`` neighbors, scored by count and Jaccard overlap of
    neighborhoods (exact integer ppm).

    Plan: wedges enumerate through the shared endpoint (one |E| self-join
    keyed on the center node — fan-out Σ deg², acceptable on bounded-degree
    kNN/dup graphs and prunable by orienting on bounded-degree centers),
    existing edges anti-join out, degrees ride a broadcast-sized frame.
    """
    deg = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    # adjacency in both directions, keyed on the wedge center
    adj = edges.select(F.col("u").alias("center"), F.col("v").alias("leaf")).union(
        edges.select(F.col("v").alias("center"), F.col("u").alias("leaf"))
    )
    a = adj.select("center", F.col("leaf").alias("b"))
    b = adj.select("center", F.col("leaf").alias("c"))
    wedges = a.join(b, "center").where(F.col("b") < F.col("c"))
    cn = wedges.groupBy(F.col("b").alias("u"), F.col("c").alias("v")).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    cand = cn.join(edges, ["u", "v"], "left_anti").where(
        F.col("n_common") >= min_common
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr("(1000000 * n_common) div (du + dv - n_common)").alias(
                "jaccard_ppm"
            ),
        )
    )


def common_neighbor_candidates_sql(edges_cte: str, min_common: int = 2) -> str:
    return f"""
WITH e AS ({undirect_sql(edges_cte)}),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
adj AS (
  SELECT u AS center, v AS leaf FROM e
  UNION ALL SELECT v AS center, u AS leaf FROM e
),
cn AS (
  SELECT a.leaf AS u, b.leaf AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM adj a JOIN adj b ON a.center = b.center AND a.leaf < b.leaf
  GROUP BY a.leaf, b.leaf
),
cand AS (
  SELECT cn.* FROM cn
  WHERE n_common >= {min_common}
    AND NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.u AND e.v = cn.v)
)
SELECT cand.u, cand.v, cand.n_common,
       (1000000 * cand.n_common) // (du.deg + dv.deg - cand.n_common) AS jaccard_ppm
FROM cand
JOIN deg du ON du.node = cand.u
JOIN deg dv ON dv.node = cand.v
"""
