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
