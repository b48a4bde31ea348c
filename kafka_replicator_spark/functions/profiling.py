"""Data-quality audit operators (Deequ-style) for pipeline pre-flight.

A 100 TB ingest runs completeness / uniqueness / referential-integrity /
distribution checks before any training-data job trusts the corpus; these are
the distributable cores of that audit suite.  The reference engine
(CrowdStrike/kafka-replicator) has no column-level surface — its integrity
checks are segment-grain (pkg/segments sanity predicates, covered by
operators/compaction.py); this family extends the same idea to column grain
on the analytics tables.

Scale notes:
* every audit is one aggregation pass per table (map-side partial aggs), or
  an anti-join on the natural key for FK orphans — no windows, no driver
  loops; outputs are column-/relationship-grain (tiny at any corpus size).
* shares are exact integer ppm (``1000000 * x div y``) so the DuckDB oracle
  hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# completeness / distinctness profile


def column_profile(df: DataFrame, table_name: str, cols: list[str]) -> DataFrame:
    """Per-column completeness + distinctness profile (the Deequ core).

    One aggregation pass computes every column's null count and distinct
    count; the single result row is unpivoted to column grain with
    ``stack`` so the scan runs once regardless of column count.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    long = row.select(
        F.lit(table_name).alias("table_name"),
        F.col("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_non_null, n_distinct)"
        ),
    )
    return long.select(
        "table_name",
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.expr("(1000000 * n_non_null) div n_rows").alias("completeness_ppm"),
        F.expr("(1000000 * n_distinct) div n_rows").alias("distinctness_ppm"),
    )


def column_profile_sql(table_name: str, cols: list[str]) -> str:
    selects = []
    for c in cols:
        selects.append(
            f"""
SELECT '{table_name}' AS table_name, '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       (1000000 * count({c})) // count(*) AS completeness_ppm,
       (1000000 * count(DISTINCT {c})) // count(*) AS distinctness_ppm
FROM {table_name}"""
        )
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# referential integrity

#: (relationship name, child table, child key, parent table, parent key) —
#: the corpus' natural FK graph
FK_EDGES = (
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
)


def fk_orphans(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit: orphan child KEYS per FK relationship
    (``n_orphan_keys`` counts distinct child key values with no parent,
    not child rows — a key shared by many rows counts once).

    Child keys collapse to distinct values FIRST, then anti-join the parent
    key set — the shuffle moves |distinct keys| rows, not the fact table,
    and the per-relationship output is one row.  At 100 TB the anti-join is
    a hash join on the key (broadcast when the parent is a dim).

    One scan per CHILD TABLE, not per relationship: each child's slim
    FK-column projection is cached once and every relationship on that
    table (lineitem carries three) derives its counts and distinct key set
    from the cached frame — 3 scans total here instead of 10.
    """
    from collections import defaultdict

    from kafka_replicator_spark.cacheutil import track_cached

    by_child: dict[str, list] = defaultdict(list)
    for edge in FK_EDGES:
        by_child[edge[1]].append(edge)

    slim: dict[str, DataFrame] = {}
    counts: dict[str, DataFrame] = {}
    for child_t, edges in by_child.items():
        keys = [e[2] for e in edges]
        slim[child_t] = track_cached(tables[child_t].select(*keys))
        aggs = [F.count(F.lit(1)).alias("n_child_rows")]
        for k in keys:
            aggs.append(F.count_distinct(F.col(k)).alias(f"nd_{k}"))
        counts[child_t] = slim[child_t].agg(*aggs)

    parts = []
    for name, child_t, child_k, parent_t, parent_k in FK_EDGES:
        parent = tables[parent_t].select(F.col(parent_k).alias("__pk")).distinct()
        rows = counts[child_t].select(
            F.lit(name).alias("relationship"),
            F.col("n_child_rows"),
            F.col(f"nd_{child_k}").alias("n_child_keys"),
        )
        orphan_keys = (
            slim[child_t]
            .select(F.col(child_k).alias("__pk"))
            .distinct()
            .join(parent, "__pk", "left_anti")
        )
        n_orphans = orphan_keys.agg(
            F.count(F.lit(1)).alias("n_orphan_keys")
        ).withColumn("relationship", F.lit(name))
        parts.append(
            rows.join(F.broadcast(n_orphans), "relationship").select(
                "relationship",
                F.col("n_child_rows").cast("long").alias("n_child_rows"),
                F.col("n_child_keys").cast("long").alias("n_child_keys"),
                F.col("n_orphan_keys").cast("long").alias("n_orphan_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fk_orphans_sql() -> str:
    selects = []
    for name, child_t, child_k, parent_t, parent_k in FK_EDGES:
        selects.append(
            f"""
SELECT '{name}' AS relationship,
       (SELECT CAST(count(*) AS BIGINT) FROM {child_t}) AS n_child_rows,
       (SELECT CAST(count(DISTINCT {child_k}) AS BIGINT) FROM {child_t}) AS n_child_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM
          (SELECT DISTINCT {child_k} AS k FROM {child_t}) c
          WHERE NOT EXISTS (SELECT 1 FROM {parent_t} p WHERE p.{parent_k} = c.k)
       ) AS n_orphan_keys"""
        )
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# key uniqueness

#: (table, key columns) candidate keys the corpus promises
CANDIDATE_KEYS = (
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
)


def uniqueness_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Candidate-key uniqueness audit: rows vs distinct keys vs rows living
    in duplicated key groups, per declared key.

    ``n_dup_rows`` needs the group sizes, so each table runs one key-grain
    aggregation and one tiny re-aggregation over group sizes (group-count
    grain — bounded by distinct keys, partial-agg friendly).
    """
    parts = []
    for table, keys in CANDIDATE_KEYS:
        key_name = ",".join(keys)
        grp = tables[table].groupBy(*[F.col(k) for k in keys]).agg(
            F.count(F.lit(1)).alias("n")
        )
        parts.append(
            grp.agg(
                F.sum("n").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
                    "n_dup_rows"
                ),
            ).select(
                F.lit(table).alias("table_name"),
                F.lit(key_name).alias("key_columns"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_keys").cast("long").alias("n_keys"),
                F.col("n_dup_rows").cast("long").alias("n_dup_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def uniqueness_audit_sql() -> str:
    selects = []
    for table, keys in CANDIDATE_KEYS:
        key_name = ",".join(keys)
        key_cols = ", ".join(keys)
        selects.append(
            f"""
SELECT '{table}' AS table_name, '{key_name}' AS key_columns,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows
FROM (SELECT {key_cols}, count(*) AS n FROM {table} GROUP BY {key_cols})"""
        )
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Benford leading-digit audit

import math

#: Benford expected share of leading digit d in ppm — Python-computed
#: literals so both engines consume identical constants
BENFORD_PPM = {d: round(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}


def benford_digits(orders: DataFrame, col: str = "o_totalprice") -> DataFrame:
    """Benford's-law audit of a monetary column (fraud/synthesis smell test).

    The leading digit comes from exact integer arithmetic — cents as BIGINT,
    first character of its decimal rendering — never ``log10`` of a double
    (engines can disagree in the last ulp at powers of ten).  One
    aggregation; 9 output rows at any scale.
    """
    cents = orders.select(
        F.expr(f"CAST(round({col} * 100) AS BIGINT)").alias("n_cents")
    ).where(F.col("n_cents") > 0)
    lead = cents.select(
        F.substring(F.col("n_cents").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = lead.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    bench = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )
    return counts.join(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.expr("(1000000 * n) div t").alias("share_ppm"),
        bench[F.col("digit")].cast("long").alias("benford_ppm"),
        (F.expr("(1000000 * n) div t") - bench[F.col("digit")].cast("long")).alias(
            "deviation_ppm"
        ),
    )


def benford_digits_sql(col: str = "o_totalprice") -> str:
    cases = " ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items())
    return f"""
WITH cents AS (
  SELECT CAST(round({col} * 100) AS BIGINT) AS n_cents FROM orders
  WHERE CAST(round({col} * 100) AS BIGINT) > 0
),
lead AS (
  SELECT CAST(substr(CAST(n_cents AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM cents
),
counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM lead GROUP BY digit),
tot AS (SELECT sum(n) AS t FROM counts)
SELECT digit, n,
       (1000000 * n) // CAST(t AS BIGINT) AS share_ppm,
       CAST(CASE digit {cases} END AS BIGINT) AS benford_ppm,
       (1000000 * n) // CAST(t AS BIGINT)
         - CAST(CASE digit {cases} END AS BIGINT) AS deviation_ppm
FROM counts, tot
"""
