"""Classifier/eval statistics over corpus-scale score frames: rank-sum
ROC-AUC, calibration (ECE bins), categorical drift (chi-square), and
Wilson score intervals.

These are the "did the filter actually work" metrics a curation pipeline
publishes next to its quality/dedup scores: AUC of the quality classifier
against a ground-truth label, reliability of the score as a probability,
distribution drift between corpus halves, and uncertainty bounds on
per-source rates.  No reference-engine analog (the reference is
segment-grain transport — pkg/segments); this is LLM-pipeline surface.

Cross-engine determinism: every statistic is either exact integer ppm
arithmetic (AUC, ECE — DECIMAL(38,0)/HUGEINT folds where products can pass
int64) or a single fixed double expression over exact integer inputs,
rounded to 6 dp (chi-square, Wilson) — no float folds across rows.

Scale notes: AUC's global "count of strictly-smaller scores" prefix uses
the range-partition stitch scaffold (functions/stitch.py), never a global
single-partition window; everything else is count-grain aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ECE bin count (deciles of the predicted probability)
ECE_BINS = 10


# ------------------------------------------------------- rank-sum ROC-AUC

def auc_rank_sum(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum identity:

        AUC = (R1 - n1(n1+1)/2) / (n1 * n0)

    with R1 the sum of average ranks of the positives (ties get the average
    rank, the standard correction).  Everything stays integral by carrying
    2*R1: a tied group with ``below`` strictly-smaller rows and ``cnt``
    members contributes ``pos * (2*below + cnt + 1)``.

    The ``below`` prefix over distinct scores comes from
    :func:`~kafka_replicator_spark.functions.stitch.range_prefix_stitch`
    (range-partition + per-partition window + broadcast offsets) — exact at
    any distinct-score cardinality, no global window.  The final ppm ratio
    is DECIMAL(38,0) (2*R1 is O(n²) — int64 wraps past ~3e9 rows).

    Output (1 row): n_pos, n_neg, auc_ppm.
    """
    from kafka_replicator_spark.functions.stitch import range_prefix_stitch

    g = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    tagged, prefix = range_prefix_stitch(g, "__s", "cnt", agg="sum")
    run = (
        Window.partitionBy("__pid")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tagged.join(F.broadcast(prefix), "__pid").select(
        "cnt",
        "pos",
        (F.coalesce(F.col("__prefix"), F.lit(0)) + F.sum("cnt").over(run) - F.col("cnt")).alias(
            "below"
        ),
    )
    totals = cum.agg(
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("n1"),
        # pos lifts to DECIMAL BEFORE the multiply (matching the HUGEINT
        # oracle): the per-term product is O(n²) and wraps int64 silently
        # past ~3e9 rows under non-ANSI Spark
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("below") + F.col("cnt") + 1)
        ).alias("two_r1"),
    )
    return totals.select(
        F.col("n1").cast("long").alias("n_pos"),
        (F.col("n") - F.col("n1")).cast("long").alias("n_neg"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (two_r1 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)))"
            " div nullif(CAST(2 AS DECIMAL(38,0)) * n1 * (n - n1), 0) AS BIGINT)"
        ).alias("auc_ppm"),
    )


def auc_rank_sum_sql(scored_cte: str, score_col: str, label_col: str) -> str:
    """DuckDB mirror: ``scored_cte`` must define a relation ``scored`` with
    ``score_col`` and a 0/1 ``label_col``; a single global window is fine
    oracle-side."""
    return f"""
WITH {scored_cte},
g AS (
  SELECT {score_col} AS s, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum({label_col}) AS BIGINT) AS pos
  FROM scored GROUP BY {score_col}
),
c AS (
  SELECT cnt, pos,
         CAST(sum(cnt) OVER (ORDER BY s) - cnt AS BIGINT) AS below
  FROM g
),
t AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n1,
         sum(pos::HUGEINT * (2 * below + cnt + 1)) AS two_r1
  FROM c
)
SELECT n1 AS n_pos, CAST(n - n1 AS BIGINT) AS n_neg,
       CAST((1000000::HUGEINT * (two_r1 - n1::HUGEINT * (n1 + 1)))
            // nullif(2::HUGEINT * n1 * (n - n1), 0) AS BIGINT) AS auc_ppm
FROM t
"""


# --------------------------------------------------- calibration (ECE bins)

def calibration_bins(
    scored: DataFrame, s_col: str, n_col: str, label_col: str
) -> DataFrame:
    """Reliability diagram for a linear milli-score used as a probability:
    p̂ = (mean_milli + 1000) / 2000 mapped to exact integer ppm as
    ``(500·s + 500000·n) div n`` (non-negative by construction — s ≥
    -1000·n — so integer div agrees across engines), bucketed into
    :data:`ECE_BINS` deciles.

    Per bin: document count, positives, mean confidence, accuracy, and the
    |confidence - accuracy| gap, all exact integer ppm (the per-bin
    confidence sum is folded in DECIMAL(38,0) — 1e6 per doc wraps int64
    near 9e12 docs).  The corpus ECE is the bin-count-weighted mean of
    ``gap_ppm`` — left at bin grain so the full reliability curve ships.

    Output (≤ ECE_BINS rows): bin, n_docs, n_pos, conf_ppm, acc_ppm,
    gap_ppm.
    """
    width = 1_000_000 // ECE_BINS
    p = scored.select(
        F.expr(f"(500 * {s_col} + 500000 * {n_col}) div {n_col}").alias("p_ppm"),
        F.col(label_col).cast("long").alias("y"),
    ).select(
        F.expr(f"least(p_ppm div {width}, {ECE_BINS - 1})").cast("long").alias("bin"),
        "p_ppm",
        "y",
    )
    per_bin = p.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("p_ppm").cast("decimal(38,0)")).alias("sum_p"),
    )
    return per_bin.select(
        "bin",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.expr("CAST(sum_p div n_docs AS BIGINT)").alias("conf_ppm"),
        F.expr("(1000000 * n_pos) div n_docs").alias("acc_ppm"),
        F.expr(
            "abs(CAST(sum_p div n_docs AS BIGINT) - (1000000 * n_pos) div n_docs)"
        ).alias("gap_ppm"),
    ).orderBy("bin")


def calibration_bins_sql(scored_cte: str, s_col: str, n_col: str, label_col: str) -> str:
    width = 1_000_000 // ECE_BINS
    return f"""
WITH {scored_cte},
p AS (
  SELECT least(((500 * {s_col} + 500000 * {n_col}) // {n_col}) // {width},
               {ECE_BINS - 1}) AS bin,
         (500 * {s_col} + 500000 * {n_col}) // {n_col} AS p_ppm,
         CAST({label_col} AS BIGINT) AS y
  FROM scored
),
b AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos,
         sum(p_ppm::HUGEINT) AS sum_p
  FROM p GROUP BY bin
)
SELECT bin, n_docs, n_pos,
       CAST(sum_p // n_docs AS BIGINT) AS conf_ppm,
       (1000000 * n_pos) // n_docs AS acc_ppm,
       abs(CAST(sum_p // n_docs AS BIGINT) - (1000000 * n_pos) // n_docs) AS gap_ppm
FROM b ORDER BY bin
"""


# ----------------------------------------- categorical drift (chi-square)

def categorical_drift_chi2(
    events: DataFrame, key_col: str, day_col: str
) -> DataFrame:
    """Chi-square drift between the early and late half of the corpus
    window: the day range splits at its midpoint, the ``key_col``
    distribution is compared across halves, and each key's chi-square
    contribution ``(o-e)²/e`` (both halves) ships as its own row — per-key
    doubles are single fixed expressions over exact integer counts (no
    cross-row float folds), rounded to 6 dp.

    Two aggregations: key×half counts, then a broadcast totals frame.
    Output (key-cardinality rows): key, n_early, n_late, chi2_contrib.
    """
    bounds = events.agg(
        F.min(day_col).alias("d0"), F.max(day_col).alias("d1")
    )
    half = events.join(F.broadcast(bounds)).select(
        F.col(key_col).alias("key"),
        (F.col(day_col) < F.expr("(d0 + d1 + 1) div 2")).cast("int").alias("early"),
    )
    per_key = half.groupBy("key").agg(
        F.sum("early").alias("ne"),
        F.sum(1 - F.col("early")).alias("nl"),
    )
    tot = per_key.agg(
        F.sum("ne").alias("te"), F.sum("nl").alias("tl")
    )
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "key",
            F.col("ne").cast("long").alias("n_early"),
            F.col("nl").cast("long").alias("n_late"),
            # nullif-guard the expected counts: a single-day corpus makes
            # one half empty (te or tl = 0) — Spark's non-ANSI /0 yields
            # NULL where DuckDB's IEEE division yields inf/NaN, so both
            # engines must take the NULL path on degenerate input
            F.round(
                F.expr(
                    "pow(ne - CAST(ne + nl AS DOUBLE) * te / (te + tl), 2)"
                    " / nullif(CAST(ne + nl AS DOUBLE) * te / (te + tl), 0)"
                    " + pow(nl - CAST(ne + nl AS DOUBLE) * tl / (te + tl), 2)"
                    " / nullif(CAST(ne + nl AS DOUBLE) * tl / (te + tl), 0)"
                ),
                6,
            ).alias("chi2_contrib"),
        )
    )


def categorical_drift_chi2_sql(events_cte: str, key_col: str, day_col: str) -> str:
    """``events_cte`` must define relation ``ev`` with ``key_col`` and an
    integer ``day_col``."""
    return f"""
WITH {events_cte},
bounds AS (SELECT min({day_col}) AS d0, max({day_col}) AS d1 FROM ev),
half AS (
  SELECT {key_col} AS key,
         CAST({day_col} < (d0 + d1 + 1) // 2 AS INTEGER) AS early
  FROM ev CROSS JOIN bounds
),
per_key AS (
  SELECT key, CAST(sum(early) AS BIGINT) AS ne,
         CAST(sum(1 - early) AS BIGINT) AS nl
  FROM half GROUP BY key
),
tot AS (SELECT CAST(sum(ne) AS BIGINT) AS te, CAST(sum(nl) AS BIGINT) AS tl FROM per_key)
SELECT key, ne AS n_early, nl AS n_late,
       round(pow(ne - CAST(ne + nl AS DOUBLE) * te / (te + tl), 2)
             / nullif(CAST(ne + nl AS DOUBLE) * te / (te + tl), 0)
             + pow(nl - CAST(ne + nl AS DOUBLE) * tl / (te + tl), 2)
             / nullif(CAST(ne + nl AS DOUBLE) * tl / (te + tl), 0), 6) AS chi2_contrib
FROM per_key CROSS JOIN tot
"""


# ------------------------------------------------ Wilson score intervals

def wilson_interval(counts: DataFrame, n_col: str, k_col: str) -> DataFrame:
    """95% Wilson score interval for a per-group proportion ``k/n`` — the
    uncertainty bound a dup-rate / violation-rate dashboard publishes so
    small sources aren't over-read.  One fixed double expression per bound
    over the exact integer (n, k) pair, rounded to 6 dp (z = 1.96 as the
    literal 1.96; z² as the literal 3.8416 — identical text both engines,
    no constant-folding divergence).

    Input: any frame with group columns + ``n_col``/``k_col``; output keeps
    the group columns and adds p_lo/p_hi.
    """
    n, k = F.col(n_col).cast("double"), F.col(k_col).cast("double")
    denom = 1 + 3.8416 / n
    center = (k / n + 3.8416 / (2 * n)) / denom
    half = (
        1.96
        * F.sqrt((k / n) * (1 - k / n) / n + 3.8416 / (4 * n * n))
        / denom
    )
    return counts.select(
        "*",
        F.round(F.greatest(center - half, F.lit(0.0)), 6).alias("p_lo"),
        F.round(F.least(center + half, F.lit(1.0)), 6).alias("p_hi"),
    )


def wilson_interval_sql(n_col: str, k_col: str) -> tuple[str, str]:
    """(p_lo_expr, p_hi_expr) SQL fragments over BIGINT ``n_col``/``k_col``."""
    n, k = f"CAST({n_col} AS DOUBLE)", f"CAST({k_col} AS DOUBLE)"
    denom = f"(1 + 3.8416 / {n})"
    center = f"(({k} / {n} + 3.8416 / (2 * {n})) / {denom})"
    half = (
        f"(1.96 * sqrt(({k} / {n}) * (1 - {k} / {n}) / {n}"
        f" + 3.8416 / (4 * {n} * {n})) / {denom})"
    )
    return (
        f"round(greatest({center} - {half}, 0.0), 6)",
        f"round(least({center} + {half}, 1.0), 6)",
    )
