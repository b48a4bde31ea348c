"""Eval-metric query registrations (functions/evalstats.py): classifier
AUC, calibration bins, categorical drift, Wilson intervals.

The "measure the measurers" family: the quality classifier and dedup
rates that gate the corpus are themselves audited — discrimination (AUC
against a held-out-style label), reliability (ECE bins), stability over
time (chi-square drift), and small-sample uncertainty (Wilson bounds).

Reference parity: none (the reference is segment transport); this is the
LLM-pipeline eval surface.  The quality score reuses
functions/scoring.quality_classifier so the audited scorer IS the shipped
scorer, not a copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import evalstats, scoring
from kafka_replicator_spark.functions.scoring import quality_classifier_sql
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

DAY_US = 86_400_000_000

#: score quantization: floor(mean_milli * 1e3 + 0.5) micro-units — floor on
#: doubles is exact and identical across engines (round() is not: Java
#: HALF_UP on shortest-repr vs exact-binary), and rounding a monotone map
#: keeps score order, so AUC's rank sums agree bit-for-bit
_SCORE_MICRO = "CAST(floor((CAST(score_milli AS DOUBLE) / n_tokens) * 1000000 + 0.5) AS BIGINT)"

_SCORED_CTE = f"""scored AS (
  SELECT {_SCORE_MICRO} AS s,
         CAST(d.lang = 'en' AS INTEGER) AS y
  FROM ({quality_classifier_sql()}) q JOIN documents d USING (doc_id)
)"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qc = scoring.quality_classifier(docs)
    return qc.join(docs.select("doc_id", "lang"), "doc_id").select(
        F.expr(_SCORE_MICRO).alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )


@register(
    "p_auc_quality",
    evalstats.auc_rank_sum_sql(_SCORED_CTE, "s", "y"),
    tags=("pipeline", "eval"),
    doc="exact rank-sum ROC-AUC of the hashed-BoW quality score against "
    "the lang='en' label: tie-corrected Mann-Whitney over distinct scores, "
    "the strictly-below prefix from the range-partition stitch (no global "
    "window), DECIMAL(38,0) rank sums — 1 output row",
)
def q_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return evalstats.auc_rank_sum(_scored(spark, sf_dir), "s", "y")


_QC_LANG_CTE = f"""scored AS (
  SELECT q.score_milli, q.n_tokens, CAST(d.lang = 'en' AS INTEGER) AS y
  FROM ({quality_classifier_sql()}) q JOIN documents d USING (doc_id)
)"""


@register(
    "p_ece_calibration",
    evalstats.calibration_bins_sql(_QC_LANG_CTE, "score_milli", "n_tokens", "y"),
    tags=("pipeline", "eval"),
    doc="reliability diagram of the quality score read as a probability "
    "(linear milli→ppm map, exact integer div): decile bins with count, "
    "confidence, accuracy and |conf-acc| gap in exact ppm — the ECE curve "
    "at bin grain, ≤10 output rows at any corpus size",
)
def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qc = scoring.quality_classifier(docs)
    scored = qc.join(docs.select("doc_id", "lang"), "doc_id").select(
        "score_milli", "n_tokens", (F.col("lang") == "en").cast("int").alias("y")
    )
    return evalstats.calibration_bins(scored, "score_milli", "n_tokens", "y")


_EV_CTE = f"ev AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day FROM events)"


@register(
    "p_categorical_drift_chi2",
    evalstats.categorical_drift_chi2_sql(_EV_CTE, "event_type", "day"),
    tags=("pipeline", "eval", "drift"),
    doc="chi-square drift of the event-type distribution between the early "
    "and late half of the corpus day range: per-type (o-e)^2/e "
    "contributions as fixed double expressions over exact counts (no "
    "cross-row float folds) — type-cardinality output rows",
)
def q_categorical_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts div 1000) div {DAY_US}").alias("day")
    )
    return evalstats.categorical_drift_chi2(ev, "event_type", "day")


_WILSON_LO, _WILSON_HI = evalstats.wilson_interval_sql("n_docs", "n_dup")


@register(
    "p_dup_rate_wilson",
    f"""
WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
c AS (SELECT h, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY h),
f AS (SELECT source, CAST(c >= 2 AS INTEGER) AS dup FROM h JOIN c USING (h)),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dup) AS BIGINT) AS n_dup
  FROM f GROUP BY source
)
SELECT source, n_docs, n_dup,
       {_WILSON_LO} AS p_lo,
       {_WILSON_HI} AS p_hi
FROM s
""",
    tags=("pipeline", "eval", "dedup"),
    doc="95% Wilson score interval on the per-source exact-dup rate: the "
    "uncertainty bound that stops a 40-doc source's 5% dup rate being read "
    "like a 40M-doc source's — content-hash grain aggregation, one fixed "
    "double expression per bound, source-cardinality output",
)
def q_dup_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5("text").alias("h"))
    c = h.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    flagged = h.join(c, "h").select(
        "source", (F.col("c") >= 2).cast("int").alias("dup")
    )
    per_source = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dup").cast("long").alias("n_dup"),
    )
    return evalstats.wilson_interval(per_source, "n_docs", "n_dup")
