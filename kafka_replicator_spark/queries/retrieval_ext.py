"""Retrieval scoring + trend extension queries: BM25 ranking, OLS revenue
trend, ANN recall against the exact baseline.

Reference parity: no analog in the reference engine — retrieval/analytics
surface on the shared corpus tables (the scoring tier above
p_inverted_index, the eval tier above p_ann_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached
from kafka_replicator_spark.functions import dedup, similarity
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

#: BM25 shape parameters (the Robertson defaults)
_BM25_K1 = 1.2
_BM25_B = 0.75
#: query terms of the BM25 demo ranking (common corpus vocabulary)
_BM25_TERMS = ("spark", "hash", "merge", "window")
#: documents reported
_BM25_TOP = 20


#: BM25 oracle SQL, shared with p_rrf_fusion's fused oracle
_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS t_total
  FROM dl
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN {_BM25_TERMS!r}
  GROUP BY doc_id, tok
),
dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
terms AS (
  SELECT tf.doc_id,
         CAST(round(
           round(ln((stats.n_docs - dft.df + 0.5) / (dft.df + 0.5)), 9)
           * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
              + {_BM25_B} * dl.dl * stats.n_docs / CAST(stats.t_total AS DOUBLE))),
         9) AS DECIMAL(28,9)) AS term_score
  FROM tf
  JOIN dft USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         round(CAST(sum(term_score) AS DOUBLE), 6) AS bm25
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, bm25
FROM scored ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOP}
"""


@register(
    "p_bm25_scores",
    _BM25_SQL,
    tags=("pipeline", "retrieval"),
    doc="BM25 ranking for a literal query-term set (the scoring tier above "
    "p_inverted_index): idf re-quantized to 9 dp before the multiply, "
    "per-term scores folded as DECIMAL, top-k via distributed TakeOrdered; "
    "term/doc stats are one explode + count-grain aggregations, corpus "
    "stats ride a broadcast 1-row frame",
)
def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from kafka_replicator_spark.functions.hashing import spread

    dl = track_cached(
        docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
        )
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("t_total")
    )
    toks = spread(
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    tf = (
        toks.where(F.col("tok").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = track_cached(tf)
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 9
    )
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B
        + _BM25_B * F.col("dl") * F.col("n_docs") / F.col("t_total").cast("double")
    )
    term_score = F.round(
        idf * (F.col("tf") * (_BM25_K1 + 1)) / denom, 9
    ).cast("decimal(28,9)")
    terms = (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    scored = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("term_score").cast("double"), 6).alias("bm25"),
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(_BM25_TOP)


#: epoch micros per day
_DAY_US = 86_400_000_000


@register(
    "a_revenue_trend_ols",
    f"""
WITH d AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS day,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
),
daily0 AS (SELECT day, CAST(sum(v) * 100 AS BIGINT) AS yc FROM d GROUP BY day),
mn AS (SELECT CAST(min(day) AS BIGINT) AS d0 FROM daily0),
daily AS (SELECT day - mn.d0 AS x, yc FROM daily0, mn),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sd,
         CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * yc) AS BIGINT) AS sdy,
         CAST(sum(x * x) AS BIGINT) AS sdd,
         CAST(sum(CAST(yc AS HUGEINT) * yc) AS DOUBLE) AS syy
  FROM daily
)
SELECT n AS n_days,
       round((n * CAST(sdy AS DOUBLE) - sd * CAST(sy AS DOUBLE)) / nullif(n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd, 0) / 100.0, 6)
         AS slope,
       round((CAST(sy AS DOUBLE) - (n * CAST(sdy AS DOUBLE) - sd * CAST(sy AS DOUBLE)) / nullif(n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd, 0) * sd) / n / 100.0, 6)
         AS intercept,
       round((n * CAST(sdy AS DOUBLE) - sd * CAST(sy AS DOUBLE)) * (n * CAST(sdy AS DOUBLE) - sd * CAST(sy AS DOUBLE))
             / nullif((n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd) * (n * syy - CAST(sy AS DOUBLE) * sy), 0), 6)
         AS r_squared
FROM m
""",
    tags=("analytics", "timeseries"),
    doc="OLS revenue trend: slope/intercept/R^2 of daily order revenue vs "
    "days-since-first-order, one fixed double expression over exact "
    "integer-cent moments (day index shifted to zero and revenue held in "
    "BIGINT cents so every product is exact — mixed long x DECIMAL "
    "products promote differently across engines, caught at sf0.1); the "
    "intercept is the fitted revenue at the first observed day; orders "
    "collapse to day grain before any moment math — 1 output row",
)
def q_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    d = load_table(spark, sf_dir, "orders").select(
        F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}").alias(
            "day"
        ),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    daily0 = track_cached(
        d.groupBy("day").agg(
            F.expr("CAST(sum(v) * 100 AS BIGINT)").alias("yc")
        )
    )
    mn = daily0.agg(F.min("day").alias("d0"))
    daily = daily0.join(F.broadcast(mn)).select(
        (F.col("day") - F.col("d0")).alias("x"), "yc"
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sd"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sdy"),
        F.sum(F.col("x") * F.col("x")).alias("sdd"),
        # y² overflows int64 at large scale — exact 128-bit-ish product via
        # DECIMAL(19,0)×(19,0) → (38,0), then one cast to double (DuckDB
        # mirrors with HUGEINT)
        F.expr(
            "CAST(sum(CAST(yc AS DECIMAL(19,0)) * CAST(yc AS DECIMAL(19,0))) AS DOUBLE)"
        ).alias("syy"),
    )
    num = F.col("n") * F.col("sdy").cast("double") - F.col("sd") * F.col("sy").cast("double")
    # nullif: a single-day corpus zeroes the denominator — Spark doubles
    # would emit NaN where DuckDB's /0 yields NULL
    den = F.nullif(
        F.col("n") * F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd"),
        F.lit(0.0),
    )
    slope = num / den
    return m.select(
        F.col("n").alias("n_days"),
        F.round(slope / 100.0, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sd")) / F.col("n") / 100.0, 6
        ).alias("intercept"),
        F.round(
            num * num
            / F.nullif(
                den
                * (
                    F.col("n") * F.col("syy")
                    - F.col("sy").cast("double") * F.col("sy")
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("r_squared"),
    )


#: probes of the ANN recall audit (matches p_ann_label_precision)
_RECALL_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


@register(
    "p_ann_recall",
    f"""
WITH ann AS (
  SELECT probe_id, neighbor_id
  FROM ({similarity.ann_topk_sql(_RECALL_PROBES, k=5, n_planes=4, dim=64)})
),
truth AS (
  SELECT probe_id, neighbor_id
  FROM ({similarity.brute_force_topk_sql(_RECALL_PROBES, k=5)})
),
hits AS (
  SELECT t.probe_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM truth t
  WHERE EXISTS (SELECT 1 FROM ann
                WHERE ann.probe_id = t.probe_id
                  AND ann.neighbor_id = t.neighbor_id)
  GROUP BY t.probe_id
),
base AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS k_eff FROM truth GROUP BY probe_id)
SELECT base.probe_id, base.k_eff, coalesce(hits.n_hits, 0) AS n_hits,
       (1000000 * coalesce(hits.n_hits, 0)) // base.k_eff AS recall_ppm
FROM base LEFT JOIN hits USING (probe_id)
""",
    tags=("pipeline", "similarity", "eval"),
    doc="ANN recall@k against the exact brute-force baseline per probe "
    "(the other half of p_ann_label_precision's dashboard): both rankings "
    "are broadcast-probe plans, the overlap is a k-row-per-probe semi "
    "join, exact integer ppm",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.ann_topk(emb, _RECALL_PROBES, k=5, n_planes=4, dim=64).select(
        "probe_id", "neighbor_id"
    )
    truth = track_cached(
        similarity.brute_force_topk(emb, _RECALL_PROBES, k=5).select(
            "probe_id", "neighbor_id"
        )
    )
    hits = truth.join(ann, ["probe_id", "neighbor_id"], "left_semi").groupBy(
        "probe_id"
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    base = truth.groupBy("probe_id").agg(F.count(F.lit(1)).alias("k_eff"))
    return base.join(hits, "probe_id", "left").select(
        "probe_id",
        "k_eff",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.expr("(1000000 * coalesce(n_hits, 0)) div k_eff").alias("recall_ppm"),
    )


#: banding geometry of the capture-curve audit (rows per band r, bands b)
_CAP_R = 4
_CAP_B = 8


def _pow_chain_sql(base: str, n: int) -> str:
    """x^n as a fixed-order multiplication chain (n in {4, 8}) — identical
    IEEE evaluation on both engines, no pow() (library pow differs in the
    last ulp across engines)."""
    assert n in (4, 8)
    x2 = f"(({base}) * ({base}))"
    x4 = f"({x2} * {x2})"
    if n == 4:
        return x4
    return f"({x4} * {x4})"


@register(
    "p_lsh_capture_curve",
    f"""
WITH pairs AS (
  SELECT round(jaccard, 6) AS j
  FROM ({dedup.jaccard_pairs_sql(threshold=0.0)})
),
capt AS (
  SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS decile,
         1.0 - {_pow_chain_sql(f"1.0 - {_pow_chain_sql('j', _CAP_R)}", _CAP_B)} AS p_capture
  FROM pairs
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(round(sum(CAST(round(p_capture, 9) AS DECIMAL(18,9))), 6) AS DOUBLE)
         AS sum_capture
FROM capt GROUP BY decile
""",
    tags=("pipeline", "dedup", "eval"),
    doc="MinHash-LSH capture-probability curve: for every candidate pair's "
    "exact Jaccard j, the analytic banding capture 1-(1-j^r)^b (r=4, b=8) "
    "— expanded as a fixed-order multiplication chain so both engines "
    "evaluate identical IEEE products (library pow differs in the last "
    "ulp); per-decile pair counts + DECIMAL-folded capture mass, the "
    "expected-recall audit for a banding choice",
)
def q_lsh_capture_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = track_cached(dedup.word_ngrams(docs))
    pairs = dedup.jaccard_pairs(docs, threshold=0.0, shingles=sh).select(
        F.round("jaccard", 6).alias("j")
    )
    j = F.col("j")
    j2 = j * j
    j4 = j2 * j2
    q = F.lit(1.0) - j4
    q2 = q * q
    q4 = q2 * q2
    q8 = q4 * q4
    capt = pairs.select(
        F.least(F.floor(j * 10).cast("long"), F.lit(9)).alias("decile"),
        (F.lit(1.0) - q8).alias("p_capture"),
    )
    return capt.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum(F.round(F.col("p_capture"), 9).cast("decimal(18,9)")), 6)
        .cast("double")
        .alias("sum_capture"),
    )


@register(
    "p_ann_mrr",
    f"""
WITH ann AS (
  SELECT probe_id, neighbor_id, rank
  FROM ({similarity.ann_topk_sql(_RECALL_PROBES, k=5, n_planes=4, dim=64)})
),
lbl AS (SELECT vec_id, label FROM embeddings),
firsts AS (
  SELECT ann.probe_id, CAST(min(ann.rank) AS BIGINT) AS first_hit_rank
  FROM ann
  JOIN lbl pl ON pl.vec_id = ann.probe_id
  JOIN lbl nl ON nl.vec_id = ann.neighbor_id
  WHERE nl.label = pl.label
  GROUP BY ann.probe_id
),
base AS (SELECT DISTINCT probe_id FROM ann)
SELECT base.probe_id,
       coalesce(firsts.first_hit_rank, 0) AS first_hit_rank,
       CASE WHEN firsts.first_hit_rank IS NULL THEN 0
            ELSE 1000000 // firsts.first_hit_rank END AS rr_ppm
FROM base LEFT JOIN firsts USING (probe_id)
""",
    tags=("pipeline", "similarity", "eval"),
    doc="ANN mean-reciprocal-rank inputs: per probe, the rank of the first "
    "same-label neighbor in the LSH top-k (0 = no hit) and its exact-ppm "
    "reciprocal — the ranking-quality half of p_ann_label_precision; "
    "labels ride broadcast joins, probe-count output",
)
def q_ann_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ann = similarity.ann_topk(emb, _RECALL_PROBES, k=5, n_planes=4, dim=64)
    lbl = emb.select("vec_id", "label")
    # explicit probe bound (≤ |probes| rows by construction)
    pl = lbl.filter(F.col("vec_id").isin(_RECALL_PROBES)).select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("p_lbl")
    )
    nl = lbl.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_lbl")
    )
    # Broadcast the probe-grain frame (≤ probes×k rows) — NEVER the label
    # projections, which are one row per corpus vector and blow past the
    # broadcast limit at scale (VERDICT r06 #1).
    hits = F.broadcast(ann).join(pl, "probe_id")
    firsts = (
        F.broadcast(hits)
        .join(nl, "neighbor_id")
        .where(F.col("n_lbl") == F.col("p_lbl"))
        .groupBy("probe_id")
        .agg(F.min("rank").cast("long").alias("first_hit_rank"))
    )
    base = ann.select("probe_id").distinct()
    return base.join(firsts, "probe_id", "left").select(
        "probe_id",
        F.coalesce(F.col("first_hit_rank"), F.lit(0)).alias("first_hit_rank"),
        F.expr(
            "CASE WHEN first_hit_rank IS NULL THEN 0"
            " ELSE 1000000 div first_hit_rank END"
        ).alias("rr_ppm"),
    )


@register(
    "a_value_by_hour_anova",
    """
WITH e AS (
  SELECT hour(ts) AS hr, CAST(value AS DECIMAL(18,2)) AS v FROM events
),
g AS (
  SELECT hr, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) AS s,
         CAST(sum(v * v) AS DOUBLE) AS ss
  FROM e GROUP BY hr
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(s) AS DOUBLE) AS s_tot,
         CAST(sum(ss) AS DOUBLE) AS ss_tot,
         CAST(sum(s * s / n) AS DOUBLE) AS sq_group
  FROM g
)
SELECT k AS n_groups, n_tot AS n_events,
       round((sq_group - s_tot * s_tot / n_tot) / nullif(k - 1, 0)
             / nullif((ss_tot - sq_group) / (n_tot - k), 0), 6) AS f_stat
FROM m
""",
    tags=("analytics", "events", "eval"),
    doc="one-way ANOVA of event value by hour of day: between/within sums "
    "of squares from per-hour DECIMAL-exact moments, the F statistic as "
    "one fixed double expression — is there an hourly value effect at "
    "all; 24-group grain, 1 output row",
)
def q_value_by_hour_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.expr("hour(timestamp_micros(ts div 1000))").alias("hr"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    g = e.groupBy("hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("ss"),
    )
    m = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sq_group"),
    )
    # nullif-guard (k - 1) like the within denominator: with one hour group
    # Spark's non-ANSI /0 yields NULL but DuckDB's IEEE division yields inf —
    # the guard makes degenerate input NULL on BOTH engines.
    between = (
        F.col("sq_group") - F.col("s_tot") * F.col("s_tot") / F.col("n_tot")
    ) / F.nullif(F.col("k") - 1, F.lit(0))
    within = F.nullif(
        (F.col("ss_tot") - F.col("sq_group")) / (F.col("n_tot") - F.col("k")),
        F.lit(0.0),
    )
    return m.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n_events"),
        F.round(between / within, 6).alias("f_stat"),
    )


# ------------------------------------------------ reciprocal-rank fusion

#: fused documents reported
_RRF_TOP = 20
#: the standard RRF dampening constant (Cormack et al. 2009)
_RRF_K = 60

from kafka_replicator_spark.functions.scoring import quality_classifier_sql as _qc_sql_builder  # noqa: E402

_QC_SQL = _qc_sql_builder()



def _rrf_ranks_sql(materialized: bool = False) -> str:
    """The bm/bmr/qc/qtop/qr rank-frame CTE block (emitted inside an open
    WITH) — THE one generator of the RRF input-list text, shared by
    p_rrf_fusion and the k-parameter sweep so they can never rank
    different lists.  ``materialized`` marks the multiply-referenced
    bmr/qr AS MATERIALIZED for consumers that read them once per ladder
    arm (the r06 rule); the single-reference fusion keeps the plain
    form (text unchanged from its ever-green round)."""
    m = " MATERIALIZED" if materialized else ""
    return f"""bm AS ({_BM25_SQL}),
bmr AS{m} (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r
  FROM bm
),
qc AS ({_QC_SQL}),
qtop AS (
  SELECT doc_id, mean_milli FROM qc
  ORDER BY mean_milli DESC, doc_id LIMIT {_RRF_TOP}
),
qr AS{m} (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY mean_milli DESC, doc_id) AS BIGINT) AS r
  FROM qtop
)"""


def _rrf_rank_frames(spark: SparkSession, sf_dir: str):
    """Spark twin of :func:`_rrf_ranks_sql`: the (bmr, qr) rank frames
    (columns ``br`` / ``qr``) both RRF consumers join."""
    from pyspark.sql import Window

    from kafka_replicator_spark.functions import scoring

    docs = load_table(spark, sf_dir, "documents")
    bm = q_bm25_scores(spark, sf_dir)  # top-20 (doc_id, n_terms_hit, bm25)
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .cast("long")
        .alias("br"),
    )
    qtop = (
        scoring.quality_classifier(docs)
        .select("doc_id", "mean_milli")
        .orderBy(F.col("mean_milli").desc(), "doc_id")
        .limit(_RRF_TOP)
    )
    qr = qtop.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("mean_milli").desc(), "doc_id"))
        .cast("long")
        .alias("qr"),
    )
    return bmr, qr


@register(
    "p_rrf_fusion",
    f"""
WITH {_rrf_ranks_sql()},
fused AS (
  SELECT doc_id,
         coalesce(b.r, -1) AS bm25_rank,
         coalesce(q.r, -1) AS quality_rank,
         (CASE WHEN b.r IS NOT NULL THEN 1000000 // ({_RRF_K} + b.r) ELSE 0 END
          + CASE WHEN q.r IS NOT NULL THEN 1000000 // ({_RRF_K} + q.r) ELSE 0 END)
           AS rrf_micro
  FROM bmr b FULL JOIN qr q USING (doc_id)
)
SELECT doc_id, bm25_rank, quality_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro
FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOP}
""",
    tags=("pipeline", "retrieval"),
    doc="hybrid ranking via reciprocal-rank fusion (Cormack et al. 2009, "
    "k=60): the BM25 relevance list fused with the quality-classifier "
    "list, contributions as exact integer micro-units (1e6 div (60+rank)) "
    "so the fused order is engine-independent; both input lists are "
    "top-k distributed TakeOrdered frames, the fusion joins two ≤k-row "
    "frames — corpus never reshuffles for the fusion stage",
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    bmr, qr = _rrf_rank_frames(spark, sf_dir)
    fused = bmr.join(qr, "doc_id", "full").select(
        "doc_id",
        F.coalesce("br", F.lit(-1)).alias("bm25_rank"),
        F.coalesce("qr", F.lit(-1)).alias("quality_rank"),
        (
            F.when(F.col("br").isNotNull(), F.expr(f"1000000 div ({_RRF_K} + br)")).otherwise(0)
            + F.when(F.col("qr").isNotNull(), F.expr(f"1000000 div ({_RRF_K} + qr)")).otherwise(0)
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(_RRF_TOP)


# ------------------------------------------------ RRF k-parameter sweep

#: Cormack et al.'s k=60 bracketed from both sides: small k → rank-1
#: dominance (the top list wins outright), large k → flat consensus
_RRF_K_LADDER = (10, 60, 240)
_RRF_SWEEP_TOP = 10


def _rrf_sweep_oracle() -> str:
    arms = []
    for k in _RRF_K_LADDER:
        arms.append(f"""
SELECT CAST({k} AS BIGINT) AS rrf_k,
       CAST(count(*) AS BIGINT) AS n_top,
       CAST(sum(CASE WHEN bm25_rank > 0 AND quality_rank > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN quality_rank < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bm25_only,
       CAST(sum(CASE WHEN bm25_rank < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_only,
       CAST(sum(rrf_micro) AS BIGINT) AS sum_rrf_micro
FROM (
  SELECT * FROM (
    SELECT doc_id,
           coalesce(b.r, -1) AS bm25_rank,
           coalesce(q.r, -1) AS quality_rank,
           (CASE WHEN b.r IS NOT NULL THEN 1000000 // ({k} + b.r) ELSE 0 END
            + CASE WHEN q.r IS NOT NULL THEN 1000000 // ({k} + q.r) ELSE 0 END)
             AS rrf_micro
    FROM bmr b FULL JOIN qr q USING (doc_id)
  ) ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_SWEEP_TOP}
)""")
    u = " UNION ALL ".join(arms)
    return f"""
WITH {_rrf_ranks_sql(materialized=True)}
SELECT * FROM ({u}) ORDER BY rrf_k
"""


@register(
    "p_rrf_k_sweep",
    _rrf_sweep_oracle(),
    tags=("pipeline", "retrieval", "sweep"),
    doc="RRF k-parameter sensitivity over the literal ladder "
    f"{_RRF_K_LADDER} (Cormack et al.'s 60 bracketed both ways): the "
    f"fused top-{_RRF_SWEEP_TOP}'s composition per k — docs present in "
    "BOTH source lists vs carried by one alone, plus the exact "
    "integer-micro mass — small k lets a single rank-1 hit dominate, "
    "large k rewards consensus; every arm reuses the SAME two rank "
    "frames (one BM25 pass, one classifier pass — the literal-ladder "
    "sweep pattern), so the sweep costs one chain, not three",
)
def q_rrf_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    bmr, qr = _rrf_rank_frames(spark, sf_dir)
    joined = track_cached(bmr.join(qr, "doc_id", "full"))  # every arm reuses it
    out = None
    for k in _RRF_K_LADDER:
        fused = joined.select(
            "doc_id",
            F.coalesce("br", F.lit(-1)).alias("bm25_rank"),
            F.coalesce("qr", F.lit(-1)).alias("quality_rank"),
            (
                F.when(
                    F.col("br").isNotNull(), F.expr(f"1000000 div ({k} + br)")
                ).otherwise(0)
                + F.when(
                    F.col("qr").isNotNull(), F.expr(f"1000000 div ({k} + qr)")
                ).otherwise(0)
            )
            .cast("long")
            .alias("rrf_micro"),
        )
        top = fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(
            _RRF_SWEEP_TOP
        )
        arm = top.agg(
            F.lit(k).cast("long").alias("rrf_k"),
            F.count(F.lit(1)).cast("long").alias("n_top"),
            F.sum(
                F.when(
                    (F.col("bm25_rank") > 0) & (F.col("quality_rank") > 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
            F.sum(F.when(F.col("quality_rank") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_bm25_only"),
            F.sum(F.when(F.col("bm25_rank") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_quality_only"),
            F.sum("rrf_micro").cast("long").alias("sum_rrf_micro"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("rrf_k")
