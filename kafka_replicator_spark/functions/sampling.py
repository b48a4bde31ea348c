"""Deterministic sampling operators for training-data pipelines.

Two families, both exact-integer so the DuckDB oracle reproduces every row
bit-for-bit (no float RNG, no engine-local ``rand()``):

  * **PPS Poisson sampling** — probability-proportional-to-size inclusion
    (Hájek/Poisson sampling): document *i* in group *g* is kept iff

        h32(i) * Σw_g  <  n * w_i * 2^32

    which realises inclusion probability ``min(1, n·w_i/Σw_g)`` with the
    portable 32-bit hash standing in for the uniform draw.  The comparison
    is exact integer arithmetic (DECIMAL(38,0) on the Spark side, HUGEINT
    in DuckDB) — no rounding, no cross-engine float divergence.  This is
    the weighted counterpart of the hash-gated stratified resample in
    :mod:`kafka_replicator_spark.functions.curation`.

  * **KMV bottom-k sketch** — per-source distinct-shingle sketches of k
    minimum 60-bit hash values.  Sketches are mergeable (union = bottom-k
    of the concatenation) and support *set-intersection* estimation, which
    the HyperLogLog sketch (functions/sketches.py) cannot: for sources A,B
    the estimator is ``|L ∩ A ∩ B| / k`` where L is the bottom-k of the
    merged sketch.  Ratios are reported in integer parts-per-million
    (``x * 1000000 div k``) so no float rounding ever reaches the output.

Scale: PPS is map-only after one tiny per-group total (broadcast back);
the KMV sketch bounds per-source state at k rows regardless of corpus
size, so the pairwise-overlap stage runs on a sources×k frame — at 100 TB
the expensive exact audit drops out and only the sketch path remains.

The reference engine has no sampling surface (cf. SURVEY.md §2 "pipeline
extensions"); semantics follow the published PPS / KMV literature
(Beyer et al., "On synopses for distinct-value estimation", SIGMOD'07).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached

from kafka_replicator_spark.functions.hashing import (
    portable_hash32,
    portable_hash32_sql,
    portable_hash60,
    portable_hash60_sql,
    spread,
)

# ------------------------------------------------------------------ PPS

#: 2^32 — scales the hash draw to the inclusion-probability comparison
_TWO32 = 4294967296


def pps_sample(
    docs: DataFrame,
    group_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """Deterministic PPS Poisson sample of ~``n`` docs per group.

    Inclusion is decided per row from the portable hash of the id — no
    global sort, no RNG state; the only shuffle is the per-group weight
    total, which is metadata-scale and broadcast back onto the fact side.
    The DECIMAL(38,0) product keeps the comparison exact far beyond the
    int64 range (Σw at 100 TB overflows BIGINT; 38 digits do not).
    """
    w = F.col(weight_col).cast("long")
    totals = docs.groupBy(group_col).agg(F.sum(w).alias("_sw"))
    lhs = portable_hash32(F.col(id_col).cast("string")).cast("decimal(38,0)") * F.col("_sw")
    rhs = (w * F.lit(n)).cast("decimal(38,0)") * F.lit(_TWO32)
    return (
        docs.join(F.broadcast(totals), group_col)
        .filter(lhs < rhs)
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("doc_id"),
            w.alias("weight"),
        )
    )


def pps_sample_sql(
    group_col: str = "lang",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    n: int = 10,
    table: str = "documents",
) -> str:
    h = portable_hash32_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
WITH tot AS (
  SELECT {group_col}, CAST(sum({weight_col}) AS BIGINT) AS sw
  FROM {table} GROUP BY {group_col}
)
SELECT d.{group_col} AS grp, d.{id_col} AS doc_id,
       CAST(d.{weight_col} AS BIGINT) AS weight
FROM {table} d JOIN tot USING ({group_col})
WHERE CAST({h} AS HUGEINT) * sw
    < CAST(d.{weight_col} * {n} AS HUGEINT) * {_TWO32}
"""


# ------------------------------------------------------------------ KMV

def source_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per source with the 60-bit portable
    hash — the input universe of the KMV sketch."""
    toks = F.col("__toks")  # materialized below — splitting inside the
    # lambda would re-split per element access (O(len²) splits per doc)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array())  # sequence(1,0) is DESCENDING in Spark — must guard
    return (
        spread(docs)
        .select("source", F.split(F.col("text"), " ").alias("__toks"))
        .select("source", F.explode(F.array_distinct(grams)).alias("shingle"))
        .distinct()
        .withColumn("h", portable_hash60("shingle"))
    )


def _source_shingles_sql(n: int = 3) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
  SELECT DISTINCT source, shingle, {portable_hash60_sql('shingle')} AS h
  FROM (
    SELECT source, {gram} AS shingle
    FROM (
      SELECT source, t, unnest(range(1, len(t) - {n - 2})) AS i
      FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
    )
  )
"""


def kmv_overlap(docs: DataFrame, n: int = 3, k: int = 128) -> DataFrame:
    """Pairwise source-overlap from KMV bottom-k sketches, audited exactly.

    Per unordered source pair (sa, sb):

      * ``n_both``        — sketch members of the merged bottom-k seen in
        BOTH per-source sketches
      * ``jacc_est_ppm``  — ``n_both * 1e6 div k_used`` (the KMV Jaccard
        estimator, integer ppm)
      * ``n_inter`` / ``jacc_ppm`` — the exact values from the full
        shingle sets (the audit; drops out at scale)

    The sketch frame is sources×k rows however large the corpus is — the
    pairwise stage is metadata-scale, and distinct-h ordering makes the
    sketch content independent of partitioning and engine.
    """
    sh = track_cached(source_shingles(docs, n=n))
    hs = sh.select("source", "h").distinct()
    rk = Window.partitionBy("source").orderBy("h")
    sk = hs.withColumn("_rk", F.row_number().over(rk)).filter(F.col("_rk") <= k).drop("_rk")

    others = sk.select(F.col("source").alias("other")).distinct()
    paired = (
        sk.join(others, F.col("source") != F.col("other"))
        .select(
            F.least("source", "other").alias("sa"),
            F.greatest("source", "other").alias("sb"),
            "h",
            (F.col("source") < F.col("other")).alias("from_a"),
        )
    )
    merged = (
        paired.groupBy("sa", "sb", "h")
        .agg(
            F.max(F.when(F.col("from_a"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(~F.col("from_a"), 1).otherwise(0)).alias("in_b"),
        )
    )
    mk = Window.partitionBy("sa", "sb").orderBy("h")
    est = (
        merged.withColumn("_rk", F.row_number().over(mk))
        .filter(F.col("_rk") <= k)
        .groupBy("sa", "sb")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
            F.count(F.lit(1)).alias("k_used"),
        )
        .withColumn("jacc_est_ppm", F.expr("n_both * 1000000 div k_used"))
    )

    a = sh.select(F.col("source").alias("sa"), "shingle")
    b = sh.select(F.col("source").alias("sb"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    sza = sizes.select(F.col("source").alias("sa"), F.col("n_sh").alias("_na"))
    szb = sizes.select(F.col("source").alias("sb"), F.col("n_sh").alias("_nb"))
    exact = (
        est.join(inter, ["sa", "sb"], "left")
        .join(F.broadcast(sza), "sa")
        .join(F.broadcast(szb), "sb")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .withColumn("jacc_ppm", F.expr("n_inter * 1000000 div (_na + _nb - n_inter)"))
    )
    return exact.select(
        "sa", "sb", "n_both", "k_used", "jacc_est_ppm", "n_inter", "jacc_ppm"
    )


def kmv_overlap_sql(n: int = 3, k: int = 128) -> str:
    return f"""
WITH sh AS ({_source_shingles_sql(n)}),
hs AS (SELECT DISTINCT source, h FROM sh),
sk AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
    FROM hs
  ) WHERE rk <= {k}
),
paired AS (
  SELECT least(s.source, o.other) AS sa, greatest(s.source, o.other) AS sb,
         s.h, (s.source < o.other) AS from_a
  FROM sk s JOIN (SELECT DISTINCT source AS other FROM sk) o
    ON s.source <> o.other
),
merged AS (
  SELECT sa, sb, h,
         max(CASE WHEN from_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN from_a THEN 0 ELSE 1 END) AS in_b
  FROM paired GROUP BY sa, sb, h
),
est AS (
  SELECT sa, sb,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
         CAST(count(*) AS BIGINT) AS k_used
  FROM (
    SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
    FROM merged
  ) WHERE rk <= {k}
  GROUP BY sa, sb
),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY source)
SELECT e.sa, e.sb, e.n_both, e.k_used,
       CAST(e.n_both * 1000000 // e.k_used AS BIGINT) AS jacc_est_ppm,
       CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(coalesce(i.n_inter, 0) * 1000000
            // (x.n_sh + y.n_sh - coalesce(i.n_inter, 0)) AS BIGINT) AS jacc_ppm
FROM est e
LEFT JOIN inter i ON e.sa = i.sa AND e.sb = i.sb
JOIN sizes x ON e.sa = x.source
JOIN sizes y ON e.sb = y.source
"""


#: 2^60 — the exclusive upper bound of :func:`portable_hash60` values
_TWO60 = 1 << 60

#: Prefilter sizing: expected survivors per source ≈ MARGIN·quota + CUSHION.
#: P(Binomial(n_s, thr/2^60) < quota) ≤ exp(-Θ(quota + CUSHION)) by Chernoff —
#: with CUSHION=64 even a quota-1 source under-fills with probability
#: ~e^-68; the driver-side guard below still makes that case *correct*,
#: not just improbable.
_PREFILTER_MARGIN = 4
_PREFILTER_CUSHION = 64


def temperature_mix(
    docs: DataFrame,
    total_sample: int = 200,
    temperature: float = 2.0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual/multi-domain
    sampling rule of Llama/PaLM-style pretraining): source ``s`` with
    ``n_s`` documents receives a quota ∝ ``n_s^(1/T)`` — ``T > 1`` flattens
    the distribution toward small domains, ``T = 1`` is proportional.

    Quota arithmetic is integer-exact cross-engine: the only float op is
    ``pow(n_s, 1/T)``, immediately rounded to integer milli-units per
    source (one value per source, never summed as floats); quotas are then
    ``total * w_milli div Σw_milli`` in pure integers.  Within each source
    the quota is filled by ascending portable document hash (a determinate
    "uniform" order both engines reproduce), tie-broken by id.

    Scale: ranking every row per source to fill a quota ≪ n_s would put
    the largest domain of a 100 TB corpus on ONE window task.  Instead the
    PPS hash-threshold trick (cf. :func:`pps_sample`) prefilters each
    source to ``h < thr_s`` with ``thr_s ≈ (4·quota_s + 64)·2^60/n_s``
    (exact integer arithmetic, capped at 2^60): because selection is by
    ascending ``(h, doc_id)``, any row with ``h ≥ thr_s`` ranks behind all
    survivors, so whenever a source keeps ≥ quota_s survivors (or kept all
    its rows) the survivor ranks EQUAL the full-table ranks for every
    emitted row.  The window therefore sees ~4·total_sample rows, not the
    corpus.  A sources-scale metadata check (the compaction-planner
    pattern) verifies per-source survivor counts and falls back to a full
    rank for any under-filled source — output is bit-identical to the
    unfiltered plan on ANY input, adversarial hash distributions included.

    Plan: one tiny per-source count (broadcast back as quotas+thresholds),
    one map-side hash prefilter, one window over the tiny survivor frame.
    No global sort, no RNG, no per-source full sort.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    w_milli = F.round(
        F.pow(F.col("n_s").cast("double"), F.lit(1.0 / temperature)) * 1000
    ).cast("long")
    quotas = (
        docs.groupBy(F.col(source_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn("w_milli", w_milli)
    )
    tot = quotas.agg(F.sum("w_milli").alias("w_tot"))  # 1 row, broadcast
    quotas = quotas.join(F.broadcast(tot)).select(
        "src",
        "n_s",
        F.expr(f"CAST({total_sample} * w_milli AS BIGINT) div w_tot").alias("quota"),
    )
    # per-source hash threshold — decimal product so 2^60·(4q+64) cannot
    # overflow BIGINT before the 2^60 cap is applied
    quotas = quotas.withColumn(
        "thr",
        F.expr(
            "CASE WHEN quota <= 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(least(CAST({_TWO60} AS DECIMAL(38,0)), "
            f"CAST({_TWO60} div n_s AS DECIMAL(38,0)) "
            f"* (quota * {_PREFILTER_MARGIN} + {_PREFILTER_CUSHION})) AS BIGINT) END"
        ),
    )
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("src"),
        portable_hash60(F.col("text")).alias("h"),
    )
    # survivor frame is ~MARGIN·total_sample rows at any corpus size — cached
    # (and tracked for release) because the guard below counts it and the
    # returned plan re-reads it
    surv = track_cached(hashed.join(F.broadcast(quotas), "src").filter(F.col("h") < F.col("thr")))
    # exactness guard (sources-scale metadata, driver-side like the
    # compaction planner): a source is safe iff it kept ≥ quota survivors
    # or kept every row; anything else re-ranks from the full table
    checks = (
        quotas.join(
            surv.groupBy("src").agg(F.count(F.lit(1)).alias("n_surv")), "src", "left"
        )
        .withColumn("n_surv", F.coalesce("n_surv", F.lit(0)))
        .filter((F.col("n_surv") < F.col("quota")) & (F.col("n_surv") < F.col("n_s")))
    )
    underfilled = [r["src"] for r in checks.select("src").collect()]
    base = surv
    if underfilled:  # cryptographically rare — adversarial hash clustering
        full = hashed.filter(F.col("src").isin(underfilled)).join(
            F.broadcast(quotas), "src"
        )
        base = surv.filter(~F.col("src").isin(underfilled)).unionByName(full)
    ranked = base.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("src").orderBy("h", "doc_id")),
    )
    return (
        ranked.filter(F.col("rnk") <= F.col("quota"))
        .select(
            "doc_id",
            F.col("src").alias("source"),
            F.col("n_s").cast("long").alias("n_source"),
            F.col("quota").cast("long").alias("quota"),
            F.col("rnk").cast("long").alias("sample_rank"),
        )
    )


def temperature_mix_sql(total_sample: int = 200, temperature: float = 2.0) -> str:
    h = portable_hash60_sql("text")
    return f"""
WITH counts AS (
  SELECT source AS src, count(*) AS n_s FROM documents GROUP BY source
), weighted AS (
  SELECT src, n_s,
         CAST(round(pow(CAST(n_s AS DOUBLE), 1.0 / {temperature}) * 1000)
              AS BIGINT) AS w_milli
  FROM counts
), quotas AS (
  SELECT src, n_s,
         CAST({total_sample} * w_milli AS BIGINT)
           // (SELECT CAST(sum(w_milli) AS BIGINT) FROM weighted) AS quota
  FROM weighted
), ranked AS (
  SELECT doc_id, source AS src, {h} AS h,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rnk
  FROM documents
)
SELECT doc_id,
       src AS source,
       CAST(n_s AS BIGINT) AS n_source,
       CAST(quota AS BIGINT) AS quota,
       CAST(rnk AS BIGINT) AS sample_rank
FROM ranked JOIN quotas USING (src)
WHERE rnk <= quota
"""


# ------------------------------------------------------------- epoch plan

def epoch_plan(docs: DataFrame) -> DataFrame:
    """Per-source epoch/upsampling plan for a uniform token budget: each
    source's target is ``total_tokens div n_sources``; a source meets it
    with ``target div n_s`` full epochs plus a residual sample of
    ``target mod n_s`` tokens (carried as exact integer ppm) — the repeat-
    epochs knob of corpus mixing (small domains repeat, large ones
    subsample), all BIGINT arithmetic so any engine reproduces it.

    One token-count aggregation (map-side ``size(split(...))``, no
    explode) + a broadcast 1-row totals frame — map-only after the
    per-source shuffle.
    """
    per_src = (
        docs.select("source", F.size(F.split(F.col("text"), " ")).cast("long").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_src.join(F.broadcast(tot))
        .withColumn("target_tokens", F.expr("total_tokens div n_sources"))
        .select(
            "source",
            "n_tokens",
            "target_tokens",
            F.expr("target_tokens div n_tokens").alias("epochs"),
            F.expr("(1000000 * (target_tokens % n_tokens)) div n_tokens").alias("residual_ppm"),
        )
    )


def epoch_plan_sql() -> str:
    return """
WITH per_src AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per_src
)
SELECT source, n_tokens,
       total_tokens // n_sources AS target_tokens,
       (total_tokens // n_sources) // n_tokens AS epochs,
       (1000000 * ((total_tokens // n_sources) % n_tokens)) // n_tokens AS residual_ppm
FROM per_src, tot
"""


# ---------------------------------------------------- uniform WOR sample

def uniform_sample(docs: DataFrame, k: int = 100) -> DataFrame:
    """Deterministic uniform sample without replacement: the ``k`` smallest
    portable document hashes corpus-wide — the hash-as-priority reservoir
    (every document equally likely under the hash's uniformity, stable
    across reruns and engines, no RNG state).

    ``orderBy(h).limit(k)`` is a distributed TakeOrdered: each partition
    keeps its local top-k, the driver merges k-sized heaps — never a global
    sort.  Output carries the hash so downstream incremental samplers can
    merge two samples by re-taking the k smallest.
    """
    from kafka_replicator_spark.functions.hashing import portable_hash60

    h = portable_hash60(F.concat_ws("|", F.lit("us"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(k)
    )


def uniform_sample_sql(k: int = 100) -> str:
    from kafka_replicator_spark.functions.hashing import portable_hash60_sql

    h = portable_hash60_sql("'us|' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, source, {h} AS h
FROM documents
ORDER BY h, doc_id LIMIT {k}
"""


# ------------------------------------------------------- Poisson bootstrap

#: Poisson(1) CDF thresholds in 2^60 units (Python-literal on both engines):
#: replicate count k = number of thresholds <= the document's 60-bit hash,
#: capped at 5.  floor(cdf_k * 2^60) for k = 0..4.
POISSON1_THRESHOLDS = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)
#: bootstrap replicates computed by poisson_bootstrap
BOOTSTRAP_REPLICATES = 3


def poisson_bootstrap(docs: DataFrame, n_replicates: int = BOOTSTRAP_REPLICATES) -> DataFrame:
    """Deterministic Poisson(1) bootstrap over the corpus: each replicate
    draws every document k times where k inverts the Poisson CDF at the
    document's replicate-keyed 60-bit hash — the standard single-pass
    bootstrap at scale (no global n needed, no RNG state; reruns and
    engines agree bit-for-bit).

    Per-replicate resampled doc/token totals let a pipeline put error bars
    on any corpus statistic.  Map-only assignment + one replicate-grain
    aggregation; ``n_replicates`` output rows.
    """
    from kafka_replicator_spark.functions.hashing import portable_hash60

    reps = docs.sparkSession.range(n_replicates).select(
        F.col("id").cast("int").alias("replicate")
    )
    per = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("nt")
    )
    j = per.join(F.broadcast(reps))
    h = portable_hash60(
        F.concat_ws("|", F.lit("boot"), F.col("replicate").cast("string"),
                    F.col("doc_id").cast("string"))
    )
    k = sum(
        F.when(h >= F.lit(t), 1).otherwise(0) for t in POISSON1_THRESHOLDS
    )
    drawn = j.withColumn("k", k.cast("long"))
    return drawn.groupBy("replicate").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("k").alias("n_draws"),
        F.sum(F.when(F.col("k") > 0, 1).otherwise(0)).alias("n_docs_kept"),
        F.sum(F.col("k") * F.col("nt")).alias("n_tokens_drawn"),
    )


def poisson_bootstrap_sql(n_replicates: int = BOOTSTRAP_REPLICATES) -> str:
    from kafka_replicator_spark.functions.hashing import portable_hash60_sql

    h = portable_hash60_sql(
        "'boot|' || CAST(r.replicate AS VARCHAR) || '|' || CAST(d.doc_id AS VARCHAR)"
    )
    ks = " + ".join(
        f"(CASE WHEN {h} >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_THRESHOLDS
    )
    return f"""
WITH r AS (SELECT unnest(range({n_replicates})) AS replicate),
d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
drawn AS (
  SELECT CAST(r.replicate AS INTEGER) AS replicate, d.nt,
         CAST({ks} AS BIGINT) AS k
  FROM d CROSS JOIN r
)
SELECT replicate,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(k) AS BIGINT) AS n_draws,
       CAST(sum(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       CAST(sum(k * nt) AS BIGINT) AS n_tokens_drawn
FROM drawn GROUP BY replicate
"""


def per_source_sample(
    docs: DataFrame, k: int = 10, source_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-source sample without replacement: the ``k``
    smallest portable text hashes per source (tie-broken by id) — the
    per-domain inspection sample every curation dashboard links to.

    Scale: same two-phase shape as :func:`temperature_mix` — a per-source
    hash-threshold prefilter (``thr ≈ (4k + 64)·2^60/n_s``) confines the
    rank window to ~4k rows per source, with the sources-scale metadata
    guard falling back to a full rank for any (cryptographically rare)
    under-filled source, so the output is bit-identical to the unfiltered
    plan on ANY input.  Mergeable: re-taking the k smallest of a union of
    per-shard samples reproduces the corpus sample.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    quotas = (
        docs.groupBy(F.col(source_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("n_s"))
        .withColumn("quota", F.least(F.lit(k).cast("long"), F.col("n_s")))
        .withColumn(
            "thr",
            F.expr(
                f"CAST(least(CAST({_TWO60} AS DECIMAL(38,0)), "
                f"CAST({_TWO60} div n_s AS DECIMAL(38,0)) "
                f"* (quota * {_PREFILTER_MARGIN} + {_PREFILTER_CUSHION})) AS BIGINT)"
            ),
        )
    )
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("src"),
        portable_hash60(F.col("text")).alias("h"),
    )
    surv = track_cached(
        hashed.join(F.broadcast(quotas), "src").filter(F.col("h") < F.col("thr"))
    )
    checks = (
        quotas.join(
            surv.groupBy("src").agg(F.count(F.lit(1)).alias("n_surv")), "src", "left"
        )
        .withColumn("n_surv", F.coalesce("n_surv", F.lit(0)))
        .filter((F.col("n_surv") < F.col("quota")) & (F.col("n_surv") < F.col("n_s")))
    )
    underfilled = [r["src"] for r in checks.select("src").collect()]
    base = surv
    if underfilled:
        full = hashed.filter(F.col("src").isin(underfilled)).join(
            F.broadcast(quotas), "src"
        )
        base = surv.filter(~F.col("src").isin(underfilled)).unionByName(full)
    ranked = base.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("src").orderBy("h", "doc_id"))
    )
    return ranked.filter(F.col("rnk") <= F.col("quota")).select(
        F.col("src").alias("source"),
        "doc_id",
        F.col("n_s").cast("long").alias("n_source"),
        F.col("rnk").cast("long").alias("sample_rank"),
    )


def per_source_sample_sql(k: int = 10) -> str:
    h = portable_hash60_sql("text")
    return f"""
WITH counts AS (
  SELECT source AS src, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
),
ranked AS (
  SELECT doc_id, source AS src,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rnk
  FROM documents
)
SELECT src AS source, doc_id, n_s AS n_source, CAST(rnk AS BIGINT) AS sample_rank
FROM ranked JOIN counts USING (src)
WHERE rnk <= least({k}, n_s)
"""
