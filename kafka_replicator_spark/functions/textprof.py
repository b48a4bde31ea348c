"""Corpus profiling operators: readability, vocabulary growth, Zipf fit,
perplexity profiles, language-ID confusion.

The reference engine (CrowdStrike/kafka-replicator) moves bytes, not tokens
— these extend the training-data-pipeline family (quality dashboards a
curation pipeline gates on) over the shared ``documents`` table, following
the registry's cross-engine determinism rules: integer counts wherever
possible, milli-/micro-unit integer arithmetic for derived scores, DECIMAL
folds of per-row values rounded to 9 dp for order-independent sums, one
final DOUBLE division rounded to 6 dp.

Everything is pure column expressions (whole-stage codegen, no UDFs); the
explode-heavy plans hash-partition on the document key up front so every
downstream ``groupBy(doc…)`` is satisfied by the subset rule (one exchange,
see functions/hashing.spread_by_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import spread
from kafka_replicator_spark.functions.scoring import bigram_logprob, bigram_logprob_sql
from kafka_replicator_spark.functions.text import LANG_MARKERS, lang_id, lang_id_sql, tokens_col


# ------------------------------------------------------------- readability

def readability(docs: DataFrame) -> DataFrame:
    """Per-document readability profile via the vowel-group syllable
    heuristic: total syllables, monosyllabic-word share, and a FORCAST-style
    grade (``20 − 15·monosyllables/words``, carried in exact integer
    milli-units so any engine reproduces it bit-for-bit).

    Pure per-row column math — map-only, no shuffle; a scan-time projection
    at 100 TB.
    """
    toks = F.col("__toks")
    syl = F.transform(
        toks, lambda t: F.greatest(F.size(F.regexp_extract_all(t, F.lit("[aeiou]+"), F.lit(0))), F.lit(1))
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .select(
            "doc_id",
            F.size(toks).alias("n_words"),
            F.aggregate(syl, F.lit(0).cast("long"), lambda a, x: a + x).alias("n_syllables"),
            F.size(F.filter(syl, lambda s: s == 1)).alias("n_mono"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_syllables",
            F.expr("(1000 * n_syllables) div n_words").alias("avg_syllables_milli"),
            F.round(F.col("n_mono") / F.col("n_words"), 6).alias("mono_ratio"),
            F.expr("20000 - (15000 * n_mono) div n_words").alias("forcast_milli"),
        )
    )


def readability_sql() -> str:
    return """
WITH s AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        t -> greatest(len(regexp_extract_all(t, '[aeiou]+')), 1)) AS syl,
         len(string_split(text, ' ')) AS n_words
  FROM documents
), c AS (
  SELECT doc_id, n_words,
         CAST(list_sum(syl) AS BIGINT) AS n_syllables,
         len(list_filter(syl, x -> x = 1)) AS n_mono
  FROM s
)
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       n_syllables,
       (1000 * n_syllables) // n_words AS avg_syllables_milli,
       round(CAST(n_mono AS DOUBLE) / n_words, 6) AS mono_ratio,
       20000 - (15000 * n_mono) // n_words AS forcast_milli
FROM c
"""


# ---------------------------------------------------- vocabulary growth

def vocab_growth(docs: DataFrame) -> DataFrame:
    """Per-source vocabulary growth (Heaps' law): token count, type count,
    and the pointwise Heaps exponent ``ln(types)/ln(tokens)`` — the
    saturation signal a corpus-mixing pipeline watches per domain.

    One explode + one ``groupBy(source)`` with partial aggregation; the
    distinct-count expands to (source, token) map-side — both shuffles move
    (source, token)-grained rows, never the raw text.
    """
    toks = spread(docs.select("source", F.explode(tokens_col()).alias("tok")))
    agg = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").alias("n_types"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        F.round(
            F.log(F.col("n_types").cast("double")) / F.log(F.col("n_tokens").cast("double")), 6
        ).alias("heaps_exponent"),
    )


def vocab_growth_sql() -> str:
    return """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_types
  FROM toks GROUP BY source
)
SELECT source, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
       round(ln(CAST(n_types AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6) AS heaps_exponent
FROM agg
"""


# ------------------------------------------------------------- Zipf slope

ZIPF_TOPK = 30


def zipf_slope(docs: DataFrame, k: int = ZIPF_TOPK) -> DataFrame:
    """Zipf's-law fit: OLS slope of ``ln(freq)`` on ``ln(rank)`` over the
    top-``k`` corpus tokens — one number summarizing how head-heavy the
    token distribution is (natural text ≈ −1; boilerplate-heavy corpora
    drift steeper).

    The vocabulary aggregation is distributed; the top-``k`` cut is a
    distributed TakeOrdered (``orderBy().limit(k)``), and only the ``k``
    surviving rows see a window — the guarded small-side rank pattern
    (cf. corpus.bpe_merges).  Per-term regression moments are rounded to
    9 dp and summed as DECIMAL — order-independent, so both engines fold
    identically.
    """
    vocab = (
        spread(docs.select(F.explode(tokens_col()).alias("tok")))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = vocab.orderBy(F.desc("freq"), F.asc("tok")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = top.select(
        "tok", "freq", F.row_number().over(w).alias("rank")
    ).select(
        F.round(F.log(F.col("rank").cast("double")), 9).cast("decimal(18,9)").alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)").alias("y"),
    )
    moments = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return moments.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


def zipf_slope_sql(k: int = ZIPF_TOPK) -> str:
    return f"""
WITH vocab AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), top AS (
  SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
  FROM (SELECT tok, freq FROM vocab ORDER BY freq DESC, tok ASC LIMIT {k})
), terms AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM top
), m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
           AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / n, 6) AS zipf_intercept
FROM m
"""


# ---------------------------------------------------- perplexity profile

def perplexity_profile(docs: DataFrame) -> DataFrame:
    """Per-source perplexity profile under the corpus bigram LM: documents
    bucketed by integer surprise (``floor(−avg_logprob)``), with per-bucket
    counts and mean perplexity — the CCNet-style quality dashboard a
    curation pipeline gates sources on.

    Builds on :func:`scoring.bigram_logprob` (whose ``avg_logprob`` is
    already rounded to 6 dp, so ``exp(−x)`` is deterministic across
    engines); per-doc perplexities are re-rounded and summed as DECIMAL.
    """
    scored = bigram_logprob(docs).select(
        "doc_id",
        F.floor(-F.col("avg_logprob")).cast("int").alias("surprise_bucket"),
        F.round(F.exp(-F.col("avg_logprob")), 6).cast("decimal(20,6)").alias("ppl"),
    )
    joined = scored.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source", "surprise_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("ppl").cast("double") / F.count(F.lit(1)), 6).alias("avg_ppl"),
    )


def perplexity_profile_sql() -> str:
    return f"""
WITH blp AS ({bigram_logprob_sql()}),
scored AS (
  SELECT doc_id,
         CAST(floor(-avg_logprob) AS INTEGER) AS surprise_bucket,
         CAST(round(exp(-avg_logprob), 6) AS DECIMAL(20,6)) AS ppl
  FROM blp
)
SELECT d.source, s.surprise_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(s.ppl) AS DOUBLE) / count(*), 6) AS avg_ppl
FROM scored s JOIN documents d USING (doc_id)
GROUP BY d.source, s.surprise_bucket
"""


# ----------------------------------------------------- lang-ID confusion

def lang_confusion(docs: DataFrame) -> DataFrame:
    """Language-ID confusion matrix: predicted (marker-word heuristic,
    :func:`text.lang_id`) vs labeled language, with the share of each
    labeled language routed to each prediction — the evaluation artifact a
    pipeline tracks when tuning its language filter.

    Output is |langs|² rows — metadata-scale at any corpus size; the share
    denominator comes from a broadcast per-label total, not a window.
    """
    pred = lang_id(docs).groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = pred.groupBy("labeled_lang").agg(F.sum("n_docs").alias("n_label"))
    return pred.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_label"), 6).alias("share"),
    )


def lang_confusion_sql() -> str:
    return f"""
WITH li AS ({lang_id_sql()}),
cm AS (
  SELECT labeled_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM li GROUP BY labeled_lang, predicted_lang
)
SELECT labeled_lang, predicted_lang, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / sum(n_docs) OVER (PARTITION BY labeled_lang), 6) AS share
FROM cm
"""


# -------------------------------------------------------- length quantiles

def length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-source document-length quartiles (exact, interpolated): the
    length-distribution fingerprint a curation pipeline tracks per domain.
    Quartile fractions are powers of two, so the linear interpolation
    between the two exact integer order statistics is bit-identical on any
    IEEE engine.  Spark's ``percentile`` is the sort-based exact aggregate
    (one shuffle, partial sort per partition) — never an approximation.
    """
    q = F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D))")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            q.alias("q"),
        )
        .select(
            "source",
            "n_docs",
            "min_chars",
            "max_chars",
            F.round(F.col("q")[0], 6).alias("p25"),
            F.round(F.col("q")[1], 6).alias("p50"),
            F.round(F.col("q")[2], 6).alias("p75"),
        )
    )


def length_quantiles_sql() -> str:
    return """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75
FROM documents GROUP BY source
"""


# --------------------------------------------------------- stopword profile

def stopword_profile(docs: DataFrame) -> DataFrame:
    """Corpus-level stopword profile per (source, lang): token volume,
    stopword share, and per-stopword hit rate spread — the domain-level
    aggregate of the per-document stopword ratio in
    :func:`text.quality_score` (a domain whose stopword share collapses is
    usually boilerplate or non-prose).

    Map-side array math per document (no explode), one aggregation on the
    (source, lang) grain.
    """
    from kafka_replicator_spark.functions.text import STOPWORDS, tokens_col

    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    per_doc = docs.select(
        "source",
        "lang",
        F.size(toks).cast("long").alias("nt"),
        n_stop.cast("long").alias("ns"),
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("ns").alias("n_stopwords"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            "n_stopwords",
            F.round(F.col("n_stopwords") / F.col("n_tokens"), 6).alias("stop_ratio"),
        )
    )


def stopword_profile_sql() -> str:
    from kafka_replicator_spark.functions.text import STOPWORDS

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH per_doc AS (
  SELECT source, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN ({stop_list})))
              AS BIGINT) AS ns
  FROM documents
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(ns) AS BIGINT) AS n_stopwords,
       round(CAST(sum(ns) AS DOUBLE) / sum(nt), 6) AS stop_ratio
FROM per_doc GROUP BY source, lang
"""


# --------------------------------------------------------- span corruption

SPAN_GATE_MOD = 20
SPAN_LEN = 3


def span_corruption(docs: DataFrame) -> DataFrame:
    """T5-style span-corruption planning: deterministically gate span starts
    by a positional hash (rate 1/``SPAN_GATE_MOD``), mask ``SPAN_LEN``
    tokens from each start (overlaps union), and report per-document mask
    statistics — the pretraining-objective planner as a corpus query, no
    RNG state so any engine (or a resumed job) reproduces the mask.

    Pure per-document array math (gates array, then a positional
    union-membership test via 0-based ``get`` so out-of-range probes are
    null-safe) — map-only at any scale.
    """
    from kafka_replicator_spark.functions.hashing import portable_hash32

    toks = F.col("__toks")
    n = F.size(toks)
    gates = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (
            portable_hash32(
                F.concat_ws(":", F.col("doc_id").cast("string"), i.cast("string"))
            )
            % SPAN_GATE_MOD
            == 0
        ),
    )
    g = F.col("__gates")
    masked = F.filter(
        F.sequence(F.lit(1), F.size(g)),
        lambda j: (
            F.coalesce(F.get(g, j - 1), F.lit(False))
            | F.coalesce(F.get(g, j - 2), F.lit(False))
            | F.coalesce(F.get(g, j - 3), F.lit(False))
        ),
    )
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks"))
        .select("doc_id", F.size(toks).alias("n_tokens"), gates.alias("__gates"))
        .select(
            "doc_id",
            "n_tokens",
            F.size(F.filter(g, lambda x: x)).alias("n_spans"),
            F.size(masked).alias("n_masked"),
        )
        .withColumn("mask_ppm", F.expr("(1000000 * cast(n_masked as bigint)) div n_tokens"))
    )


def span_corruption_sql() -> str:
    # DuckDB list indexing is 1-based and NEGATIVE indices wrap from the
    # END (g[-1] is the last element) — lookbacks must be bounds-guarded
    # with j >= k, never coalesce'd.
    from kafka_replicator_spark.functions.hashing import portable_hash32_sql

    h = portable_hash32_sql("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         list_transform(range(1, len(string_split(text, ' ')) + 1),
                        i -> {h} % {SPAN_GATE_MOD} = 0) AS g
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(len(list_filter(g, x -> x)) AS INTEGER) AS n_spans,
       CAST(len(list_filter(range(1, n_tokens + 1),
              j -> g[j] OR (j >= 2 AND g[j-1]) OR (j >= 3 AND g[j-2])))
            AS INTEGER) AS n_masked,
       (1000000 * len(list_filter(range(1, n_tokens + 1),
              j -> g[j] OR (j >= 2 AND g[j-1]) OR (j >= 3 AND g[j-2]))))
           // n_tokens AS mask_ppm
FROM t
"""


# ----------------------------------------- char-trigram profile language ID

CHARGRAM_TOPK = 20


def charngram_langid(docs: DataFrame, topk: int = CHARGRAM_TOPK) -> DataFrame:
    """Profile-based language ID (Cavnar & Trenkle 1994 n-gram category
    shape): build a top-``topk`` character-trigram profile per labeled
    language from the corpus itself, then classify every document by
    distinct-trigram overlap with each profile (argmax, ties to the
    smaller lang code) — the self-supervised upgrade of the marker-word
    heuristic (:func:`text.lang_id`).

    Profiles are (langs × topk) rows — broadcast-scale; the per-language
    rank window runs on aggregated (lang, trigram) counts, never the
    character stream; the scoring join fans out bounded by the doc's
    distinct profile hits.
    """
    idx = F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("i")
    tri = (
        spread(docs.select("doc_id", "lang", "text"))
        .filter(F.length("text") >= 3)
        .select("doc_id", "lang", "text", idx)
        .select("doc_id", "lang", F.expr("substr(text, i, 3)").alias("tri"))
    )
    lang_counts = tri.groupBy("lang", "tri").agg(F.count(F.lit(1)).alias("c"))
    wl = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    profile = (
        lang_counts.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= topk)
        .select(F.col("lang").alias("plang"), "tri")
    )
    doc_tri = tri.select("doc_id", "tri").distinct()
    hits = (
        doc_tri.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("plang"))
    best = hits.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    return (
        docs.select("doc_id", F.col("lang").alias("labeled_lang"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "labeled_lang",
            F.coalesce(F.col("plang"), F.lit("und")).alias("predicted_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("profile_hits"),
        )
    )


def charngram_langid_sql(topk: int = CHARGRAM_TOPK) -> str:
    return f"""
WITH tri AS (
  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS tri
  FROM documents, unnest(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
),
lang_counts AS (
  SELECT lang, tri, count(*) AS c FROM tri GROUP BY lang, tri
),
profile AS (
  SELECT lang AS plang, tri FROM (
    SELECT lang, tri, row_number() OVER (
      PARTITION BY lang ORDER BY c DESC, tri ASC) AS rn
    FROM lang_counts
  ) WHERE rn <= {topk}
),
doc_tri AS (SELECT DISTINCT doc_id, tri FROM tri),
hits AS (
  SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS hits
  FROM doc_tri JOIN profile USING (tri)
  GROUP BY doc_id, plang
),
best AS (
  SELECT doc_id, plang, hits FROM (
    SELECT doc_id, plang, hits, row_number() OVER (
      PARTITION BY doc_id ORDER BY hits DESC, plang ASC) AS rn
    FROM hits
  ) WHERE rn = 1
)
SELECT d.doc_id, d.lang AS labeled_lang,
       coalesce(b.plang, 'und') AS predicted_lang,
       coalesce(b.hits, 0) AS profile_hits
FROM documents d LEFT JOIN best b USING (doc_id)
"""
