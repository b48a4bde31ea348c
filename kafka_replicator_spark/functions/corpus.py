"""Corpus-level statistics operators for training-data curation: boilerplate
n-gram detection, DSIR-style importance weighting, and BPE merge statistics.

These extend the documents-table pipeline family (functions/dedup.py,
functions/scoring.py) with the three remaining curation primitives a
large-scale pretraining pipeline runs between dedup and packing:

  * **boilerplate detection** (RefinedWeb / CCNet style): n-grams that recur
    across many *distinct* documents are navigation chrome, license
    headers, templated spam — measure each document's boilerplate share.
  * **DSIR importance weights** (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-unigram log-ratio
    of a target-domain LM vs the raw-corpus LM; documents that look like
    the target get high weight and win the resampling lottery.
  * **BPE merge statistics**: the first round of byte-pair-encoding vocab
    induction — corpus-weighted adjacent-symbol pair counts — the
    aggregation that dominates distributed tokenizer training.

The reference engine has no analog (it moves bytes, not tokens; its closest
surface is the per-topic metrics pipeline, pkg/core/metrics.go) — this is
the LLM-pipeline surface grafted onto the same exactness conventions:
integer or DECIMAL-fold outputs everywhere, floats only at the final
rounded division.

Scale notes (100 TB):
  * boiler_ngrams: the df aggregation is map-side combinable; the boiler
    set (df ≥ min_df) is tiny by Zipf — broadcast it back against the
    exploded stream.  Spark picks the broadcast automatically below the
    10 MB threshold; at pathological boiler-set sizes AQE falls back to a
    shuffle join and correctness is unchanged.
  * dsir_weights: bucket tables are fixed-size (n_buckets rows) — always
    broadcast; the only big shuffle is the per-doc fold, keyed by doc_id.
  * bpe_merges: pair counting runs over *distinct words × positions*, not
    raw tokens — the word-count aggregation collapses the corpus first
    (Zipf again: distinct words ≪ token occurrences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import (
    portable_hash32,
    portable_hash32_sql,
    portable_hash60,
    portable_hash60_sql,
    spread,
)
from kafka_replicator_spark.functions.text import tokens_col

# ------------------------------------------------------------- boilerplate


def boiler_ngrams(
    docs: DataFrame, n: int = 4, min_df: int = 3
) -> DataFrame:
    """Per-document boilerplate share by corpus-frequent n-grams.

    An n-gram present in ≥ ``min_df`` distinct documents is boilerplate;
    each document reports its distinct-n-gram count, how many of those are
    boilerplate, and the share in integer ppm (no float rounding anywhere).
    Documents shorter than ``n`` tokens have no n-grams and report zeros.

    The n-gram text never leaves the map side: shingles collapse to the
    portable 60-bit hash before the document-frequency shuffle and the
    boiler-set join, so the exchange moves int64s instead of ~30-byte
    strings (the md5-based hash is identical in DuckDB, so the oracle
    counts collide — astronomically unlikely at 60 bits — the same way).
    """
    toks = F.col("__toks")  # materialized projection — building grams off
    # the raw split expression would re-split the text per element access
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array())
    per_doc = (
        spread(docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks")))
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.explode_outer(F.transform("grams", lambda g: portable_hash60(g))).alias("g"),
        )
    )
    df_counts = (
        per_doc.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boiler = df_counts.filter(F.col("df") >= min_df).select("g", F.lit(1).alias("is_boiler"))
    joined = per_doc.join(F.broadcast(boiler), "g", "left")
    out = joined.groupBy("doc_id").agg(
        F.count("g").alias("n_ngrams"),
        F.coalesce(F.sum("is_boiler"), F.lit(0)).alias("n_boiler"),
    )
    return out.select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_boiler").cast("long").alias("n_boiler"),
        F.when(
            F.col("n_ngrams") > 0,
            F.floor((F.col("n_boiler") * F.lit(1000000)) / F.col("n_ngrams")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("boiler_ppm"),
    )


def boiler_ngrams_sql(n: int = 4, min_df: int = 3) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    h = portable_hash60_sql("shingle")
    return f"""
WITH per_doc AS (
  SELECT DISTINCT doc_id, {h} AS g
  FROM (
    SELECT doc_id, {gram} AS shingle
    FROM (
      SELECT doc_id, t, unnest(range(1, len(t) - {n - 2})) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
  )
), all_docs AS (
  SELECT doc_id FROM documents
), df_counts AS (
  SELECT g, count(*) AS df FROM per_doc GROUP BY g
), boiler AS (
  SELECT g FROM df_counts WHERE df >= {min_df}
), agg AS (
  SELECT p.doc_id,
         count(*) AS n_ngrams,
         CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
  FROM per_doc p LEFT JOIN boiler b ON p.g = b.g
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(a.n_boiler, 0) AS BIGINT) AS n_boiler,
       CAST(CASE WHEN coalesce(a.n_ngrams, 0) > 0
                 THEN (a.n_boiler * 1000000) // a.n_ngrams
                 ELSE 0 END AS BIGINT) AS boiler_ppm
FROM all_docs d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


# ------------------------------------------------------------------- DSIR


def dsir_weights(
    docs: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR hashed-unigram importance weights.

    Tokens hash into ``n_buckets`` buckets; one conditional corpus
    aggregation builds both the target-domain (``source = target_source``)
    and raw bucket counts; each
    bucket carries the add-1-smoothed log-ratio ``ln((t_b+1)/(T+B)) -
    ln((r_b+1)/(R+B))`` rounded to 9 dp, and a document's log-weight is the
    exact DECIMAL sum of its tokens' bucket ratios (order-independent), with
    only the final per-token average in DOUBLE rounded to 6 dp.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    # the hashed token stream feeds BOTH the bucket aggregation and the
    # per-doc scoring join — cache it or the explode + md5 runs twice
    toks = track_cached(
        spread(
            docs.select("doc_id", "source", F.explode(tokens_col()).alias("tok"))
        ).select("doc_id", "source", (portable_hash32("tok") % n_buckets).alias("b"))
    )
    # one conditional aggregation builds both LMs — not two passes (and two
    # bucket shuffles) over the token stream
    buckets = toks.groupBy("b").agg(
        F.count(F.lit(1)).alias("r"),
        F.count_if(F.col("source") == target_source).alias("t"),
    )
    totals = buckets.agg(
        F.sum("r").alias("tot_r"), F.sum("t").alias("tot_t")
    )  # 1 row — broadcast into the bucket table
    ratio = buckets.join(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log((F.col("t") + 1).cast("double") / (F.col("tot_t") + n_buckets).cast("double"))
            - F.log((F.col("r") + 1).cast("double") / (F.col("tot_r") + n_buckets).cast("double")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("lr"),
    )
    per_doc = (
        toks.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr").alias("s"))
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round(F.col("s").cast("double") / F.col("n_tokens"), 6).alias("dsir_logweight"),
    )


def dsir_weights_sql(target_source: str = "src0", n_buckets: int = 1024) -> str:
    h = portable_hash32_sql("tok")
    return f"""
WITH toks AS (
  SELECT doc_id, source, ({h} % {n_buckets}) AS b
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents)
), buckets AS (
  SELECT b, count(*) AS r,
         count(*) FILTER (WHERE source = '{target_source}') AS t
  FROM toks GROUP BY b
), totals AS (
  SELECT CAST(sum(r) AS BIGINT) AS tot_r, CAST(sum(t) AS BIGINT) AS tot_t FROM buckets
), ratio AS (
  SELECT b,
         CAST(round(
           ln(CAST(t + 1 AS DOUBLE) / CAST(tot_t + {n_buckets} AS DOUBLE))
           - ln(CAST(r + 1 AS DOUBLE) / CAST(tot_r + {n_buckets} AS DOUBLE)),
         9) AS DECIMAL(18,9)) AS lr
  FROM buckets, totals
), per_doc AS (
  SELECT doc_id, count(*) AS n_tokens, sum(lr) AS s
  FROM toks JOIN ratio USING (b) GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       round(CAST(s AS DOUBLE) / n_tokens, 6) AS dsir_logweight
FROM per_doc
"""


# ------------------------------------------------------------- BPE merges


def bpe_merges(docs: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` byte-pair-encoding merge candidates (round 1).

    The corpus collapses to distinct words with occurrence counts first
    (the Zipf win — pair extraction then runs over the vocabulary, not the
    token stream); every adjacent character pair inside a word contributes
    the word's corpus count.  Ranking is count desc then pair asc, fully
    deterministic, all integers.
    """
    words = spread(docs.select(F.explode(tokens_col()).alias("w"))).filter(
        F.length("w") >= 2
    )
    word_counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    pairs = word_counts.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    pair_counts = pairs.groupBy("pair").agg(F.sum("c").alias("cnt"))
    # distributed top-k (TakeOrderedAndProject) first; the global row_number
    # window then runs over k rows, not the whole pair table.
    top = pair_counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "pair",
        F.col("cnt").cast("long").alias("cnt"),
    )


def bpe_merges_sql(k: int = 20) -> str:
    return f"""
WITH words AS (
  SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2
), word_counts AS (
  SELECT w, count(*) AS c FROM words GROUP BY w
), pairs AS (
  SELECT substr(w, i, 2) AS pair, c
  FROM (SELECT w, c, unnest(range(1, length(w))) AS i FROM word_counts)
), pair_counts AS (
  SELECT pair, CAST(sum(c) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS INTEGER) AS rank,
       pair, cnt
FROM pair_counts
ORDER BY cnt DESC, pair ASC
LIMIT {k}
"""


def bpe_fertility(docs: DataFrame, k: int = 20) -> DataFrame:
    """Per-source tokenizer fertility under the round-1 BPE merge table
    (VERDICT r09 #7): apply the :func:`bpe_merges` top-``k`` character
    pairs to every word — single round, all pairs at once, greedy
    left-to-right non-overlapping — and report subword tokens per word
    and per char in exact ppm.

    Greedy non-overlap has a closed form: within a maximal RUN of L
    consecutive mergeable positions, the left-to-right scan merges
    ceil(L/2) = (L+1) div 2 pairs (merge, skip, merge, …), so the
    sequential walk reduces to the islands idiom on the position grain —
    no per-word recursion on either engine.  A word's subword count is
    length(word) − merges(word), starting from single-char tokens.

    Scale: merge counting runs over the DISTINCT vocabulary (the Zipf win
    bpe_merges already uses); the merge table broadcasts (k rows); the
    occurrence-grain join back is (source, word)-count grain, never the
    token stream; windows partition by word (positions-per-word grain).
    """
    from kafka_replicator_spark.cacheutil import track_cached

    merges = bpe_merges(docs, k).select("pair")
    wc = track_cached(
        spread(docs.select("source", F.explode(tokens_col()).alias("w")))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = wc.select("w").distinct().filter(F.length("w") >= 2)
    pos = vocab.select(
        "w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(i.alias("i"), F.col("w").substr(i, F.lit(2)).alias("pair")),
            )
        ).alias("x"),
    ).select("w", F.col("x.i").alias("i"), F.col("x.pair").alias("pair"))
    member = pos.join(F.broadcast(merges), "pair").select("w", "i")
    byw = Window.partitionBy("w").orderBy("i")
    flagged = member.select(
        "w",
        "i",
        F.when(
            F.lag("i").over(byw).isNull() | (F.col("i") - F.lag("i").over(byw) > 1), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    isl = flagged.select(
        "w",
        F.sum("brk").over(byw.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    runs = isl.groupBy("w", "island").agg(F.count(F.lit(1)).alias("L"))
    wmerges = runs.groupBy("w").agg(F.sum(F.expr("(L + 1) div 2")).alias("m"))
    wtok = wc.join(wmerges, "w", "left").select(
        "source",
        "c",
        F.length("w").cast("long").alias("wlen"),
        (F.length("w") - F.coalesce("m", F.lit(0))).cast("long").alias("bt"),
    )
    return (
        wtok.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("wlen")).cast("long").alias("n_chars"),
            F.sum(F.col("c") * F.col("bt")).cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            # ppm-numerator rule: DECIMAL lift before the ×1e6
            F.expr(
                "CAST((CAST(n_bpe_tokens AS DECIMAL(38,0)) * 1000000) div n_words AS BIGINT)"
            ).alias("fertility_ppm"),
            F.expr(
                "CAST((CAST(n_bpe_tokens AS DECIMAL(38,0)) * 1000000) div n_chars AS BIGINT)"
            ).alias("compression_ppm"),
        )
    )


def bpe_fertility_sql(k: int = 20) -> str:
    return f"""
WITH merges AS MATERIALIZED (SELECT pair FROM ({bpe_merges_sql(k)})),
wstream AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT source, w, count(*) AS c FROM wstream GROUP BY source, w),
vocab AS (SELECT DISTINCT w FROM wc WHERE length(w) >= 2),
pos AS (
  SELECT w, i, substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(range(1, length(w))) AS i FROM vocab)
),
member AS (SELECT p.w, p.i FROM pos p JOIN merges USING (pair)),
flagged AS (
  SELECT w, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY w ORDER BY i) > 1
                   OR lag(i) OVER (PARTITION BY w ORDER BY i) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM member
),
isl AS (SELECT w, sum(brk) OVER (PARTITION BY w ORDER BY i) AS island FROM flagged),
runs AS (SELECT w, island, count(*) AS L FROM isl GROUP BY w, island),
wmerges AS (SELECT w, CAST(sum((L + 1) // 2) AS BIGINT) AS m FROM runs GROUP BY w),
wtok AS (
  SELECT wc.source, wc.c, CAST(length(wc.w) AS BIGINT) AS wlen,
         CAST(length(wc.w) - coalesce(wm.m, 0) AS BIGINT) AS bt
  FROM wc LEFT JOIN wmerges wm ON wc.w = wm.w
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * wlen) AS BIGINT) AS n_chars,
       CAST(sum(c * bt) AS BIGINT) AS n_bpe_tokens,
       CAST((CAST(sum(c * bt) AS HUGEINT) * 1000000) // sum(c) AS BIGINT)
           AS fertility_ppm,
       CAST((CAST(sum(c * bt) AS HUGEINT) * 1000000) // sum(c * wlen) AS BIGINT)
           AS compression_ppm
FROM wtok GROUP BY source
"""


# ------------------------------------------------------------ PMI pairs


def cooccur_pmi(
    docs: DataFrame, window: int = 2, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Top-``k`` word pairs by pointwise mutual information, co-occurring
    within ``window`` positions — the association statistic behind
    embedding-prep co-occurrence matrices (word2vec/GloVe preprocessing).

    ``pmi(a,b) = ln(c_ab · N_pairs / (m_a · m_b))`` with ``m_x`` the
    pair-slot marginal of ``x`` and pairs canonicalized (least, greatest);
    rare pairs (< min_count) are cut before ranking so PMI's low-count
    blow-up can't dominate.  Counts are exact integers; ln runs in double
    identically in both engines and is rounded to 6 dp before the
    deterministic (pmi desc, pair asc) cut.

    Scale: pair counting is one map-side-combinable aggregation over the
    exploded pair stream; marginals come from the same pair stream (one
    more aggregation), and the final join keys on single words —
    vocabulary-sized, hash-joinable at any corpus size.
    """
    toks = F.col("__toks")

    def pair_at(d: int):
        # single-arg lambda: a (i, extra=d) signature would make transform
        # pass the array INDEX as the second argument (pyspark arity probe)
        def mk(i):
            x = F.element_at(toks, i.cast("int"))
            y = F.element_at(toks, (i + d).cast("int"))
            return F.struct(F.least(x, y).alias("a"), F.greatest(x, y).alias("b"))

        return mk

    pair_arrays = [
        F.when(
            F.size(toks) > d,
            F.transform(F.sequence(F.lit(1), F.size(toks) - d), pair_at(d)),
        ).otherwise(F.array())
        for d in range(1, window + 1)
    ]
    pairs = (
        spread(docs.select(F.split(F.col("text"), " ").alias("__toks")))
        .select(F.explode(F.concat(*pair_arrays)).alias("p"))
        .select("p.a", "p.b")
    )
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    # pair-slot marginals: how often each word occupies a slot of any pair
    marg = (
        pairs.select(F.explode(F.array("a", "b")).alias("wd"))
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n_pairs = pc.agg(F.sum("c_ab").alias("n_pairs"))
    scored = (
        pc.filter(F.col("c_ab") >= min_count)
        .join(marg.select(F.col("wd").alias("a"), F.col("m").alias("m_a")), "a")
        .join(marg.select(F.col("wd").alias("b"), F.col("m").alias("m_b")), "b")
        .join(F.broadcast(n_pairs))
        .select(
            "a", "b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    F.col("c_ab").cast("double")
                    * F.col("n_pairs").cast("double")
                    / (F.col("m_a").cast("double") * F.col("m_b").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b")).limit(k)
    w = Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "a", "b", "c_ab", "pmi"
    )


def cooccur_pmi_sql(window: int = 2, min_count: int = 5, k: int = 20) -> str:
    dists = ", ".join(str(d) for d in range(1, window + 1))
    return f"""
WITH toked AS (
  SELECT string_split(text, ' ') AS t FROM documents
), pairs AS (
  SELECT least(t[i], t[i+d]) AS a, greatest(t[i], t[i+d]) AS b
  FROM (
    SELECT t, d, unnest(range(1, len(t) - d + 1)) AS i
    FROM toked, (SELECT unnest([{dists}]) AS d)
    WHERE len(t) > d
  )
), pc AS (
  SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b
), marg AS (
  SELECT wd, count(*) AS m
  FROM (SELECT unnest([a, b]) AS wd FROM pairs)
  GROUP BY wd
), n AS (
  SELECT CAST(sum(c_ab) AS BIGINT) AS n_pairs FROM pc
), scored AS (
  SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
         round(ln(CAST(c_ab AS DOUBLE) * CAST(n_pairs AS DOUBLE)
                  / (CAST(ma.m AS DOUBLE) * CAST(mb.m AS DOUBLE))), 6) AS pmi
  FROM pc
  JOIN marg ma ON pc.a = ma.wd
  JOIN marg mb ON pc.b = mb.wd
  CROSS JOIN n
  WHERE c_ab >= {min_count}
)
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS INTEGER) AS rank,
       a, b, c_ab, pmi
FROM scored
ORDER BY pmi DESC, a ASC, b ASC
LIMIT {k}
"""


# ---------------------------------------------------------- n-gram novelty


def ngram_novelty(docs: DataFrame, n: int = 4) -> DataFrame:
    """Per-document n-gram novelty against everything that came before it.

    Processing the corpus in ``doc_id`` order, a document's novelty is the
    fraction of its distinct n-grams whose FIRST corpus occurrence is this
    document (min doc_id over the gram's postings) — the statistic behind
    data-curation growth curves ("how much new text does each shard add?")
    and dedup-policy tuning.  Integer ppm output; first-occurrence is an
    aggregation, not a sequential scan, so the "in order" semantics cost
    one gram-keyed shuffle at any scale.

    Shares the hashed-shingle stream shape with :func:`boiler_ngrams`
    (int64 gram keys on the wire, never the text).
    """
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array())
    per_doc = (
        spread(docs.select("doc_id", F.split(F.col("text"), " ").alias("__toks")))
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.explode_outer(F.transform("grams", lambda g: portable_hash60(g))).alias("g"),
        )
    )
    first_seen = (
        per_doc.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    out = (
        per_doc.join(first_seen, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_ngrams"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias("n_novel"),
        )
    )
    return out.select(
        "doc_id",
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        F.when(
            F.col("n_ngrams") > 0,
            F.floor((F.col("n_novel") * F.lit(1000000)) / F.col("n_ngrams")),
        )
        .otherwise(F.lit(1000000))  # an empty doc adds nothing but repeats nothing
        .cast("long")
        .alias("novelty_ppm"),
    )


def ngram_novelty_sql(n: int = 4) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    h = portable_hash60_sql("shingle")
    return f"""
WITH per_doc AS (
  SELECT DISTINCT doc_id, {h} AS g
  FROM (
    SELECT doc_id, {gram} AS shingle
    FROM (
      SELECT doc_id, t, unnest(range(1, len(t) - {n - 2})) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
  )
), first_seen AS (
  SELECT g, min(doc_id) AS first_doc FROM per_doc GROUP BY g
), agg AS (
  SELECT p.doc_id, count(*) AS n_ngrams,
         count(*) FILTER (WHERE f.first_doc = p.doc_id) AS n_novel
  FROM per_doc p JOIN first_seen f ON p.g = f.g
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(a.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN coalesce(a.n_ngrams, 0) > 0
                 THEN (a.n_novel * 1000000) // a.n_ngrams
                 ELSE 1000000 END AS BIGINT) AS novelty_ppm
FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def bpe_merge_curve(docs: DataFrame, ks: tuple[int, ...] = (5, 10, 20)) -> DataFrame:
    """Merge-budget sensitivity of round-1 BPE compression: corpus-level
    subword counts under the top-5/10/20 merge tables, all arms from ONE
    shared (word, position, rank) frame — the literal-ladder sweep pattern
    (r_checkpoint_interval_sweep).  The merge table is rank-prefix-closed
    (bpe_merges ranks count desc, pair asc), so arm k just filters
    rank <= k; each arm re-runs the greedy-run islands closure because
    WHICH positions are mergeable changes with the table.

    Diminishing compression_ppm deltas across arms say where the
    vocabulary budget stops paying — the data-side answer to "how many
    merges do we need".  Same closed form as :func:`bpe_fertility`
    (ceil(run/2) merges per island); windows partition by word.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    merges = bpe_merges(docs, max(ks)).select("rank", "pair")
    wc = track_cached(
        spread(docs.select(F.explode(tokens_col()).alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = wc.select("w").distinct().filter(F.length("w") >= 2)
    pos = vocab.select(
        "w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(i.alias("i"), F.col("w").substr(i, F.lit(2)).alias("pair")),
            )
        ).alias("x"),
    ).select("w", F.col("x.i").alias("i"), F.col("x.pair").alias("pair"))
    member_all = track_cached(pos.join(F.broadcast(merges), "pair").select("w", "i", "rank"))
    totals = wc.agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("n_chars"),
    )
    byw = Window.partitionBy("w").orderBy("i")
    out = None
    for k in sorted(ks):
        member = member_all.filter(F.col("rank") <= k).select("w", "i")
        flagged = member.select(
            "w",
            "i",
            F.when(
                F.lag("i").over(byw).isNull() | (F.col("i") - F.lag("i").over(byw) > 1), 1
            )
            .otherwise(0)
            .alias("brk"),
        )
        isl = flagged.select(
            "w",
            F.sum("brk").over(byw.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
        )
        runs = isl.groupBy("w", "island").agg(F.count(F.lit(1)).alias("L"))
        wmerges = runs.groupBy("w").agg(F.sum(F.expr("(L + 1) div 2")).alias("m"))
        arm = (
            wc.join(wmerges, "w", "left")
            .agg(
                F.sum(
                    F.col("c") * (F.length("w") - F.coalesce("m", F.lit(0)))
                )
                .cast("long")
                .alias("n_bpe_tokens")
            )
            .crossJoin(F.broadcast(totals))
            .select(
                F.lit(k).cast("long").alias("merge_budget"),
                "n_words",
                "n_chars",
                "n_bpe_tokens",
                F.expr(
                    "CAST((CAST(n_bpe_tokens AS DECIMAL(38,0)) * 1000000)"
                    " div n_chars AS BIGINT)"
                ).alias("compression_ppm"),
            )
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("merge_budget")


def bpe_merge_curve_sql(ks: tuple[int, ...] = (5, 10, 20)) -> str:
    arms = []
    for k in sorted(ks):
        arms.append(f"""
SELECT CAST({k} AS BIGINT) AS merge_budget, n_words, n_chars,
       (SELECT CAST(sum(wc.c * (length(wc.w) - coalesce(m.m, 0))) AS BIGINT)
        FROM wc LEFT JOIN (
          SELECT w, CAST(sum((L + 1) // 2) AS BIGINT) AS m FROM (
            SELECT w, island, count(*) AS L FROM (
              SELECT w, i, sum(brk) OVER (PARTITION BY w ORDER BY i) AS island
              FROM (
                SELECT w, i,
                       CASE WHEN i - lag(i) OVER (PARTITION BY w ORDER BY i) > 1
                                 OR lag(i) OVER (PARTITION BY w ORDER BY i) IS NULL
                            THEN 1 ELSE 0 END AS brk
                FROM member_all WHERE rank <= {k}
              )
            ) GROUP BY w, island
          ) GROUP BY w
        ) m ON m.w = wc.w) AS n_bpe_tokens
FROM totals""")
    u = " UNION ALL ".join(arms)
    return f"""
WITH merges AS MATERIALIZED (SELECT rank, pair FROM ({bpe_merges_sql(max(ks))})),
wstream AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS MATERIALIZED (SELECT w, count(*) AS c FROM wstream GROUP BY w),
vocab AS (SELECT DISTINCT w FROM wc WHERE length(w) >= 2),
pos AS (
  SELECT w, i, substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(range(1, length(w))) AS i FROM vocab)
),
member_all AS MATERIALIZED (
  SELECT p.w, p.i, m.rank FROM pos p JOIN merges m USING (pair)
),
totals AS MATERIALIZED (
  SELECT CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * length(w)) AS BIGINT) AS n_chars
  FROM wc
)
SELECT merge_budget, n_words, n_chars, n_bpe_tokens,
       CAST((CAST(n_bpe_tokens AS HUGEINT) * 1000000) // n_chars AS BIGINT)
         AS compression_ppm
FROM ({u})
ORDER BY merge_budget
"""


def bpe_roundtrip(docs: DataFrame, k: int = 20) -> DataFrame:
    """Tokenizer round-trip fidelity under the round-1 BPE merge table
    (VERDICT r10 #6): EXPLICITLY segment every vocabulary word with the
    top-``k`` merges (greedy left-to-right non-overlap = merge at the
    odd-ranked positions of each mergeable-position island), decode by
    concatenating the subword pieces in order, and verify decode == word.

    BPE is lossless by construction — identity_types_ppm /
    identity_occ_ppm are PINNED at 1000000, the a_littles_law_identity
    pattern: two independent computations (the explicit segmentation here
    vs the word itself) whose agreement localizes segmentation bugs
    (overlapping merges, island off-by-ones, substr boundary errors) on
    either engine.  The explicit per-word subword count is also emitted
    beside :func:`bpe_fertility`'s closed form (len(w) − Σ ceil(L/2)) —
    subwords_explicit == subwords_closed_form ties the closed form to a
    real segmentation, not just to itself.

    Scale: everything runs over the DISTINCT vocabulary (the Zipf win);
    the merge table broadcasts (k rows); windows partition by word.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    merges = bpe_merges(docs, k).select("pair")
    # length >= 1 guard on BOTH engines: an empty token (double/leading
    # space) would hit the sequence(1,0) -> [1,0] vs range(1,1) -> empty
    # cross-engine trap in the chars frame below
    wc = track_cached(
        spread(docs.select(F.explode(tokens_col()).alias("w")))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab2 = wc.select("w").filter(F.length("w") >= 2)
    pos = vocab2.select(
        "w",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    i.alias("i"), F.col("w").substr(i, F.lit(2)).alias("pair")
                ),
            )
        ).alias("x"),
    ).select("w", F.col("x.i").alias("i"), F.col("x.pair").alias("pair"))
    member = pos.join(F.broadcast(merges), "pair").select("w", "i")
    byw = Window.partitionBy("w").orderBy("i")
    isl = track_cached(
        member.select(
            "w",
            "i",
            F.when(
                F.lag("i").over(byw).isNull()
                | (F.col("i") - F.lag("i").over(byw) > 1),
                1,
            )
            .otherwise(0)
            .alias("brk"),
        ).select(
            "w",
            "i",
            F.sum("brk")
            .over(byw.rowsBetween(Window.unboundedPreceding, 0))
            .alias("island"),
        )
    )  # feeds the explicit merge starts AND the closed form
    byisl = Window.partitionBy("w", "island").orderBy("i")
    mstart = track_cached(
        isl.withColumn("rn", F.row_number().over(byisl))
        .filter(F.col("rn") % 2 == 1)
        .select("w", "i")
    )  # feeds the pair pieces AND the covered-char set
    cov = mstart.select(
        "w", F.explode(F.array(F.col("i"), F.col("i") + 1)).alias("cpos")
    )
    chars = wc.select(
        "w", F.explode(F.sequence(F.lit(1), F.length("w"))).alias("cpos")
    )
    seg = (
        chars.join(cov, ["w", "cpos"], "left_anti")
        .select("w", F.col("cpos").alias("start"), F.lit(1).alias("slen"))
        .unionAll(mstart.select("w", F.col("i").alias("start"), F.lit(2).alias("slen")))
        .select("w", "start", F.expr("substr(w, start, slen)").alias("piece"))
    )
    dec = seg.groupBy("w").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("start", "piece"))),
                lambda s: s["piece"],
            ),
            "",
        ).alias("back"),
        F.count(F.lit(1)).cast("long").alias("n_sub"),
    )
    cf = (
        isl.groupBy("w", "island")
        .agg(F.count(F.lit(1)).alias("L"))
        .groupBy("w")
        .agg(F.sum(F.expr("(L + 1) div 2")).alias("m"))
    )
    per_w = (
        wc.join(dec, "w")
        .join(cf, "w", "left")
        .select(
            "w",
            "c",
            "back",
            "n_sub",
            (F.length("w") - F.coalesce("m", F.lit(0))).cast("long").alias("n_sub_cf"),
        )
    )
    return per_w.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_occurrences"),
        F.expr(
            "CAST(sum(CASE WHEN back = w THEN 1 ELSE 0 END) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("identity_types_ppm"),
        F.expr(
            "CAST(sum(CASE WHEN back = w THEN CAST(c AS DECIMAL(38,0))"
            " ELSE 0 END) * 1000000 div sum(c) AS BIGINT)"
        ).alias("identity_occ_ppm"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("n_sub"))
        .cast("long")
        .alias("subwords_explicit"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("n_sub_cf"))
        .cast("long")
        .alias("subwords_closed_form"),
    )


def bpe_roundtrip_sql(k: int = 20) -> str:
    return f"""
WITH merges AS MATERIALIZED (SELECT pair FROM ({bpe_merges_sql(k)})),
wc AS MATERIALIZED (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 1
  GROUP BY w
),
pos AS (
  SELECT w, i, substr(w, i, 2) AS pair
  FROM (SELECT w, unnest(range(1, length(w))) AS i
        FROM (SELECT w FROM wc WHERE length(w) >= 2))
),
member AS (SELECT w, i FROM pos JOIN merges USING (pair)),
isl AS MATERIALIZED (
  SELECT w, i, sum(brk) OVER (PARTITION BY w ORDER BY i) AS island
  FROM (
    SELECT w, i,
           CASE WHEN i - lag(i) OVER (PARTITION BY w ORDER BY i) > 1
                     OR lag(i) OVER (PARTITION BY w ORDER BY i) IS NULL
                THEN 1 ELSE 0 END AS brk
    FROM member
  )
),
mstart AS MATERIALIZED (
  SELECT w, i FROM (
    SELECT w, i,
           row_number() OVER (PARTITION BY w, island ORDER BY i) AS rn
    FROM isl
  ) WHERE rn % 2 = 1
),
cov AS (
  SELECT w, i + d AS cpos FROM mstart, (SELECT unnest([0, 1]) AS d)
),
chars AS (
  SELECT w, unnest(range(1, length(w) + 1)) AS cpos FROM wc
),
seg AS (
  SELECT ch.w, ch.cpos AS start, 1 AS slen
  FROM chars ch LEFT JOIN cov ON cov.w = ch.w AND cov.cpos = ch.cpos
  WHERE cov.w IS NULL
  UNION ALL
  SELECT w, i AS start, 2 AS slen FROM mstart
),
dec AS (
  SELECT w, string_agg(substr(w, start, slen), '' ORDER BY start) AS back,
         CAST(count(*) AS BIGINT) AS n_sub
  FROM seg GROUP BY w
),
cf AS (
  SELECT w, CAST(sum((L + 1) // 2) AS BIGINT) AS m
  FROM (SELECT w, island, count(*) AS L FROM isl GROUP BY w, island)
  GROUP BY w
),
per_w AS (
  SELECT wc.w, wc.c, dec.back, dec.n_sub,
         CAST(length(wc.w) - coalesce(cf.m, 0) AS BIGINT) AS n_sub_cf
  FROM wc JOIN dec ON dec.w = wc.w LEFT JOIN cf ON cf.w = wc.w
)
SELECT CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_occurrences,
       CAST(sum(CASE WHEN back = w THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS identity_types_ppm,
       CAST(sum(CASE WHEN back = w THEN CAST(c AS HUGEINT) ELSE 0 END)
            * 1000000 // sum(c) AS BIGINT) AS identity_occ_ppm,
       CAST(sum(CAST(c AS HUGEINT) * n_sub) AS BIGINT) AS subwords_explicit,
       CAST(sum(CAST(c AS HUGEINT) * n_sub_cf) AS BIGINT)
         AS subwords_closed_form
FROM per_w
"""
