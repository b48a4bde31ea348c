"""Lexical-statistics operators: Kneser-Ney bigram LM, term burstiness,
tokenizer fertility, RAKE keyword extraction.

The LM tier above functions/scoring.py's add-one bigram model (Kneser-Ney is
the KenLM smoothing a CCNet-style quality filter actually ships), plus the
lexical diagnostics (burstiness, fertility) and keyword extraction a corpus
curation pass publishes.  No reference-engine analog (segment-grain only) —
LLM-pipeline surface on the documents table.

Cross-engine determinism: every score that leaves the module is an exact
integer (ppm/milli units via integer ``div``) computed from exact counts —
no float folds anywhere, so the DuckDB oracle hashes bit-identically.

Scale notes: all operators collapse the token stream to count grain
(bigram / term / phrase-word) before any join; windows only see per-doc or
top-k-sized frames.  Numerators that multiply two corpus-scale counts are
lifted to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) BEFORE the ×1e6 ppm
factor — int64 would wrap silently (non-ANSI Spark) once the count product
passes ~2·10^12; the decimal path is exact to 10^38.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import spread, spread_by_key
from kafka_replicator_spark.functions.text import STOPWORDS, tokens_col

#: Kneser-Ney absolute discount, in quarters (3/4 == the canonical 0.75) so
#: the probability is a ratio of exact integers
KN_DISCOUNT_QUARTERS = 3
#: bigrams reported by kneser_ney_bigram
KN_TOP_K = 50


def _bigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus bigram-type counts (w1, w2, c) — one explode + one shuffle.

    The single-token guard matters: Spark's ``sequence(1, 0)`` yields the
    DESCENDING ``[1, 0]``, not an empty array (CLAUDE.md gotcha).
    """
    pre = spread(docs.select(F.split(F.col(text_col), " ").alias("toks")))
    pairs = pre.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(1, size(toks) - 1),"
                "   i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                " ELSE array() END"
            )
        ).alias("bg")
    )
    return pairs.select("bg.w1", "bg.w2").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )


def kneser_ney_bigram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Kneser-Ney-smoothed bigram probabilities for the top-k corpus bigrams.

    ``P(w2|w1) = max(c12 - d, 0)/c1 + d·N1+(w1,·)/c1 · N1+(·,w2)/N1+(·,·)``
    with d = 3/4.  Every statistic derives from ONE bigram-type count frame
    (context totals, forward/backward continuation counts, total bigram
    types), so the plan is one token-pair shuffle plus three count-grain
    aggregations; the probability is an exact integer ppm over the common
    denominator ``4·c1·N_types``.

    Top-k selection is a distributed TakeOrdered (never a global window)
    with a full (c desc, w1, w2) tie-break.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    bg = track_cached(_bigram_counts(docs, text_col))
    ctx = bg.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1fw")
    )
    bw = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bw"))
    n_types = bg.agg(F.count(F.lit(1)).alias("n_types"))
    top = bg.orderBy(F.col("c").desc(), "w1", "w2").limit(KN_TOP_K)
    d = KN_DISCOUNT_QUARTERS
    # the k-row side broadcasts at every stage; the vocab-scale stats
    # frames stream past it without shuffling
    with_ctx = ctx.join(F.broadcast(top), "w1")
    return (
        bw.join(F.broadcast(with_ctx), "w2")
        .join(F.broadcast(n_types))
        .select(
            "w1",
            "w2",
            F.col("c").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            F.col("n1fw").cast("long").alias("n1fw"),
            F.col("n1bw").cast("long").alias("n1bw"),
            # the ppm numerator is lifted to DECIMAL(38,0) BEFORE any
            # multiply (the ×1e6 factor would overflow int64 once
            # c·n_types ≳ 2e12); `div` on decimals is exact and returns
            # long, matching DuckDB HUGEINT `//` bit-for-bit
            F.expr(
                f"(CAST(1000000 AS DECIMAL(38,0)) * (4 * c - {d}) * n_types"
                f" + CAST(1000000 AS DECIMAL(38,0)) * {d} * n1fw * n1bw)"
                " div (CAST(4 AS DECIMAL(38,0)) * c1 * n_types)"
            ).alias("prob_ppm"),
        )
    )


def kneser_ney_bigram_sql() -> str:
    d = KN_DISCOUNT_QUARTERS
    return f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
pairs AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)
),
bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY w1, w2),
ctx AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1fw
  FROM bg GROUP BY w1
),
bw AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1bw FROM bg GROUP BY w2),
n_types AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg),
top AS (SELECT * FROM bg ORDER BY c DESC, w1, w2 LIMIT {KN_TOP_K})
SELECT top.w1, top.w2, top.c AS c12, ctx.c1, ctx.n1fw, bw.n1bw,
       CAST((1000000::HUGEINT * (4 * top.c - {d}) * n_types.n_types
             + 1000000::HUGEINT * {d} * ctx.n1fw * bw.n1bw)
         // (4::HUGEINT * ctx.c1 * n_types.n_types) AS BIGINT) AS prob_ppm
FROM top JOIN ctx USING (w1) JOIN bw USING (w2) CROSS JOIN n_types
"""


#: terms reported by term_burstiness
BURST_TOP_K = 20


def term_burstiness(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fano-factor burstiness (variance-to-mean ratio of per-document counts,
    zeros included) for the top-k corpus terms.

    A term with VMR ≈ 1 is Poisson-spread (function word); VMR ≫ 1 marks
    topical/bursty terms — the classic content-word signal (Church &
    Gale).  Exact: with S = Σ n_d, S2 = Σ n_d², over N docs,
    ``vmr_ppm = 1e6·(N·S2 − S²) / (N·S)`` in integer arithmetic.

    Plan: one doc-keyed explode pre-aggregates (term, doc) counts, one
    term-grain aggregation folds S/S2/df; N broadcasts as a 1-row frame.
    """
    per_doc = (
        spread(docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("tok")))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = per_doc.groupBy("tok").agg(
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("df"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    top = stats.orderBy(F.col("s").desc(), "tok").limit(BURST_TOP_K)
    return top.join(F.broadcast(n_docs)).select(
        "tok",
        F.col("s").cast("long").alias("total_count"),
        F.col("df").cast("long").alias("doc_freq"),
        F.expr("(1000000 * (n_docs * s2 - s * s)) div (n_docs * s)").alias(
            "vmr_ppm"
        ),
    )


def term_burstiness_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
per_doc AS (SELECT tok, doc_id, count(*) AS n FROM toks GROUP BY tok, doc_id),
stats AS (
  SELECT tok, CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS df
  FROM per_doc GROUP BY tok
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (SELECT * FROM stats ORDER BY s DESC, tok LIMIT {BURST_TOP_K})
SELECT tok, s AS total_count, df AS doc_freq,
       (1000000 * (n_docs * s2 - s * s)) // (n_docs * s) AS vmr_ppm
FROM top CROSS JOIN nd
"""


def token_fertility(docs: DataFrame) -> DataFrame:
    """Tokenizer-fertility dashboard per (source, lang): characters per
    token in exact milli-units plus volume counts — the compression-ratio
    check a tokenizer change ships with.  One aggregation, (source × lang)
    output rows.
    """
    per = docs.select(
        "source",
        "lang",
        F.col("n_chars").alias("nc"),
        F.size(tokens_col("text")).cast("long").alias("nt"),
    )
    return per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").alias("sum_chars"),
        F.sum("nt").alias("sum_tokens"),
        F.expr("(1000 * sum(nc)) div sum(nt)").alias("chars_per_token_milli"),
    )


def token_fertility_sql() -> str:
    return """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST((1000 * sum(n_chars)) // sum(len(string_split(text, ' '))) AS BIGINT)
         AS chars_per_token_milli
FROM documents GROUP BY source, lang
"""


#: phrases reported by rake_keywords
RAKE_TOP_K = 20


def rake_keywords(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): phrases are maximal
    stopword-free token runs; each word scores ``degree/frequency`` (degree
    = Σ phrase length over its occurrences), a phrase scores the sum of its
    member word scores; the top-k distinct phrases are reported.

    Exactness: word scores quantize to integer ppm BEFORE the phrase sum,
    so the fold is integer addition (order-free).  Plan: positional explode
    with a per-doc prefix-sum window assigns phrase ids (doc-sized
    partitions), then everything is count-grain aggregation; top-k is a
    distributed TakeOrdered with a full tie-break.
    """
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = spread_by_key(
        docs.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")),
        "doc_id",
    ).select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    marked = toks.withColumn(
        "is_stop", F.array_contains(stop_arr, F.col("tok")).cast("int")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phrased = marked.withColumn("phrase_id", F.sum("is_stop").over(w)).where(
        F.col("is_stop") == 0
    )
    # phrase instances: (doc, phrase_id) -> ordered word list
    phrases = phrased.groupBy("doc_id", "phrase_id").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "tok"))
        ).alias("ptoks")
    ).select(
        F.expr("array_join(transform(ptoks, x -> x.tok), ' ')").alias("phrase"),
        F.size("ptoks").alias("plen"),
        F.expr("transform(ptoks, x -> x.tok)").alias("words"),
    )
    from kafka_replicator_spark.cacheutil import track_cached

    phrases = track_cached(phrases)
    # word grain: freq = occurrences across phrases, degree = Σ phrase length
    occ = phrases.select(F.explode("words").alias("tok"), "plen")
    word_scores = occ.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    ).select(
        "tok", F.expr("(1000000 * degree) div freq").alias("word_ppm")
    )
    # phrase grain: sum member word scores (with multiplicity), count copies
    member = phrases.select("phrase", F.explode("words").alias("tok"))
    phrase_scores = (
        member.join(word_scores, "tok")
        .groupBy("phrase")
        .agg(F.sum("word_ppm").alias("score_sum"))
    )
    counts = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.first("plen").alias("plen"),
    )
    joined = phrase_scores.join(counts, "phrase").select(
        "phrase",
        F.col("plen").cast("long").alias("n_words"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        # score_sum counts every occurrence of the phrase — normalize to one
        F.expr("score_sum div n_occurrences").alias("score_ppm"),
    )
    return joined.orderBy(F.col("score_ppm").desc(), "phrase").limit(RAKE_TOP_K)


def rake_keywords_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
marked AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END AS is_stop
  FROM toks
),
numbered AS (
  -- phrase ids must be assigned BEFORE dropping stop tokens (WHERE runs
  -- before window functions, which would collapse each doc to one phrase)
  SELECT doc_id, pos, tok, is_stop,
         sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS phrase_id
  FROM marked
),
phrased AS (
  SELECT doc_id, pos, tok, phrase_id FROM numbered WHERE is_stop = 0
),
phrases AS (
  SELECT string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen,
         list(tok ORDER BY pos) AS words
  FROM phrased GROUP BY doc_id, phrase_id
),
occ AS (SELECT unnest(words) AS tok, plen FROM phrases),
word_scores AS (
  SELECT tok,
         (1000000 * CAST(sum(plen) AS BIGINT)) // CAST(count(*) AS BIGINT)
           AS word_ppm
  FROM occ GROUP BY tok
),
member AS (SELECT phrase, unnest(words) AS tok FROM phrases),
phrase_scores AS (
  SELECT phrase, CAST(sum(word_ppm) AS BIGINT) AS score_sum
  FROM member JOIN word_scores USING (tok) GROUP BY phrase
),
counts AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(min(plen) AS BIGINT) AS plen
  FROM phrases GROUP BY phrase
)
SELECT phrase, counts.plen AS n_words, counts.n_occurrences,
       phrase_scores.score_sum // counts.n_occurrences AS score_ppm
FROM phrase_scores JOIN counts USING (phrase)
ORDER BY score_ppm DESC, phrase LIMIT {RAKE_TOP_K}
"""
