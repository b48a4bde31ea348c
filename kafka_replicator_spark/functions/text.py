"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure column expressions (no UDFs — whole-stage codegen)
over a ``documents(doc_id, text, ...)``-shaped DataFrame, with DuckDB SQL
builders kept adjacent so the correctness oracle mirrors the exact same
arithmetic.  Tokenization is single-space split — the corpus is
space-normalized; swap ``TOKEN_SPLIT`` for a regex split for real text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import (
    portable_hash32,
    portable_hash32_sql,
    spread,
)

#: deterministic stopword list used by the quality score (both engines)
STOPWORDS = ("the", "a", "of", "and", "to", "in")

#: marker vocabularies for the n-gram-free language-ID heuristic; on real
#: text these would be per-language frequent words / character n-grams.
LANG_MARKERS = {
    "en": ("the", "fast", "order", "and"),
    "fr": ("le", "la", "et", "vite"),
    "es": ("el", "la", "y", "rapido"),
    "de": ("der", "die", "und", "schnell"),
    "zh": ("shi", "de", "kuai", "da"),
}


def tokens_col(text_col="text"):
    return F.split(F.col(text_col), " ")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: counts, distinct counts, average token
    length, lexical diversity — the length/ratio family of quality signals.
    """
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x)
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("lexical_diversity"),
    )


def text_stats_sql() -> str:
    return """
SELECT doc_id,
       CAST(length(text) AS INTEGER) AS n_chars,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
       round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS avg_token_len,
       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS lexical_diversity
FROM documents
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score: lexical diversity, stopword ratio, and a
    length prior — the shape of heuristic quality filters used to gate
    training data (each component is a ratio in [0,1]).
    """
    toks = tokens_col()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    diversity = F.size(F.array_distinct(toks)) / n
    stop_ratio = n_stop / n
    length_prior = F.least(F.length("text") / F.lit(400.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("lexical_diversity"),
        F.round(length_prior, 6).alias("length_prior"),
        F.round(
            (diversity * 0.4 + (F.lit(1.0) - stop_ratio) * 0.3 + length_prior * 0.3), 6
        ).alias("quality_score"),
    )


def quality_score_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN ({stop_list}))) AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct,
         least(length(text) / 400.0, 1.0) AS length_prior
  FROM t
)
SELECT doc_id,
       round(n_stop / n, 6) AS stopword_ratio,
       round(n_distinct / n, 6) AS lexical_diversity,
       round(length_prior, 6) AS length_prior,
       round(n_distinct / n * 0.4 + (1.0 - n_stop / n) * 0.3 + length_prior * 0.3, 6)
           AS quality_score
FROM c
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: score each language by marker-token hits,
    predict the argmax (ties broken by language code).  On this synthetic
    corpus it mostly predicts 'en' — the *operator contract* (deterministic
    scoring + argmax) is what the oracle checks.
    """
    toks = tokens_col()
    entries = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        entries.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    best = F.sort_array(F.array(*entries))[0]
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best["lang"].alias("predicted_lang"),
        (-best["neg"]).cast("long").alias("marker_hits"),
    )


def lang_id_sql() -> str:
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            f"SELECT doc_id, '{lang}' AS cand, "
            f"len(list_filter(string_split(text, ' '), x -> x IN ({lst}))) AS score "
            f"FROM documents"
        )
    union = " UNION ALL ".join(scores)
    return f"""
WITH scores AS ({union}),
ranked AS (
  SELECT doc_id, cand, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
  FROM scores
)
SELECT d.doc_id, d.lang AS labeled_lang, r.cand AS predicted_lang,
       CAST(r.score AS BIGINT) AS marker_hits
FROM ranked r JOIN documents d USING (doc_id) WHERE r.rn = 1
"""


#: char-shingle width of the document fingerprint
FP_WIDTH = 8


def fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint: portable 32-bit hash over every
    ``FP_WIDTH``-char shingle; keep the min-hash (winnowing's selection
    primitive) and the distinct-shingle count.  Content-defined, so any
    engine can recompute and match it.
    """
    idx = F.explode(F.sequence(F.lit(1), F.length("text") - (FP_WIDTH - 1))).alias("i")
    shingled = spread(docs).select("doc_id", F.col("text"), idx).select(
        "doc_id", portable_hash32(F.expr(f"substr(text, i, {FP_WIDTH})")).alias("h")
    )
    return shingled.groupBy("doc_id").agg(
        F.min("h").alias("min_fingerprint"),
        F.count_distinct("h").alias("n_distinct_shingles"),
    )


def fingerprint_sql() -> str:
    h = portable_hash32_sql(f"substr(text, CAST(i AS INTEGER), {FP_WIDTH})")
    return f"""
WITH sh AS (
  SELECT doc_id, {h} AS h
  FROM documents, unnest(range(1, length(text) - {FP_WIDTH - 2})) AS t(i)
)
SELECT doc_id, min(h) AS min_fingerprint,
       count(DISTINCT h) AS n_distinct_shingles
FROM sh GROUP BY doc_id
"""


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 50, stride: int = 25
) -> DataFrame:
    """Chunk documents into overlapping token windows — the training-window
    primitive of an LLM data pipeline (fixed ``chunk_tokens`` window,
    ``stride`` overlap, final partial window kept).

    Pure column math: chunk starts are a ``sequence`` (codegen), the window
    text a ``slice`` + ``concat_ws``; fans out ~n_tokens/stride rows per doc
    — `spread` upstream applies (see hashing.spread).
    """
    toks = tokens_col()
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)), F.lit(stride))
    exploded = docs.select(
        "doc_id", toks.alias("toks"), n.alias("n_tokens"), F.explode(starts).alias("start")
    ).filter((F.col("start") == 1) | (F.col("start") + chunk_tokens - 1 <= F.col("n_tokens") + stride))
    return exploded.select(
        "doc_id",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("toks", F.col("start"), F.lit(chunk_tokens))).alias("chunk_text"),
        F.least(F.col("n_tokens") - F.col("start") + 1, F.lit(chunk_tokens)).alias("chunk_len"),
    )


def chunk_documents_sql(chunk_tokens: int = 50, stride: int = 25) -> str:
    return f"""
SELECT doc_id,
       CAST((start - 1) // {stride} AS INTEGER) AS chunk_idx,
       array_to_string(toks[start:start + {chunk_tokens} - 1], ' ') AS chunk_text,
       CAST(least(n_tokens - start + 1, {chunk_tokens}) AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, toks, n_tokens, unnest(range(1, greatest(n_tokens - 1, 1) + 1, {stride})) AS start
  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens FROM documents)
)
WHERE start = 1 OR start + {chunk_tokens} - 1 <= n_tokens + {stride}
"""


# ---------------------------------------------------------- inverted index

def inverted_index(
    docs: DataFrame, max_postings: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus inverted index: per token the document frequency, collection
    frequency, and the first ``max_postings`` postings as a deterministic
    ``doc:tf`` string (ordered by doc id) — the retrieval-side primitive a
    training-data search/inspection tool builds on.

    Plan: one explode to the token frame, one shuffle to (token, doc)
    term frequencies, one shuffle to the per-token rollup.  Output rows
    are bounded by vocabulary size and postings are capped, so the result
    stays metadata-scale however large the corpus; collect_list here
    gathers at most the per-token DISTINCT doc list (bounded further by
    the postings slice after sorting — swap in a windowed top-k cut
    before the rollup if a token's doc list itself exceeds memory).
    """
    toks = F.split(F.col(text_col), " ")
    tok = (
        spread(docs)
        .select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "token"))
    )
    per_doc = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), (F.min("pos") + 1).alias("first_pos")
    )
    postings = F.concat_ws(
        ",",
        F.transform(
            F.slice(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                1,
                max_postings,
            ),
            lambda s: F.concat_ws(":", s["doc_id"].cast("string"), s["tf"].cast("string")),
        ),
    )
    return per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("tf").alias("cf"),
        postings.alias("postings"),
    )


def inverted_index_sql(max_postings: int = 8) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, t[i] AS token, i AS pos
  FROM (
    SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  )
),
per_doc AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf, min(pos) AS first_pos
  FROM tok GROUP BY token, doc_id
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df_docs,
       CAST(sum(tf) AS BIGINT) AS cf,
       array_to_string(
         (list(doc_id || ':' || tf ORDER BY doc_id, tf))[1:{max_postings}], ','
       ) AS postings
FROM per_doc GROUP BY token
"""
