"""Corpus language-model scoring for training-data quality filtering.

CCNet-style perplexity filtering scores each document under a language model
and gates on the score; the distributable core of that pipeline is a corpus
**unigram LM**: one aggregation builds the token→count vocabulary, one join
scores every token occurrence, one aggregation folds per-document averages.
The reference engine has no analog (it moves bytes, not tokens) — this is
part of the LLM-pipeline surface built on the same documents table as the
dedup family (functions/dedup.py).

Cross-engine determinism: per-token ``ln(count)`` is rounded to 9 dp and
summed as DECIMAL(28,9) — an order-independent exact integer sum — so the
Spark and DuckDB folds cannot diverge in the low bits regardless of
aggregation order.  Only the final per-document division happens in DOUBLE,
rounded to 6 dp (the registry-wide float convention).

Scale: the token explode is shuffle-joined against the vocabulary on the
token key (tens of millions of rows at 100 TB — too big to broadcast, fine
to hash-join; AQE handles the stopword-skew on the probe side because the
vocab side of a hot key is a single row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached

from kafka_replicator_spark.functions.hashing import spread, spread_by_key
from kafka_replicator_spark.functions.text import tokens_col


def unigram_logprob(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Average unigram log-probability per document.

    ``score(d) = (1/|d|) * sum_t ln(c_t / T)`` where ``c_t`` is the corpus
    count of token ``t`` and ``T`` the total token count.  Lower (more
    negative) scores mark documents full of rare tokens — the unigram
    stand-in for high perplexity.  Emits the score and an integer surprise
    bucket (``floor(-score)``) that downstream filters can gate on.
    """
    from kafka_replicator_spark.cacheutil import track_cached

    # the token stream feeds three plan branches (vocab agg, total agg,
    # scoring join) — cache so the explode runs once
    toks = track_cached(
        spread(docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok")))
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # t_total == Σ vocab.c == |toks| — count the token stream directly so the
    # plan doesn't rebuild the whole vocabulary aggregation (tok-keyed
    # shuffle included) a second time just to sum it.
    total = toks.agg(F.count(F.lit(1)).alias("t_total"))  # 1-row frame, broadcast below
    per_tok = toks.join(vocab, "tok").select(
        id_col,
        # order-independent fold: round ln(c) to 9 dp, sum exactly in DECIMAL
        F.round(F.log(F.col("c").cast("double")), 9).cast("decimal(18,9)").alias("lc"),
    )
    per_doc = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lc").alias("s"),
    )
    scored = per_doc.join(F.broadcast(total)).select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round(
            F.col("s").cast("double") / F.col("n_tokens")
            - F.log(F.col("t_total").cast("double")),
            6,
        ).alias("avg_logprob"),
    )
    return scored.withColumn(
        "surprise_bucket", F.floor(-F.col("avg_logprob")).cast("int")
    )


def unigram_logprob_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), total AS (
  SELECT sum(c) AS t_total FROM vocab
), per_tok AS (
  SELECT doc_id, CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lc
  FROM toks JOIN vocab USING (tok)
), per_doc AS (
  SELECT doc_id, count(*) AS n_tokens, sum(lc) AS s FROM per_tok GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       round(CAST(s AS DOUBLE) / n_tokens - ln(CAST(t_total AS DOUBLE)), 6)
           AS avg_logprob,
       CAST(floor(-round(CAST(s AS DOUBLE) / n_tokens - ln(CAST(t_total AS DOUBLE)), 6))
            AS INTEGER) AS surprise_bucket
FROM per_doc, total
"""


def bigram_logprob(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Average add-one-smoothed bigram log-probability per document — the
    next LM tier above :func:`unigram_logprob` (CCNet's KenLM slot, reduced
    to the distributable count model):

    ``score(d) = (1/B_d) * Σ_(w1,w2)∈d ln((c(w1 w2) + 1) / (ctx(w1) + V))``

    where ``c`` is the corpus bigram count, ``ctx(w1)`` the corpus count of
    ``w1`` as a bigram context, and ``V`` the context vocabulary size.

    Plan: one doc-keyed explode builds the (doc, w1, w2, c_in_doc) stream
    (pre-aggregated per doc so the stats join touches distinct bigrams per
    doc, not occurrences); corpus bigram counts and context counts join on
    their natural keys; V broadcasts as a one-row frame.  Per-distinct-term
    logs round to 9 dp and fold exactly in DECIMAL weighted by the in-doc
    count, so aggregation order cannot move the result.
    """
    pre = spread_by_key(
        docs.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")),
        "doc_id",
    )
    grams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.slice("toks", 1, F.size("toks") - 1),
            lambda x, i: F.struct(
                x.alias("w1"), F.element_at("toks", i + 2).alias("w2")
            ),
        ),
    ).otherwise(F.lit(None).cast("array<struct<w1:string,w2:string>>"))
    bg = pre.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )
    # doc_bg feeds three plan branches (corpus counts, context counts via
    # them, and the scoring join) — cache so the explode runs once
    doc_bg = track_cached(bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("dc")))
    bg_counts = doc_bg.groupBy("w1", "w2").agg(F.sum("dc").alias("c12"))
    ctx_counts = bg_counts.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_follow")
    )
    vocab = ctx_counts.agg(F.count(F.lit(1)).alias("v"))  # 1 row, broadcast
    term = F.round(
        F.log(
            (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    per_doc = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(ctx_counts.select("w1", "c1"), "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("dc").alias("nb"),
            F.sum(F.col("dc").cast("decimal(10,0)") * term).alias("s"),
        )
    )
    scored = per_doc.select(
        "doc_id",
        F.col("nb").cast("long").alias("n_bigrams"),
        F.round(F.col("s").cast("double") / F.col("nb"), 6).alias("avg_logprob"),
    )
    return scored.withColumn(
        "surprise_bucket", F.floor(-F.col("avg_logprob")).cast("int")
    )


def bigram_logprob_sql() -> str:
    return """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks), 1)),
                               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS g
  FROM t
), doc_bg AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, count(*) AS dc FROM bg GROUP BY 1, 2, 3
), bg_counts AS (
  SELECT w1, w2, sum(dc) AS c12 FROM doc_bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, sum(c12) AS c1 FROM bg_counts GROUP BY w1
), vocab AS (
  SELECT count(*) AS v FROM ctx
), per_doc AS (
  SELECT doc_id,
         sum(dc) AS nb,
         sum(CAST(dc AS DECIMAL(10,0))
             * CAST(round(ln((c12 + 1) / CAST(c1 + v AS DOUBLE)), 9) AS DECIMAL(18,9)))
             AS s
  FROM doc_bg
  JOIN bg_counts USING (w1, w2)
  JOIN ctx USING (w1)
  CROSS JOIN vocab
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(nb AS BIGINT) AS n_bigrams,
       round(CAST(s AS DOUBLE) / nb, 6) AS avg_logprob,
       CAST(floor(-round(CAST(s AS DOUBLE) / nb, 6)) AS INTEGER) AS surprise_bucket
FROM per_doc
"""


def quality_classifier(
    docs: DataFrame,
    n_buckets: int = 1 << 20,
    threshold_milli: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-bag-of-words linear quality classifier — the "apply a trained
    fastText/logreg filter at scale" slot of modern curation pipelines
    (DCLM / FineWeb-Edu style classifier gating), with a deterministic
    stand-in model so the scoring path is exactly testable: the weight of
    hash bucket ``b`` is ``(b % 2001) - 1000`` milli-units (a real
    deployment broadcasts a learned weight table instead; the plan is
    identical — hash, lookup/derive, weighted sum).

    Scoring is EXACT integer arithmetic end to end: per-token weights are
    integer milli-units, the document score is their sum, and the mean is
    the only division (DOUBLE, rounded to 6 dp).  ``keep`` gates on the
    mean exceeding ``threshold_milli``.

    One doc-keyed exchange (spread_by_key), explode, one aggregation — the
    same single-shuffle shape as doc_entropy; the hashed projection means
    no vocabulary table, no join, O(1) memory per executor.
    """
    from kafka_replicator_spark.functions.hashing import portable_hash60

    toks = spread_by_key(
        docs.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")),
        "doc_id",
    ).select("doc_id", F.explode("toks").alias("tok"))
    w_milli = (portable_hash60(F.col("tok")) % F.lit(n_buckets)) % F.lit(2001) - F.lit(1000)
    per_doc = toks.select("doc_id", w_milli.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("s").cast("long").alias("score_milli"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_milli"),
        (F.col("s") > F.col("n") * F.lit(threshold_milli)).cast("int").alias("keep"),
    )


def quality_classifier_sql(n_buckets: int = 1 << 20, threshold_milli: int = 0) -> str:
    from kafka_replicator_spark.functions.hashing import portable_hash60_sql

    h = portable_hash60_sql("tok")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), weighted AS (
  SELECT doc_id, (({h} % {n_buckets}) % 2001) - 1000 AS w FROM toks
), per_doc AS (
  SELECT doc_id, count(*) AS n, sum(w) AS s FROM weighted GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(s AS BIGINT) AS score_milli,
       round(CAST(s AS DOUBLE) / n, 6) AS mean_milli,
       CAST(s > n * {threshold_milli} AS INTEGER) AS keep
FROM per_doc
"""


# ------------------------------------------- conditional bigram entropy

def cond_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus conditional bigram entropy H(next | prev) in nats — the
    information-rate summary of the token stream (low = templated or
    repetitive corpus, high = diverse):

        H = -(1/N) * sum_ab c(a,b) * ln( c(a,b) / c_left(a) )

    where ``c_left(a)`` counts ``a`` as a bigram left context and N is the
    bigram total.  Two aggregations over the bigram stream (pair counts,
    then left-marginals FROM the pair counts — the second shuffle moves
    vocabulary-sized rows, not the stream) + one join; per-pair terms are
    rounded to 9 dp and summed as DECIMAL — order-independent,
    bit-identical on any engine.  Tokens never contain spaces (the corpus
    tokenizer splits on them), so "a b" keys are unambiguous.
    """
    toks = F.col("__toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = spread(
        docs.select(F.split(F.col(text_col), " ").alias("__toks"))
    ).select(F.explode(pairs).alias("ab"))
    from kafka_replicator_spark.cacheutil import track_cached

    pair_counts = bg.groupBy("ab").agg(F.count(F.lit(1)).alias("c_ab"))
    # the vocabulary-sized pair-count frame feeds the marginal aggregation
    # AND the scoring join — cache so the bigram explode runs once
    with_a = track_cached(pair_counts.withColumn("a", F.substring_index("ab", " ", 1)))
    lefts = with_a.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    joined = with_a.join(lefts, "a")
    terms = joined.select(
        "c_ab",
        F.round(
            F.col("c_ab").cast("double")
            * F.log(F.col("c_ab").cast("double") / F.col("c_a").cast("double")),
            9,
        )
        .cast("decimal(28,9)")
        .alias("term"),
    )
    return terms.agg(
        F.sum("c_ab").cast("long").alias("n_bigrams"),
        F.round(
            -F.sum("term").cast("double") / F.sum("c_ab").cast("double"), 6
        ).alias("cond_entropy_nats"),
    )


def cond_entropy_sql() -> str:
    return """
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT toks[i] || ' ' || toks[i+1] AS ab
  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t WHERE len(toks) >= 2)
), pc AS (
  SELECT ab, count(*) AS c_ab FROM bg GROUP BY ab
), wa AS (
  SELECT ab, c_ab, string_split(ab, ' ')[1] AS a FROM pc
), lefts AS (
  SELECT a, sum(c_ab) AS c_a FROM wa GROUP BY a
), terms AS (
  SELECT c_ab,
         CAST(round(CAST(c_ab AS DOUBLE)
                    * ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS term
  FROM wa JOIN lefts USING (a)
)
SELECT CAST(sum(c_ab) AS BIGINT) AS n_bigrams,
       round(-CAST(sum(term) AS DOUBLE) / CAST(sum(c_ab) AS BIGINT), 6)
           AS cond_entropy_nats
FROM terms
"""
