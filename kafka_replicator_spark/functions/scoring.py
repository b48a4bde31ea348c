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

from kafka_replicator_spark.functions.hashing import spread
from kafka_replicator_spark.functions.text import tokens_col


def unigram_logprob(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Average unigram log-probability per document.

    ``score(d) = (1/|d|) * sum_t ln(c_t / T)`` where ``c_t`` is the corpus
    count of token ``t`` and ``T`` the total token count.  Lower (more
    negative) scores mark documents full of rare tokens — the unigram
    stand-in for high perplexity.  Emits the score and an integer surprise
    bucket (``floor(-score)``) that downstream filters can gate on.
    """
    toks = spread(docs.select(id_col, F.explode(tokens_col(text_col)).alias("tok")))
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
