"""Python UDTF surface — the table-function extension point.

The reference engine has no user extension surface at all beyond pluggable
storage formats (SURVEY.md §2.10; core.go:84-87), so this module is pure
Spark-native headroom: a lateral table function turns one document row into
one row per token, the 1→N shape that column expressions cannot return as
rows without an explode round-trip through an array.

The UDTF is the *surface demo*, not the hot path — tokenization in the
scoring/dedup operators stays in column space (``functions/text.tokens_col``,
whole-stage codegen).  Real uses of this surface are per-row decoders that
genuinely need Python (the multimodal stubs in functions/multimodal.py are
the batch-UDF flavor of the same boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from kafka_replicator_spark.functions.text import STOPWORDS

TOKENIZE_SCHEMA = "tok_idx: int, token: string, tok_len: int, is_stop: int"


@udtf(returnType=TOKENIZE_SCHEMA)
class TokenizeUDTF:
    """One output row per whitespace token: position (1-based), the token,
    its length, and a stopword flag (the same stopword list the quality
    scorer uses)."""

    def eval(self, text: str):  # noqa: D401 — UDTF contract
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i + 1, tok, len(tok), 1 if tok in STOPWORDS else 0


def tokenize_lateral(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """LATERAL-join the tokenizer UDTF against a documents frame."""
    # Arrow-batch the Python boundary when available (falls back silently to
    # pickled rows on older runtimes) — same policy as the pandas-UDF ops.
    try:
        spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    except Exception:
        pass
    spark.udtf.register("krs_tokenize", TokenizeUDTF)
    docs.select("doc_id", "text").createOrReplaceTempView("_krs_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok_idx, t.token, t.tok_len, t.is_stop
        FROM _krs_udtf_docs d, LATERAL krs_tokenize(d.text) t
        """
    )


def tokenize_lateral_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS tok_idx,
       toks[i] AS token,
       CAST(length(toks[i]) AS INTEGER) AS tok_len,
       CAST(CASE WHEN toks[i] IN ({stop_list}) THEN 1 ELSE 0 END AS INTEGER) AS is_stop
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r
"""
