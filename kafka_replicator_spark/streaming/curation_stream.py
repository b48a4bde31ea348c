"""Streaming corpus intake: the curation pipeline (exact dedup → quality
gate → PII scrub) as a Structured Streaming flow.

The batch curation operators (functions/curation.py) are pure column
expressions, so they lift onto a stream unchanged; the one genuinely
stateful stage is deduplication, which uses
``dropDuplicatesWithinWatermark`` on the content hash — the state store
holds only hashes inside the watermark window, so state is bounded by
intake rate × watermark, not corpus size.  (Cross-window duplicates are the
batch dedup family's job downstream; this stage exists to stop the
firehose's burst duplicates from ever landing.)

The batch run of the same composition is the oracle: on a complete, in-order
input the streaming result must equal the batch result (see
tests/test_curation_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.curation import gopher_quality, pii_scrub


def curate_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    event_time_col: str = "event_time",
) -> DataFrame:
    """Dedup-gate-scrub a document stream.

    Input: a (streaming or batch) frame with ``doc_id, text, lang, source``
    and an ``event_time`` timestamp.  Output: one row per surviving
    document — deduped on exact content within the watermark, passing the
    Gopher-style quality rules, with PII detection counts and the redacted
    text's md5.

    On a batch frame the same composition runs with plain
    ``dropDuplicates`` (no watermark) — that run is the streaming oracle.
    """
    hashed = docs.withColumn("content_hash", F.md5("text"))
    if hashed.isStreaming:
        deduped = hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    else:
        # batch oracle: arbitrary winner would be nondeterministic, so pick
        # the min-id row per content (first-arrival stand-in)
        from pyspark.sql.window import Window

        w = Window.partitionBy("content_hash").orderBy("doc_id")
        deduped = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    gated = gopher_quality(deduped, keep=(event_time_col, "text", "content_hash")).filter(
        F.col("passes") == 1
    )
    return pii_scrub(
        gated, keep=(event_time_col, "content_hash", "word_count")
    )
