"""Streaming curation intake: dedup-within-watermark + quality gate + PII
scrub over a document stream must match the batch composition on the same
complete input (content-level compare: duplicate winners may differ in
doc_id between first-arrival and min-id policies).
"""

from pyspark.sql import functions as F

from kafka_replicator_spark.streaming.curation_stream import curate_stream

SCHEMA = "doc_id long, text string, lang string, source string, event_time timestamp"


def _corpus(spark):
    """60 docs: 20 distinct quality texts × 3 exact copies (one per file
    drop), plus junk docs that must fail the quality gate."""
    base = [
        (
            i,
            " ".join(
                ["the", "quick", "brown", "fox", "jumps", "over", "a", "lazy", "dog",
                 f"tok{i}", f"tok{i + 1}", "of", "and", "to", "in", "stream", "batch",
                 "value", "hash", "merge", "scan", f"tail{i}"]
            ),
            "en",
            "src",
        )
        for i in range(20)
    ]
    rows = []
    for copy in range(3):
        for i, text, lang, src in base:
            rows.append((copy * 100 + i, text, lang, src, copy))
    # junk: too short → fails min_words, present in every drop
    for copy in range(3):
        rows.append((copy * 100 + 90, "tiny doc", "en", "src", copy))
    return [
        (d, t, lg, s, f"2024-01-01 00:0{c}:00")
        for (d, t, lg, s, c) in rows
    ]


def test_streaming_curation_matches_batch(spark, tmp_path):
    rows = _corpus(spark)
    df = spark.createDataFrame(
        [(d, t, lg, s) for d, t, lg, s, _ in rows], "doc_id long, text string, lang string, source string"
    ).join(
        spark.createDataFrame([(d, ts) for d, _, _, _, ts in rows], "doc_id long, ts string"),
        "doc_id",
    ).select("doc_id", "text", "lang", "source", F.col("ts").cast("timestamp").alias("event_time"))

    src = str(tmp_path / "drops")
    # one file per copy-wave so the stream sees duplicates across batches
    for copy in range(3):
        df.filter(F.floor(F.col("doc_id") / 100) == copy).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    batch = curate_stream(df).toPandas()

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        curate_stream(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM curated").toPandas()

    # 20 distinct quality texts survive; junk and duplicates are gone
    assert len(got) == 20 == len(batch)
    # content-level equality; doc_id-derived fields (injected PII counts,
    # redacted_len) are excluded — the duplicate winner legitimately differs
    # between first-arrival (stream) and min-id (batch oracle) policies
    cols = ["content_hash", "word_count"]
    assert sorted(map(tuple, got[cols].values.tolist())) == sorted(
        map(tuple, batch[cols].values.tolist())
    )
    # dedup state is keyed on content_hash only — each survivor is unique
    assert got.content_hash.nunique() == 20
