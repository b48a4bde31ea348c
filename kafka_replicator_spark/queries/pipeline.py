"""Training-data-pipeline queries (the beyond-parity operator families the
engine is graded on): dedup, similarity search, text analysis, multimodal.

Thresholds/parameters are chosen to produce non-trivial result sets on the
sf0.01 corpus while keeping the oracle runnable; the operators themselves
scale by construction (see functions/ docstrings for the 100 TB story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_replicator_spark.functions import dedup, multimodal, similarity, text
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# ------------------------------------------------------------------ dedup

@register(
    "p_dedup_exact",
    dedup.exact_duplicates_sql(),
    tags=("pipeline", "dedup"),
    doc="exact dedup: content-hash groupBy with canonical survivor",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_docs(spark, sf_dir))


@register(
    "p_dedup_jaccard",
    dedup.jaccard_pairs_sql(n=3, threshold=0.2),
    tags=("pipeline", "dedup"),
    doc="n-gram Jaccard near-dup pairs via shingle-hash self-join",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


@register(
    "p_minhash_signatures",
    dedup.minhash_signatures_sql(k=16, n=3),
    tags=("pipeline", "dedup"),
    doc="MinHash signatures (k=16) over word 3-gram shingles",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(_docs(spark, sf_dir), k=16, n=3)


@register(
    "p_lsh_candidate_pairs",
    dedup.lsh_candidate_pairs_sql(k=16, n=3, bands=4),
    tags=("pipeline", "dedup"),
    doc="MinHash-LSH banded candidate pairs (4 bands x 4 rows)",
)
def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(_docs(spark, sf_dir), k=16, n=3, bands=4)


@register(
    "p_simhash",
    dedup.simhash_sql(),
    tags=("pipeline", "dedup"),
    doc="32-bit SimHash fingerprints (token-frequency weighted)",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


@register(
    "p_simhash_near_pairs",
    dedup.simhash_near_pairs_sql(max_hamming=6),
    tags=("pipeline", "dedup"),
    doc="SimHash near-dup pairs: byte-banded candidates + hamming verify",
)
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=6)


# ------------------------------------------------------------- similarity

@register(
    "p_cosine_topk",
    similarity.brute_force_topk_sql(PROBES, k=5),
    tags=("pipeline", "similarity"),
    doc="brute-force cosine top-5 neighbors for 8 probe vectors",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(_emb(spark, sf_dir), PROBES, k=5)


@register(
    "p_lsh_buckets",
    similarity.lsh_buckets_sql(n_planes=8, dim=64),
    tags=("pipeline", "similarity"),
    doc="sign-LSH bucket assignment (8 hyperplanes)",
)
def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_buckets(_emb(spark, sf_dir), n_planes=8, dim=64)


@register(
    "p_ann_topk",
    similarity.ann_topk_sql(PROBES, k=5, n_planes=4, dim=64),
    tags=("pipeline", "similarity"),
    doc="approximate top-5: cosine ranking within the probe's LSH bucket",
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ann_topk(_emb(spark, sf_dir), PROBES, k=5, n_planes=4, dim=64)


@register(
    "p_embedding_neardup",
    similarity.embedding_neardup_pairs_sql(threshold=0.35, n_planes=4, dim=64),
    tags=("pipeline", "similarity", "dedup"),
    doc="embedding-cosine near-dup pairs, LSH-bucketed.  Threshold 0.35 sits "
    "inside the fixture's similarity distribution (max pairwise cos ≈ 0.51 "
    "at sf0.01) so the gate checks ~55 real pairs, not an empty result.",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold=0.35, n_planes=4, dim=64
    )


# ------------------------------------------------------------------- text

@register(
    "p_text_stats",
    text.text_stats_sql(),
    tags=("pipeline", "text"),
    doc="per-document token statistics",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_docs(spark, sf_dir))


@register(
    "p_text_quality",
    text.quality_score_sql(),
    tags=("pipeline", "text"),
    doc="composite quality score (diversity / stopword / length-prior)",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_docs(spark, sf_dir))


@register(
    "p_lang_id",
    text.lang_id_sql(),
    tags=("pipeline", "text"),
    doc="marker-word language identification with deterministic argmax",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_docs(spark, sf_dir))


@register(
    "p_fingerprint",
    text.fingerprint_sql(),
    tags=("pipeline", "text"),
    doc="rolling-hash document fingerprint (min-hash + distinct shingles)",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_docs(spark, sf_dir))


# ------------------------------------------------------------- multimodal

@register(
    "p_media_meta",
    multimodal.media_meta_oracle_sql(),
    tags=("pipeline", "multimodal"),
    doc="multimodal metadata extraction over binary payloads (mapInPandas; "
    "decode stubbed, plumbing real)",
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.extract_media_meta(multimodal.synthesize_media(_docs(spark, sf_dir)))



# ------------------------------------------------------ composed pipeline

@register(
    "p_cleaning_pipeline",
    f"""
WITH stats AS ({text.quality_score_sql().strip()}),
dedup AS (
  SELECT min(doc_id) AS canonical_id FROM documents GROUP BY md5(text)
),
kept AS (
  SELECT d.doc_id, d.source, s.quality_score
  FROM documents d
  JOIN stats s USING (doc_id)
  JOIN dedup ON dedup.canonical_id = d.doc_id
  WHERE s.quality_score >= 0.5
)
SELECT source, count(*) AS n_kept,
       round(min(quality_score), 6) AS min_q, round(max(quality_score), 6) AS max_q
FROM kept GROUP BY source
""",
    tags=("pipeline", "composed"),
    doc="composed cleaning pipeline: quality filter -> exact-dedup survivors "
    "-> per-source keep counts (the operator-composition path a real "
    "training-data pipeline runs)",
)
def q_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    quality = text.quality_score(docs)
    survivors = dedup.exact_duplicates(docs).select(
        F.col("canonical_id").alias("doc_id")
    )
    kept = (
        docs.join(quality, "doc_id")
        .join(survivors, "doc_id", "left_semi")
        .filter(F.col("quality_score") >= 0.5)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.min("quality_score"), 6).alias("min_q"),
        F.round(F.max("quality_score"), 6).alias("max_q"),
    )


# ------------------------------------------------------------ top n-grams

@register(
    "p_top_ngrams",
    f"""
WITH sh AS ({dedup.word_ngrams_sql(2).strip()}),
counts AS (
  SELECT shingle, count(*) AS n_docs FROM sh GROUP BY shingle
)
SELECT shingle, n_docs
FROM (
  SELECT shingle, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, shingle ASC) AS rn
  FROM counts
) WHERE rn <= 20
""",
    tags=("pipeline", "text"),
    doc="corpus-level top-k n-gram document frequencies (vocabulary / "
    "boilerplate detection input)",
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-k cut is a distributed TakeOrdered (orderBy().limit(k)) — never a
    # single-partition row_number over the full vocabulary-scale frame (the
    # guarded small-side rank pattern, cf. textprof.zipf_slope).
    from pyspark.sql import functions as F

    sh = dedup.word_ngrams(_docs(spark, sf_dir), n=2)
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        counts.orderBy(F.desc("n_docs"), F.asc("shingle"))
        .limit(20)
        .select("shingle", "n_docs")
    )


# -------------------------------------------------------- dedup by source

@register(
    "p_dedup_rate_by_source",
    """
WITH survivors AS (
  SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN s.canonical_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       count(*) - CAST(sum(CASE WHEN s.canonical_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
FROM documents d
LEFT JOIN survivors s ON s.canonical_id = d.doc_id
GROUP BY d.source
""",
    tags=("pipeline", "dedup"),
    doc="dedup-rate accounting per source: canonical survivors vs removed "
    "copies (pipeline observability)",
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    survivors = dedup.exact_duplicates(docs).select("canonical_id")
    joined = docs.join(
        survivors, docs["doc_id"] == survivors["canonical_id"], "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("canonical_id").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_canonical"),
        (
            F.count(F.lit(1))
            - F.sum(F.when(F.col("canonical_id").isNotNull(), 1).otherwise(0))
        )
        .cast("long")
        .alias("n_removed"),
    )


@register(
    "p_ivf_topk",
    similarity.ivf_topk_sql(PROBES, k=5, centroid_stride=250),
    tags=("pipeline", "similarity"),
    doc="IVF-style ANN: coarse-quantize to deterministic centroids, rank "
    "within the probe's cell (nprobe=1)",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(_emb(spark, sf_dir), PROBES, k=5, centroid_stride=250)


@register(
    "p_chunk_documents",
    text.chunk_documents_sql(chunk_tokens=50, stride=25),
    tags=("pipeline", "text"),
    doc="document chunking into overlapping token windows (training-window "
    "primitive: 50-token chunks, stride 25)",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(_docs(spark, sf_dir), chunk_tokens=50, stride=25)


@register(
    "p_token_counts",
    r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS n_bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS INTEGER) AS n_len4_estimate
FROM documents
""",
    tags=("pipeline", "text"),
    doc="token counting: whitespace split, word-regex, BPE-ish fixed-width "
    "subword regex, and the chars/4 estimator",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias("n_bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("int").alias("n_len4_estimate"),
    )


@register(
    "p_minhash_estimate_audit",
    f"""
WITH sig AS ({dedup.minhash_signatures_sql(k=16, n=3).strip()}),
exact AS ({dedup.jaccard_pairs_sql(n=3, threshold=0.2).strip()})
SELECT e.doc_a, e.doc_b, e.jaccard AS exact_jaccard,
       CAST((CASE WHEN a.sig_0 = b.sig_0 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_1 = b.sig_1 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_2 = b.sig_2 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_3 = b.sig_3 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_4 = b.sig_4 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_5 = b.sig_5 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_6 = b.sig_6 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_7 = b.sig_7 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_8 = b.sig_8 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_9 = b.sig_9 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_10 = b.sig_10 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_11 = b.sig_11 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_12 = b.sig_12 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_13 = b.sig_13 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_14 = b.sig_14 THEN 1 ELSE 0 END
           + CASE WHEN a.sig_15 = b.sig_15 THEN 1 ELSE 0 END) AS INTEGER) AS sig_agreement_16
FROM exact e
JOIN sig a ON a.doc_id = e.doc_a
JOIN sig b ON b.doc_id = e.doc_b
""",
    tags=("pipeline", "dedup"),
    doc="estimator audit: MinHash signature agreement vs exact n-gram "
    "Jaccard on the near-dup pairs (the sketch-quality measurement a "
    "pipeline runs before trusting LSH at scale)",
)
def q_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    from kafka_replicator_spark.cacheutil import track_cached
    sig = track_cached(dedup.minhash_signatures(docs, k=16, n=3))  # joined twice
    exact = dedup.jaccard_pairs(docs, n=3, threshold=0.2)
    a = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(16)])
    b = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(16)])
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(16)
    )
    return (
        exact.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.col("jaccard").alias("exact_jaccard"),
            agree.cast("int").alias("sig_agreement_16"),
        )
    )

