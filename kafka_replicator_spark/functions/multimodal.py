"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a ``kind``
discriminator and a metadata struct.  The Spark-side shape is real and
tested — Arrow-batched ``mapInPandas`` operators with explicit schemas,
partition-preserving — while the actual codec work (image decode, audio
resample, video frame extraction) is STUBBED: the container has no
PIL/ffmpeg/librosa, so ``decode_stub`` derives deterministic fake media
properties from the payload bytes.  Swapping the stub for a real decoder
changes only the inner function body, not the Spark plan, schema, batch
shape, or partitioning — which is the part that has to be right at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import track_cached

MEDIA_KINDS = ("image", "audio", "video")

#: schema of the metadata extraction output
MEDIA_META_SCHEMA = (
    "doc_id long, kind string, byte_len long, sha256 string, "
    "width int, height int, duration_ms long"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus: payload =
    UTF-8 bytes of the text, kind assigned round-robin.  Stands in for a
    real (id, kind, payload) media table in tests and the oracle.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_stub(kind: str, payload: bytes) -> dict:
    """STUB decoder — deterministic fake media properties from the bytes.

    A real deployment replaces this with PIL / ffprobe / soundfile; the
    signature (kind, bytes) -> properties dict is the extension point.
    """
    n = len(payload)
    if kind == "image":
        return {"width": 16 + n % 1024, "height": 16 + (n * 7) % 1024, "duration_ms": None}
    if kind == "audio":
        return {"width": None, "height": None, "duration_ms": n * 20}
    if kind == "video":
        return {"width": 320, "height": 240, "duration_ms": n * 40}
    raise NotImplementedError(f"unknown media kind: {kind}")


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Metadata extraction over media batches — Arrow-batched mapInPandas,
    one pass, partition-preserving (no shuffle).  sha256/byte_len are real;
    width/height/duration come from :func:`decode_stub`.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    "duration_ms": pd.array([m["duration_ms"] for m in metas], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing for video payloads: emit up to ``max_frames``
    fixed-stride byte windows per video as (doc_id, frame_idx, frame_bytes).
    The real implementation would seek keyframes; the batch-explosion shape
    (1 row in, N rows out, bounded) is what's exercised here.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for doc_id, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_bytes))):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_bytes.append(bytes(payload[i * every_bytes : (i + 1) * every_bytes]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_frames_oracle_sql(every_bytes: int = 64, max_frames: int = 8) -> str:
    """DuckDB mirror of :func:`sample_frames` over synthesize_media(documents),
    digest-compared: frame i of a video payload is bytes
    [i*every_bytes, (i+1)*every_bytes); the corpus is ASCII so VARCHAR
    substring reproduces the bytes and sha256(VARCHAR) the digest (DuckDB 1.0
    has no BLOB substring/sha256).
    """
    return f"""
WITH media AS (
  SELECT doc_id, ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind, text
  FROM documents
),
video AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM media WHERE kind = 'video'
),
frames AS (
  SELECT doc_id,
         unnest(range(0, LEAST({max_frames}, GREATEST(1, n // {every_bytes})))) AS fi,
         text
  FROM video
)
SELECT doc_id,
       CAST(fi AS INTEGER) AS frame_idx,
       CAST(length(substring(text, CAST(fi * {every_bytes} + 1 AS BIGINT), {every_bytes})) AS BIGINT)
         AS frame_len,
       sha256(substring(text, CAST(fi * {every_bytes} + 1 AS BIGINT), {every_bytes})) AS frame_sha
FROM frames
"""


def media_meta_oracle_sql() -> str:
    """DuckDB mirror of extract_media_meta over synthesize_media(documents):
    byte_len/sha256 are content-derived, the stub properties are arithmetic —
    all reproducible in SQL.
    """
    return """
WITH media AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
         encode(text) AS payload,
         text
  FROM documents
)
SELECT doc_id, kind,
       CAST(octet_length(payload) AS BIGINT) AS byte_len,
       sha256(text) AS sha256,  -- duckdb 1.0 sha256 takes VARCHAR; same bytes as the UTF-8 payload
       CAST(CASE kind WHEN 'image' THEN 16 + octet_length(payload) % 1024
                      WHEN 'video' THEN 320 END AS INTEGER) AS width,
       CAST(CASE kind WHEN 'image' THEN 16 + (octet_length(payload) * 7) % 1024
                      WHEN 'video' THEN 240 END AS INTEGER) AS height,
       CAST(CASE kind WHEN 'audio' THEN octet_length(payload) * 20
                      WHEN 'video' THEN octet_length(payload) * 40 END AS BIGINT) AS duration_ms
FROM media
"""


EMBED_DIM = 8
EMBED_SCHEMA = "doc_id long, kind string, e array<double>"


def embed_media(media: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: payload bytes → fixed-dim embedding.

    Arrow-batched ``mapInPandas``, partition-preserving — the exact shape a
    real encoder (CLIP / wav2vec / video encoder) plugs into; the STUB
    derives each dimension from the portable md5 hash of the payload text
    so the DuckDB oracle reproduces the vectors bit-for-bit
    (``(hash60(text || ':' || i) % 2000 - 1000) / 1000`` — thousandths are
    exact doubles).  Swapping in a real model changes the inner function
    only; schema, batching, and the downstream ANN plan stay fixed.
    """
    import hashlib as _hl

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                text = bytes(payload).decode("utf-8")
                embs.append(
                    [
                        (int(_hl.md5(f"{text}:{i}".encode()).hexdigest()[:15], 16) % 2000 - 1000)
                        / 1000.0
                        for i in range(EMBED_DIM)
                    ]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": pdf["kind"], "e": embs}
            )

    return media.mapInPandas(run, schema=EMBED_SCHEMA)


def media_embed_topk(docs: DataFrame, probe_ids: list[int], k: int = 5) -> DataFrame:
    """End-to-end multimodal retrieval: synthesize media → embed (pandas
    stub) → brute-force cosine top-k per probe, JVM-side scoring (the
    embedding is the only Python stage).
    """
    from pyspark.sql import Window

    from kafka_replicator_spark.functions.similarity import dot_col

    # per-row norm hoist (r13-opt, see brute_force_topk): one dot per pair
    emb = track_cached(
        embed_media(synthesize_media(docs)).withColumn(
            "en", F.sqrt(dot_col(F.col("e"), F.col("e")))
        )
    )
    probes = emb.filter(F.col("doc_id").isin(probe_ids)).select(
        F.col("doc_id").alias("probe_id"), F.col("e").alias("pe"),
        F.col("en").alias("pn"),
    )
    pairs = emb.join(F.broadcast(probes), F.col("doc_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("doc_id").alias("neighbor_id"),
        "kind",
        (dot_col(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("en"))).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "kind",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def media_embed_topk_sql(probe_ids: list[int], k: int = 5) -> str:
    dims = ", ".join(
        f"(CAST(('0x' || substr(md5(text || ':{i}'), 1, 15)) AS BIGINT) % 2000 - 1000) / 1000.0"
        for i in range(EMBED_DIM)
    )
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""
WITH media AS (
  SELECT doc_id,
         ['image','audio','video'][(doc_id % 3 + 1)::INTEGER] AS kind,
         text
  FROM documents
), emb AS (
  SELECT doc_id, kind, [{dims}] AS e FROM media
), probes AS (
  SELECT doc_id AS probe_id, e AS pe FROM emb WHERE doc_id IN ({ids})
), scored AS (
  SELECT probe_id, emb.doc_id AS neighbor_id, kind,
         list_dot_product(pe, e)
           / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(e, e))) AS cos
  FROM emb, probes WHERE emb.doc_id <> probe_id
), ranked AS (
  SELECT probe_id, neighbor_id, kind, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, kind, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""
