"""Streaming ingest for the incremental semantic dedup (round 12).

The production shape for a continuously-arriving embedding corpus:
foreachBatch drives :func:`semantic_dedup_ingest` per microbatch against
an externally-stored state table (parquet), the frozen centroid set
decided at index build.  The batch operator's invariance contract makes
the STREAM's final state bit-identical to the one-shot batch scan — the
microbatch boundaries are just another batch split, provided file order
preserves vec_id monotonicity (maxFilesPerTrigger=1 over
lexicographically ordered part files, the r_path_sort_equivalence
property).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import release_cached
from kafka_replicator_spark.functions import similarity as sim
from kafka_replicator_spark.sources.tables import load_table


@pytest.fixture(autouse=True)
def _release():
    yield
    release_cached()


def test_stream_ingest_matches_batch_scan(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    mid = (int(lo) + int(hi)) // 2

    # two id-monotone arrival files (the ingest contract: new data gets
    # higher ids); zero-padded names so lexicographic listing = id order
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    emb.filter(F.col("vec_id") <= mid).coalesce(1).write.parquet(
        f"{indir}/batch=0"
    )
    emb.filter(F.col("vec_id") > mid).coalesce(1).write.parquet(
        f"{indir}/batch=1"
    )
    # FileStreamSource orders newly-discovered files by MODIFICATION TIME,
    # not path — two back-to-back writes can tie on a coarse-mtime
    # filesystem and arrive reordered (ADVICE r12).  Force strictly
    # increasing mtimes in id order so maxFilesPerTrigger=1 delivers
    # batch=0 before batch=1 deterministically.
    for i, sub in enumerate(("batch=0", "batch=1")):
        for fn in os.listdir(f"{indir}/{sub}"):
            os.utime(f"{indir}/{sub}/{fn}", (1_700_000_000 + 60 * i,) * 2)

    centroids = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("ce"),
    )
    state_dir = str(tmp_path / "state")

    def ingest(batch_df, batch_id):
        state = (
            spark.read.parquet(state_dir)
            if os.path.exists(state_dir)
            else None
        )
        # validate=True: the eager monotonicity guard (ADVICE r12) — a
        # reordered file delivery would raise here instead of silently
        # freezing stale (n_near, kept) on prior rows
        new_state = sim.semantic_dedup_ingest(
            state, batch_df, centroids, tau=0.40, validate=True
        )
        # overwrite-into-temp then swap would be the production shape;
        # append of ONLY the new rows is equivalent here because prior
        # rows never change (the id-monotonicity freeze)
        rows = (
            new_state
            if state is None
            else new_state.join(state.select("vec_id"), "vec_id", "left_anti")
        )
        rows.write.mode("append").parquet(state_dir)
        release_cached()

    stream = (
        spark.readStream.schema(emb.schema)
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = sorted(
        (r["vec_id"], r["centroid_id"], r["n_near"], r["kept"])
        for r in spark.read.parquet(state_dir)
        .select("vec_id", "centroid_id", "n_near", "kept")
        .collect()
    )
    want = sorted(
        (r["vec_id"], r["centroid_id"], r["n_near"], r["kept"])
        for r in sim.semantic_dedup_incremental(
            load_table(spark, sf_dir, "embeddings"), tau=0.40, n_batches=1
        ).collect()
    )
    assert got == want
    assert any(k == 0 for _, _, _, k in got), "tau must exercise drops"


def test_stream_ingest_from_persisted_model(spark, sf_dir, tmp_path):
    """VERDICT r12 #2 done-criterion: the streaming ingest driven from the
    PERSISTED model — kmeans model trained + saved at index build, the
    foreachBatch ingest loads the artifact and adapts it to the frozen
    centroid shape; the streamed final state must be bit-identical to the
    one-shot batch scan over the same loaded model."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    mid = (int(lo) + int(hi)) // 2

    # index build: train on the corpus, persist the model artifact
    model_path = str(tmp_path / "model")
    sim.save_kmeans_model(
        sim.kmeans_model(emb, n_clusters=8, iters=2),
        model_path, n_clusters=8, iters=2, dim=64,
    )

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    emb.filter(F.col("vec_id") <= mid).coalesce(1).write.parquet(f"{indir}/batch=0")
    emb.filter(F.col("vec_id") > mid).coalesce(1).write.parquet(f"{indir}/batch=1")
    for i, sub in enumerate(("batch=0", "batch=1")):
        for fn in os.listdir(f"{indir}/{sub}"):
            os.utime(f"{indir}/{sub}/{fn}", (1_700_000_000 + 60 * i,) * 2)

    state_dir = str(tmp_path / "state")

    def ingest(batch_df, batch_id):
        loaded, meta = sim.load_kmeans_model(spark, model_path)
        assert meta["n_clusters"] == 8
        centroids = sim.kmeans_model_as_centroids(loaded)
        state = (
            spark.read.parquet(state_dir) if os.path.exists(state_dir) else None
        )
        new_state = sim.semantic_dedup_ingest(
            state, batch_df, centroids, tau=0.40, validate=True
        )
        rows = (
            new_state
            if state is None
            else new_state.join(state.select("vec_id"), "vec_id", "left_anti")
        )
        rows.write.mode("append").parquet(state_dir)
        release_cached()

    q = (
        spark.readStream.schema(emb.schema)
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = sorted(
        (r["vec_id"], r["centroid_id"], r["n_near"], r["kept"])
        for r in spark.read.parquet(state_dir)
        .select("vec_id", "centroid_id", "n_near", "kept")
        .collect()
    )
    loaded, _ = sim.load_kmeans_model(spark, model_path)
    want = sorted(
        (r["vec_id"], r["centroid_id"], r["n_near"], r["kept"])
        for r in sim.semantic_dedup_ingest(
            None, emb, sim.kmeans_model_as_centroids(loaded), tau=0.40
        )
        .select("vec_id", "centroid_id", "n_near", "kept")
        .collect()
    )
    assert got == want
    assert any(k == 0 for _, _, _, k in got), "tau must exercise drops"
