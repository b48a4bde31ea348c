"""Round-13 property tests: ADVICE r12 guards and the persisted-model
(index-build vs serve split) machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_replicator_spark.cacheutil import release_cached
from kafka_replicator_spark.functions import similarity as sim
from kafka_replicator_spark.sources.tables import load_table


@pytest.fixture(autouse=True)
def _release():
    yield
    release_cached()


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_ingest_validate_rejects_nonmonotone_batch(spark, sf_dir):
    """ADVICE r12 #4: the eager monotonicity guard — feeding a batch whose
    ids do NOT all exceed the state's must raise, not silently freeze
    stale (n_near, kept) on prior rows."""
    emb = _emb(spark, sf_dir)
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    mid = (int(lo) + int(hi)) // 2
    centroids = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("ce"),
    )
    first = emb.filter(F.col("vec_id") <= mid)
    state = sim.semantic_dedup_ingest(
        None, first, centroids, tau=0.40, validate=True
    )
    # a VALID second batch passes under the guard …
    second = emb.filter(F.col("vec_id") > mid)
    sim.semantic_dedup_ingest(state, second, centroids, tau=0.40, validate=True)
    # … while replaying an overlapping batch raises
    with pytest.raises(ValueError, match="monotonicity contract"):
        sim.semantic_dedup_ingest(state, first, centroids, tau=0.40, validate=True)


def test_derive_n_planes_sql_empty_relation_matches_spark(spark):
    """ADVICE r12 #2: an EMPTY assignment relation must derive min_planes
    on BOTH engines (Spark: 0 <= 0 on the first ladder arm; SQL: the sums
    are coalesced to 0 — a NULL-falling ladder would land on max_planes)."""
    import duckdb

    empty = spark.createDataFrame([], "vec_id long, centroid_id long")
    assert sim.derive_n_planes(empty, pairs_per_vec=64) == 4
    sql = sim.derive_n_planes_case_sql(64)
    con = duckdb.connect()
    got = con.execute(
        f"WITH cellsz AS (SELECT count(*) AS c FROM (SELECT 1 AS x WHERE false) GROUP BY x) {sql}"
    ).fetchone()[0]
    con.close()
    assert got == 4
