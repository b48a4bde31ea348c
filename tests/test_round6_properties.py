"""Hypothesis property tests for the round-4 operator additions: skyline
dominance vs brute force over adversarial duplicates, and the winnowing
shared-fingerprint guarantee over random vocabularies."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.functions.dedup import WINNOW_N, WINNOW_W, winnowing
from kafka_replicator_spark.functions.frontier import skyline_2d


@pytest.fixture(scope="session")
def spark_global(spark):
    # session-scoped alias so hypothesis's function-health-check accepts it
    return spark


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=60
    ),
    partitions=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_skyline_dominance_property(spark_global, pts, partitions):
    spark = spark_global
    rows = [(i, float(c), int(q)) for i, (c, q) in enumerate(pts)]
    df = spark.createDataFrame(rows, schema="id long, cost double, q long")
    got = sorted(r["id"] for r in skyline_2d(df, "cost", "q", partitions=partitions).collect())
    exp = sorted(
        i
        for i, (c, q) in enumerate(pts)
        if not any(
            c2 <= c and q2 >= q and (c2 < c or q2 > q) for (c2, q2) in pts
        )
    )
    assert got == exp


@given(
    seed=st.integers(0, 10_000),
    pre=st.integers(min_value=0, max_value=30),
    post=st.integers(min_value=0, max_value=30),
)
@settings(max_examples=12, deadline=None)
def test_winnowing_shared_fingerprint_property(spark_global, seed, pre, post):
    """Any shared run of >= w+n-1 tokens guarantees a shared fingerprint,
    wherever it sits inside the surrounding document."""
    spark = spark_global
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab, WINNOW_W + WINNOW_N - 1))
    a = " ".join(
        list(rng.choice(vocab, pre)) + [shared] + list(rng.choice(vocab, post))
    )
    df = spark.createDataFrame(
        [(1, a), (2, shared)], schema="doc_id long, text string"
    )
    fps = {}
    for r in winnowing(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]
