"""Every registered query must match its DuckDB oracle on sf0.001 — the
local mirror of the driver's t2 correctness gate.
"""

import pytest

from kafka_replicator_spark.queries import all_queries
from tests.oracle_utils import run_compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is not None])
def test_query_matches_oracle(spark, sf_dir, name):
    n = run_compare(spark, sf_dir, name)
    assert n >= 0


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle is None])
def test_oracle_free_query_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
