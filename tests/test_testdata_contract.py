"""Testdata schema contract — the driver regenerates /root/testdata between
rounds and has shipped `events.ts` as both TIMESTAMP(NANOS) and
timestamp[us]; a silent drift once produced 74 scattered failures instead of
one readable signal.  This test names the drift explicitly: if a future
regeneration changes a column, exactly this fails with a message saying
which table/column moved.

pyarrow-only (no Spark session) so it runs in milliseconds and first.
Columns the engine normalizes by design carry an *allowance set* — any
member type is fine because sources/tables.load_table maps them to one
engine-side type (events.ts → long epoch-nanos).
"""

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

#: column -> exact type, or a set of accepted types (normalized downstream)
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int32", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
        "l_linenumber": "int32", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": "int64",
        # the known oscillation — load_table normalizes all of these to a
        # LONG of epoch-nanos (CLAUDE.md environment rules)
        "ts": {"int64", "timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]",
               "timestamp[ns, tz=UTC]"},
        "user_id": "int64", "event_type": "string", "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64", "embedding": "list<element: float>", "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_contract(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    assert os.path.exists(path), (
        f"TESTDATA DRIFT: {path} is missing — the driver's regeneration "
        f"changed the table set"
    )
    got = {f.name: str(f.type) for f in pq.read_schema(path)}
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"TESTDATA DRIFT in {table}: columns changed.\n"
        f"  missing: {sorted(set(exp) - set(got))}\n"
        f"  unexpected: {sorted(set(got) - set(exp))}"
    )
    for col, want in exp.items():
        accepted = want if isinstance(want, set) else {want}
        assert got[col] in accepted, (
            f"TESTDATA DRIFT in {table}.{col}: type {got[col]!r} not in "
            f"accepted set {sorted(accepted)} — if intentional, extend the "
            f"allowance AND check the load_table normalization handles it"
        )
