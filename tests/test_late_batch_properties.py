"""Pure-Python property tests for the round-6 late-batch invariants —
the mathematical properties the oracle queries RELY on, pinned directly
(no Spark session, so these run in milliseconds).

Each helper reimplements the exact portable arithmetic of its query
(functions/hashing.portable_hash60 == int(md5[:15], 16)), so a property
violation here means the query's premise — not just its code — is wrong.
"""

import hashlib
import urllib.parse

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.queries.replicator import (
    _BACKOFF_BASE_MS,
    _BACKOFF_CAP_MS,
    _BACKOFF_MAX_RETRIES,
    _RB_W,
    _X4_ESCAPES,
)
from kafka_replicator_spark.queries.pipeline_r6 import _NDCG_IDCG, _NDCG_W


def _h60(s: str) -> int:
    """portable_hash60 reimplemented: first 15 hex chars of md5."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hrw_owner(key: str, n_workers: int) -> int:
    hs = [_h60(f"{key}#{w}") for w in range(n_workers)]
    m = max(hs)
    return hs.index(m)  # lowest index on tie, matching the CASE order


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefgh0123456789/", min_size=1, max_size=40))
def test_hrw_minimal_disruption(key):
    """THE rendezvous property r_rebalance_rendezvous's movement audit
    assumes: when worker W joins, an item either keeps its owner or
    moves to W — never to another pre-existing worker."""
    before = _hrw_owner(key, _RB_W)
    after = _hrw_owner(key, _RB_W + 1)
    assert after == before or after == _RB_W


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=2, max_value=16))
def test_hrw_owner_in_range(n_workers):
    for i in range(50):
        o = _hrw_owner(f"k{i}", n_workers)
        assert 0 <= o < n_workers


def test_backoff_schedule_monotone_and_capped():
    """r_x7_backoff_schedule's wait model: non-decreasing, capped, and
    the cap actually bites before the retry limit (the clamp is
    exercised, not vacuous)."""
    waits = [
        min(_BACKOFF_BASE_MS << i, _BACKOFF_CAP_MS)
        for i in range(_BACKOFF_MAX_RETRIES)
    ]
    assert waits == sorted(waits)
    assert max(waits) == _BACKOFF_CAP_MS
    assert any(
        (_BACKOFF_BASE_MS << i) > _BACKOFF_CAP_MS
        for i in range(_BACKOFF_MAX_RETRIES)
    ), "cap never bites — the clamp branch is untested"


def test_ndcg_weights_decreasing_and_idcg_prefix():
    """p_ann_ndcg's literal tables: discounts strictly decrease with
    rank and the ideal-DCG table is exactly their prefix sums."""
    assert list(_NDCG_W) == sorted(_NDCG_W, reverse=True)
    assert len(set(_NDCG_W)) == len(_NDCG_W)
    acc = 0
    for w, c in zip(_NDCG_W, _NDCG_IDCG):
        acc += w
        assert c == acc


@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(min_value=1, max_value=5)))
def test_ndcg_bounded_by_one(hits):
    """For ANY hit pattern, DCG <= IDCG(n_hits), so ndcg_ppm <= 1e6 —
    and equality holds exactly when hits occupy the top ranks."""
    if not hits:
        return
    dcg = sum(_NDCG_W[r - 1] for r in hits)
    idcg = _NDCG_IDCG[len(hits) - 1]
    assert dcg <= idcg
    if hits == set(range(1, len(hits) + 1)):
        assert dcg == idcg


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='0123456789k{}": %+', max_size=60))
def test_percent_encode_roundtrip(s):
    """r_x4_url_roundtrip's premise: the replace-chain encoding ('%'
    first, '+' escaped for form-urlencoded semantics) composed with
    percent-decoding is the identity — checked against urllib's
    unquote_plus, which mirrors Spark url_decode's '+' → space rule, so
    an unescaped '+' in the payload would fail this test."""
    enc = s
    for lit, esc in _X4_ESCAPES:
        enc = enc.replace(lit, esc)
    assert "+" not in enc
    assert urllib.parse.unquote_plus(enc) == s
