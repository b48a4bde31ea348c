"""Pure-Python property tests for the round-7 staged queries: the
checkpoint-codec length law, the T13 absorption-scan algebra, ABC-class
tie invariance, and the changepoint score quantization bound.  No Spark
session — these pin the ALGEBRA the SQL restates, on inputs the corpus
can't produce.
"""

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_replicator_spark.core.proto import encode_checkpoint
from kafka_replicator_spark.queries.replicator import _X5_BOUNDARY_OFFSETS


# ------------------------------------------------ X5 length law

def _vlen(v: int) -> int:
    return 1 if v == 0 else (v.bit_length() + 6) // 7


def _expected_len(region: str, topic: str, p: int, off: int, ts_ns: int) -> int:
    s, n = divmod(ts_ns, 10**9)
    total = 2 + len(region.encode()) + 2 + len(topic.encode())
    if p:
        total += 1 + _vlen(p)
    if off:
        total += 1 + _vlen(off)
    sub = (1 + _vlen(s) if s else 0) + (1 + _vlen(n) if n else 0)
    return total + 2 + sub


@given(
    p=st.integers(0, 2**31 - 1),
    off=st.integers(0, 2**63 - 1),
    ts=st.integers(0, 2**62),
)
def test_checkpoint_encoding_length_law(p, off, ts):
    buf = encode_checkpoint("src", "events", p, off, ts)
    assert len(buf) == _expected_len("src", "events", p, off, ts)


def test_boundary_offsets_step_exactly_at_group_transitions():
    # the oracle matrix hits BOTH sides of every 7-bit-group boundary:
    # lengths along the list must be 1,1,1,2,2,3,3,4,...,9,9
    lens = [_vlen(v) for v in _X5_BOUNDARY_OFFSETS]
    assert lens == [1, 1, 1] + [k for k in range(2, 10) for _ in (0, 1)]


# ------------------------------------------------ T13 absorption scan

def _scan_cover(intervals):
    """The r_t13 pipeline in miniature: distinct, (s asc, e desc) order,
    running-max-end absorption, coverage fold."""
    covered = absorbed = 0
    pmax = None
    for s, e in sorted(set(intervals), key=lambda x: (x[0], -x[1])):
        if pmax is None:
            covered += e - s + 1
        elif e <= pmax:
            absorbed += 1
        else:
            covered += e - max(s, pmax + 1) + 1
        pmax = e if pmax is None else max(pmax, e)
    return covered, absorbed


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
def test_absorption_scan_equals_interval_union(raw):
    ivs = [(s, s + ln) for s, ln in raw]
    covered, _ = _scan_cover(ivs)
    union = len(set().union(*[set(range(s, e + 1)) for s, e in ivs]))
    assert covered == union


# ------------------------------------------------ ABC tie invariance

def _abc_aggregate(vals_desc):
    total = sum(vals_desc)
    agg = {}
    cs = 0
    for v in vals_desc:
        cs += v
        cls = "A" if 100 * cs <= 80 * total else ("B" if 100 * cs <= 95 * total else "C")
        a = agg.setdefault(cls, [0, 0])
        a[0] += 1
        a[1] += v
    return agg


@given(st.lists(st.integers(1, 12), min_size=1, max_size=50), st.randoms())
def test_abc_class_aggregates_are_tie_permutation_invariant(vals, rnd):
    base = sorted(vals, reverse=True)
    shuffled = sorted(vals, key=lambda v: (-v, rnd.random()))
    assert _abc_aggregate(base) == _abc_aggregate(shuffled)


# ------------------------------------------------ changepoint quantization

@settings(max_examples=200)
@given(st.lists(st.integers(0, 1000), min_size=2, max_size=30))
def test_changepoint_score_argmax_is_within_quantization_of_true_optimum(ys):
    n, total = len(ys), sum(ys)

    def frac(t):
        s1 = sum(ys[:t])
        s2 = total - s1
        return Fraction(s1 * s1, t) + Fraction(s2 * s2, n - t)

    def score(t):
        s1 = sum(ys[:t])
        s2 = total - s1
        return (10**6 * (s1 * s1 * (n - t) + s2 * s2 * t)) // (t * (n - t))

    t_score = max(range(1, n), key=lambda t: (score(t), -t))
    t_true = max(range(1, n), key=lambda t: (frac(t), -t))
    # the integer score floors at 1e-6 resolution, so the pick can differ
    # from the exact-fraction optimum only within one quantization step —
    # and then both engines still agree because they compute the SAME ints
    assert frac(t_true) - frac(t_score) <= Fraction(2, 10**6)
