"""Pure-python algebra properties for the round-7 staged batch: each
closed form or quantization trick is checked against a straightforward
exact (Fraction) reference implementation — no Spark session needed."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st

cents = st.integers(min_value=0, max_value=10**9)


# ------------------------------------------------ a_dema_revenue closed form


@settings(max_examples=200)
@given(st.lists(cents, min_size=1, max_size=25))
def test_dema_closed_form_matches_recursion(vs):
    # direct coupled recursion in exact rationals
    s = Fraction(vs[0])
    d = Fraction(vs[0])
    for v in vs[1:]:
        s = (Fraction(v) + s) / 2
        d = (s + d) / 2
    t = len(vs) - 1
    # the query's closed form: [(t+2)v0 + Σ_{i>=1}(t-i+1)2^(i-1)v_i] / 2^(t+1)
    num = (t + 2) * vs[0] + sum(
        (t - i + 1) * (1 << (i - 1)) * vs[i] for i in range(1, t + 1)
    )
    assert Fraction(num, 1 << (t + 1)) == d
    # and the emitted integer: exact micro-cents floor
    assert (1_000_000 * num) // (1 << (t + 1)) == (d * 1_000_000).__floor__()


# --------------------------------------------- a_gini_brand_revenue formula


@settings(max_examples=200)
@given(st.lists(cents, min_size=1, max_size=30).filter(lambda v: sum(v) > 0))
def test_gini_rank_formula_matches_mean_abs_difference(xs):
    n = len(xs)
    sx = sorted(xs)
    # rank formula used by the query (ties get consecutive ranks — x equal
    # so the weighted sum is order-invariant)
    src = sum((i + 1) * x for i, x in enumerate(sx))
    total = sum(sx)
    g_rank = Fraction(2 * src, n * total) - Fraction(n + 1, n)
    # definitional Gini: mean absolute difference / (2 * mean)
    mad = sum(abs(a - b) for a in xs for b in xs)
    g_def = Fraction(mad, 2 * n * n) / Fraction(total, n)
    assert g_rank == g_def
    # emitted ppm floor
    ppm = (2_000_000 * src - 1_000_000 * (n + 1) * total) // (n * total)
    assert ppm == (g_def * 1_000_000).__floor__()


# ------------------------------------------- a_mann_kendall_daily variance


@settings(max_examples=200)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=40))
def test_mann_kendall_s_and_var18_match_brute_force(vs):
    n = len(vs)
    s = sum(
        (1 if vs[j] > vs[i] else -1 if vs[j] < vs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    # the query's tie-adjusted variance numerator
    from collections import Counter

    ties = Counter(vs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    # Kendall's exact Var(S) = var18 / 18 must be non-negative and zero
    # exactly when all values tie
    assert var18 >= 0
    assert (var18 == 0) == (len(ties) == 1)
    # tau_a floor-division truncates toward zero identically on both
    # engines (verified non-trap); reproduce the emitted value
    tau_ppm = int((2_000_000 * s) / (n * (n - 1))) if s >= 0 else -(
        (2_000_000 * -s) // (n * (n - 1))
    )
    # truncation toward zero == python // only for non-negative numerators
    if s >= 0:
        assert tau_ppm == (2_000_000 * s) // (n * (n - 1))
    assert -1_000_000 <= tau_ppm <= 1_000_000


# ------------------------------------------ a_kruskal_wallis_dow micro terms


@settings(max_examples=100)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), cents),
        min_size=8,
        max_size=60,
    ).filter(lambda rows: len({d for d, _ in rows}) >= 2)
)
def test_kruskal_wallis_micro_floor_within_one_ppm_of_exact(rows):
    # deterministic ranks: row_number over (value, index)
    order = sorted(range(len(rows)), key=lambda i: (rows[i][1], i))
    rank = {idx: r + 1 for r, idx in enumerate(order)}
    groups: dict[int, list[int]] = {}
    for i, (g, _) in enumerate(rows):
        groups.setdefault(g, []).append(rank[i])
    n = len(rows)
    # exact H on these ranks
    h_exact = Fraction(12, n * (n + 1)) * sum(
        Fraction(sum(rs) ** 2, len(rs)) for rs in groups.values()
    ) - 3 * (n + 1)
    # the query's integer pipeline: per-group micro floor, then ppm floor
    s_micro = sum((1_000_000 * sum(rs) ** 2) // len(rs) for rs in groups.values())
    h_ppm = (12 * s_micro) // (n * (n + 1)) - 3_000_000 * (n + 1)
    assert abs(h_ppm - (h_exact * 1_000_000).__floor__()) <= 1


# -------------------------------------- a_winsorized_mean_price exactness


def _quantile_type7(sx: list[int], p: Fraction) -> Fraction:
    # linear interpolation at h = (n-1)p — what both percentile() and
    # quantile_cont() compute
    h = (len(sx) - 1) * p
    lo = int(h)
    frac = h - lo
    hi = min(lo + 1, len(sx) - 1)
    return Fraction(sx[lo]) + frac * (sx[hi] - sx[lo])


@settings(max_examples=200)
@given(st.lists(cents, min_size=1, max_size=50))
def test_winsorized_quartiles_are_quarter_integers(vals):
    sx = sorted(vals)
    q1 = _quantile_type7(sx, Fraction(1, 4))
    q3 = _quantile_type7(sx, Fraction(3, 4))
    # power-of-two fractions land on quarter-integers — 4x is exact
    assert (q1 * 4).denominator == 1
    assert (q3 * 4).denominator == 1
    clamped = [min(max(Fraction(v), q1), q3) for v in vals]
    s4 = sum(c * 4 for c in clamped)
    assert s4.denominator == 1  # the query's sum(wv*4) int cast is exact
    mean_ucents = (1_000_000 * int(s4)) // (4 * len(vals))
    exact = Fraction(sum(clamped), len(vals)) * 1_000_000
    assert mean_ucents == exact.__floor__()


# --------------------------------- p_lsh_pair_transitivity wedge counting


@settings(max_examples=100)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        )
        .map(lambda t: (min(t), max(t)))
        .filter(lambda t: t[0] != t[1]),
        max_size=40,
    )
)
def test_transitivity_wedges_and_triangles_match_brute_force(edges):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # the query's wedge formula: Σ d(d-1)/2 — unordered paths of length 2
    w_formula = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    w_brute = sum(
        1
        for c in adj
        for x in adj[c]
        for y in adj[c]
        if x < y
    )
    assert w_formula == w_brute
    # the query's ordered triple join: (a,b),(b,c),(a,c) with a<b<c
    tri = sum(
        1
        for (a, b) in edges
        for c in adj.get(b, ())
        if b < c and (a, c) in edges
    )
    tri_brute = sum(
        1
        for a in adj
        for b in adj[a]
        for c in adj[a]
        if a < b < c and c in adj[b]
    )
    assert tri == tri_brute
    assert 3 * tri <= w_formula  # every triangle closes exactly 3 wedges


# ------------------------------------------------- p_borda_fusion points


@settings(max_examples=100)
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20,
             unique=True),
)
def test_borda_points_bounds_and_overlap(r1, r2):
    k = 20
    pts: dict[int, int] = {}
    for rank, doc in enumerate(r1, start=1):
        pts[doc] = pts.get(doc, 0) + (k + 1 - rank)
    for rank, doc in enumerate(r2, start=1):
        pts[doc] = pts.get(doc, 0) + (k + 1 - rank)
    # a doc in both systems scores exactly the sum of its two rank awards
    both = set(r1) & set(r2)
    for d in both:
        assert pts[d] <= 2 * k
        assert pts[d] == (k + 1 - (r1.index(d) + 1)) + (k + 1 - (r2.index(d) + 1))
    # total points conserved: Σ over docs == Σ of the two rank series
    assert sum(pts.values()) == sum(
        k + 1 - r for r in range(1, len(r1) + 1)
    ) + sum(k + 1 - r for r in range(1, len(r2) + 1))
