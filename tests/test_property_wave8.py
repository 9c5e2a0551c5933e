"""Hypothesis property tests for the round-8 exactness rules.

Pure-Python replications of the algebra the wave-8 operators rely on —
fast (no Spark), pinning the MATH independently of any fixture corpus.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------------
# Skyline: the two-window formulation equals NOT-EXISTS dominance
# --------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # price
            st.integers(min_value=0, max_value=8),  # size
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_two_window_form_equals_dominance(points):
    """p survives iff max(size | price' < price) < size AND
    max(size | price' = price) <= size — exactly NOT EXISTS dominance
    with one strict coordinate (part_skyline_pareto's window form)."""
    pts = [(pr, sz, i) for i, (pr, sz) in enumerate(points)]

    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
            if q[2] != p[2]
        )

    for p in pts:
        m_cheaper = max((q[1] for q in pts if q[0] < p[0]), default=-1)
        m_same = max(q[1] for q in pts if q[0] == p[0])
        window_says_skyline = m_cheaper < p[1] and m_same <= p[1]
        assert window_says_skyline == (not dominated(p)), (p, pts)


# --------------------------------------------------------------------------
# OLS normal equations from integer moments equal the definitional fit
# --------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=-10**6, max_value=10**6),
        ),
        min_size=2,
        max_size=50,
        unique_by=lambda p: p[0],
    )
)
def test_ols_moment_form_matches_definitional_least_squares(pts):
    """slope = (nΣty − ΣtΣy)/(nΣt² − (Σt)²) and the matching intercept
    minimize Σ(y − a − b·t)² — verified exactly in rationals against the
    mean-centered definitional form."""
    if len({t for t, _ in pts}) < 2:
        return
    n = len(pts)
    st_, sy = sum(t for t, _ in pts), sum(y for _, y in pts)
    stt = sum(t * t for t, _ in pts)
    sty = sum(t * y for t, y in pts)
    num = Fraction(n * sty - st_ * sy)
    dent = Fraction(n * stt - st_ * st_)
    slope = num / dent
    intercept = Fraction(sy * stt - st_ * sty) / dent
    # definitional: slope = Σ(t−t̄)(y−ȳ) / Σ(t−t̄)², intercept = ȳ − b·t̄
    tbar, ybar = Fraction(st_, n), Fraction(sy, n)
    s_def = sum((t - tbar) * (y - ybar) for t, y in pts) / sum(
        (t - tbar) ** 2 for t, _ in pts
    )
    assert slope == s_def
    assert intercept == ybar - slope * tbar


# --------------------------------------------------------------------------
# NTILE-style ceil rank: (k·n + 99) div 100 is ceil(k·n/100), in range
# --------------------------------------------------------------------------
@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**9),
    st.sampled_from([25, 50, 75, 95, 99]),
)
def test_integer_ceil_rank_is_valid_nearest_rank(n, k):
    import math

    r = (k * n + 99) // 100
    assert r == math.ceil(k * n / 100) or (k * n) % 100 == 0 and r == k * n // 100
    assert 1 <= r <= n


# --------------------------------------------------------------------------
# Holt recursion: the repeated-expression trend equals the two-step form
# --------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=2, max_size=30
    )
)
def test_holt_textual_recursion_matches_reference_loop(cents):
    """The recursive-CTE leg writes the level expression twice (a leg
    cannot name its own output); both spellings must be the same IEEE
    computation as the straightforward two-step loop."""
    ys = [float(c) for c in cents]
    lvl, trd = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        new_lvl = 0.5 * y + 0.5 * (lvl + trd)
        # the textually repeated form used in the SQL:
        sql_trd = 0.5 * ((0.5 * y + 0.5 * (lvl + trd)) - lvl) + 0.5 * trd
        two_step = 0.5 * (new_lvl - lvl) + 0.5 * trd
        assert sql_trd == two_step
        lvl, trd = new_lvl, sql_trd


# --------------------------------------------------------------------------
# Brown-Forsythe moment identity: SSW/SSB from sums equal definitions
# --------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=10**4), min_size=1, max_size=20
        ),
        min_size=2,
        max_size=6,
    )
)
def test_bf_sum_of_squares_identities(groups):
    """Σᵢ(qᵢ − sᵢ²/nᵢ) = Σᵢⱼ(zᵢⱼ − z̄ᵢ)² and Σᵢsᵢ²/nᵢ − S²/N =
    Σᵢnᵢ(z̄ᵢ − z̄)² — exact in rationals (stats_levene_bf's fold)."""
    N = sum(len(g) for g in groups)
    S = sum(sum(g) for g in groups)
    ssw_mom = sum(
        Fraction(sum(z * z for z in g)) - Fraction(sum(g) ** 2, len(g))
        for g in groups
    )
    ssb_mom = sum(Fraction(sum(g) ** 2, len(g)) for g in groups) - Fraction(
        S**2, N
    )
    zbar = Fraction(S, N)
    ssw_def = sum(
        sum((Fraction(z) - Fraction(sum(g), len(g))) ** 2 for z in g)
        for g in groups
    )
    ssb_def = sum(
        len(g) * (Fraction(sum(g), len(g)) - zbar) ** 2 for g in groups
    )
    assert ssw_mom == ssw_def
    assert ssb_mom == ssb_def


# --------------------------------------------------------------------------
# Fano factor moment form equals the definitional variance/mean ratio
# --------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=40)
)
def test_fano_moment_form_is_sample_variance_over_mean(cs):
    n, s, q = len(cs), sum(cs), sum(c * c for c in cs)
    mom = Fraction(n * q - s * s, (n - 1) * s)
    mean = Fraction(s, n)
    var = sum((Fraction(c) - mean) ** 2 for c in cs) / (n - 1)
    assert mom == var / mean
