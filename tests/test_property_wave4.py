"""Hypothesis property tests for the session-2 exactness rules.

Pure-Python replications of the algebra the operators rely on — fast
(no Spark), and they pin the MATH independent of any fixture corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_neighborhood(w: str) -> set[str]:
    """The text_typo_pairs signature set: w, all 1-deletions, all
    2-deletions (exactly what the Spark expression generates)."""
    d1 = {w[:i] + w[i + 1 :] for i in range(len(w))}
    d2 = {
        w[:i] + w[i + 1 : j] + w[j + 1 :]
        for i in range(len(w) - 1)
        for j in range(i + 1, len(w))
    }
    return {w} | d1 | d2


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=1, max_size=8),
    st.text(alphabet="abcd", min_size=1, max_size=8),
)
def test_fastss_blocking_is_complete_for_two_edits(a, b):
    """ed(a,b) ≤ 2 ⟹ the deletion neighborhoods intersect (the FastSS
    completeness claim the typo-pair equi-join blocking rests on)."""
    if _lev(a, b) <= 2:
        assert _del_neighborhood(a) & _del_neighborhood(b)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60))
def test_count_crossing_rule_is_lower_median(vals):
    """min v with 2·cum(v) ≥ n equals the classical lower median — the
    rule behind weighted_median, MAD, Theil-Sen selection, runs-test
    median, and the decile map (at k=5)."""
    import statistics

    n = len(vals)
    cnt: dict[int, int] = {}
    for v in vals:
        cnt[v] = cnt.get(v, 0) + 1
    cum = 0
    crossing = None
    for v in sorted(cnt):
        cum += cnt[v]
        if 2 * cum >= n:
            crossing = v
            break
    assert crossing == statistics.median_low(vals)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=10_000),
)
def test_largest_remainder_allocation_sums_and_bounds(weights, fee):
    """The Hamilton apportionment rule (lineitem_prorate_fee): integer
    allocations sum EXACTLY to the fee and each differs from exact
    proportionality by strictly less than one unit."""
    tot = sum(weights)
    if tot == 0:
        return
    base = [(fee * w) // tot for w in weights]
    rem = [(fee * w) % tot for w in weights]
    leftover = fee - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == fee
    for w, a in zip(weights, alloc):
        assert abs(a - fee * w / tot) < 1.0


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
)
def test_min_pairwise_distance_is_adjacent_in_merged_order(pa, pb):
    """min |a−b| over two position sets is achieved by a pair adjacent in
    the merged sorted order — the identity text_proximity_search's
    posting-list LAG plan rests on."""
    brute = min(abs(a - b) for a in pa for b in pb)
    merged = sorted([(p, 0) for p in pa] + [(p, 1) for p in pb])
    adj = min(
        (
            abs(y[0] - x[0])
            for x, y in zip(merged, merged[1:])
            if x[1] != y[1]
        ),
        default=None,
    )
    # ties at the same position with both tags may sort either way; the
    # brute-force 0 case is still found because equal positions of
    # different tags are adjacent in ANY stable order of that position.
    assert adj == brute
