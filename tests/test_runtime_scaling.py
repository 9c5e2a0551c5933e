"""Guard on the measured runtime-scaling exponents (r12 verdict #2).

`scripts/time_queries.py` records per-query Spark wall time at sf0.01 and
sf0.1 (committed as TIMINGS_sf0.01.json / TIMINGS_sf0.1.json; the table
in SCALING.md §"Measured runtime-scaling exponents" is generated from the
same files).  This test re-derives the exponents and asserts that every
query that looks super-linear over the 10× data step is either

- below the measurability floor (fixed overhead dominates), or
- named in EXPLAINED below with a written rationale.

The plan-shape invariants (test_broadcast_invariant, bounded buckets)
are static guarantees; this is the empirical backstop for the class they
cannot see — e.g. a candidate-pair explosion inside bounded shapes.
"""

from __future__ import annotations

import json
import math
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = os.path.join(ROOT, "TIMINGS_sf0.01.json")
BIG = os.path.join(ROOT, "TIMINGS_sf0.1.json")

#: Queries are only judged when slow enough for the slope to mean
#: anything: below ~1 s at sf0.1 the JVM/job fixed overhead (~0.2-0.4 s
#: per action on local[32]) dominates both numerators.
MIN_SECS = 1.0
#: 10× data ⇒ linear work is exp 1.0.  Timing noise on a shared host
#: moves individual exponents by ~±0.15; 1.3 flags ~2× super-linear
#: growth while tolerating that noise.
THRESHOLD = 1.3

#: Every flagged query must appear here with a measured rationale.
#: (Empty when nothing exceeds THRESHOLD — additions need a reason, not
#: just a name.)
EXPLAINED: dict[str, str] = {}


@pytest.mark.skipif(
    not (os.path.exists(SMALL) and os.path.exists(BIG)),
    reason="timing files not yet generated this round",
)
def test_no_unexplained_superlinear_queries():
    with open(SMALL) as f:
        t_small = json.load(f)["queries"]
    with open(BIG) as f:
        t_big = json.load(f)["queries"]
    offenders = {}
    for name, tb in t_big.items():
        ts = t_small.get(name)
        if ts is None or ts <= 0 or tb < MIN_SECS:
            continue
        exp = math.log10(tb / ts)
        if exp > THRESHOLD and name not in EXPLAINED:
            offenders[name] = round(exp, 2)
    assert not offenders, (
        f"super-linear runtime scaling without a rationale: {offenders} — "
        "either fix the query or add it to EXPLAINED with a measured "
        "justification"
    )


@pytest.mark.skipif(
    not (os.path.exists(SMALL) and os.path.exists(BIG)),
    reason="timing files not yet generated this round",
)
def test_explained_entries_are_current():
    """An EXPLAINED entry whose query no longer exceeds THRESHOLD (or no
    longer exists) is stale — prune it so the exception list stays an
    honest record of known super-linear queries."""
    with open(SMALL) as f:
        t_small = json.load(f)["queries"]
    with open(BIG) as f:
        t_big = json.load(f)["queries"]
    stale = []
    for name in EXPLAINED:
        ts, tb = t_small.get(name), t_big.get(name)
        if ts is None or tb is None or tb < MIN_SECS:
            stale.append(name)
            continue
        if math.log10(tb / ts) <= THRESHOLD:
            stale.append(name)
    assert not stale, f"stale EXPLAINED entries (no longer flagged): {stale}"
