"""Guard on the measured runtime-scaling exponents (r12 verdict #2,
extended to a two-decade fit by r13 verdict #5).

`scripts/time_queries.py` records per-query Spark wall time at sf0.001,
sf0.01 and sf0.1 (committed as TIMINGS_sf*.json; the table in SCALING.md
§"Measured runtime-scaling exponents" is generated from the same files).
This test re-derives the exponents and asserts every query that looks
super-linear is either below the measurability floor or named in
EXPLAINED with a written rationale.

Two flags, because each catches what the other cannot:

- **two-decade exponent** log10(t(0.1)/t(0.001))/2 at a LOW floor
  (0.5 s at sf0.1): per-action fixed overhead cancels twice as well
  over 100× data, so ~250 queries are measurable instead of ~140;
- **second-decade slope** log10(t(0.1)/t(0.01)) at the original 1 s
  floor: late-onset super-linearity (fine at small SF, exploding in
  the last decade) would be diluted to ≤1.15 in the two-decade average.

The plan-shape invariants (test_broadcast_invariant, bounded buckets,
test_plan_shape) are static guarantees; this is the empirical backstop
for the class they cannot see — e.g. a candidate-pair explosion inside
bounded shapes.
"""

from __future__ import annotations

import json
import math
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(ROOT, "TIMINGS_sf0.001.json")
SMALL = os.path.join(ROOT, "TIMINGS_sf0.01.json")
BIG = os.path.join(ROOT, "TIMINGS_sf0.1.json")

#: Two-decade floor: overhead distortion is halved, so 0.5 s at sf0.1 is
#: enough for the slope to mean something (one-decade needed 1.0 s).
MIN_SECS_2DEC = 0.5
#: Second-decade slope keeps the original floor — it is a one-decade
#: measurement with the original overhead sensitivity.
MIN_SECS_D2 = 1.0
#: 10×/100× data ⇒ linear work is exp 1.0.  Timing noise on a shared
#: host moves individual exponents by ~±0.15 (less for the two-decade
#: fit); 1.3 flags ~2× super-linear growth while tolerating that noise.
THRESHOLD = 1.3

#: Every flagged query must appear here with a measured rationale.
#: (Empty when nothing exceeds THRESHOLD — additions need a reason, not
#: just a name.)
EXPLAINED: dict[str, str] = {}

_have_files = all(os.path.exists(p) for p in (TINY, SMALL, BIG))


def _load():
    with open(TINY) as f:
        t_tiny = json.load(f)["queries"]
    with open(SMALL) as f:
        t_small = json.load(f)["queries"]
    with open(BIG) as f:
        t_big = json.load(f)["queries"]
    return t_tiny, t_small, t_big


def _flagged(t_tiny, t_small, t_big) -> dict[str, str]:
    out: dict[str, str] = {}
    for name, tb in t_big.items():
        tt, ts = t_tiny.get(name), t_small.get(name)
        if tt is None or ts is None or tt <= 0 or ts <= 0:
            continue
        if tb >= MIN_SECS_2DEC:
            exp = math.log10(tb / tt) / 2
            if exp > THRESHOLD:
                out[name] = f"exp2dec={exp:.2f}"
                continue
        if tb >= MIN_SECS_D2:
            d2 = math.log10(tb / ts)
            if d2 > THRESHOLD:
                out[name] = f"d2={d2:.2f}"
    return out


@pytest.mark.skipif(not _have_files, reason="timing files not yet generated")
def test_no_unexplained_superlinear_queries():
    flagged = _flagged(*_load())
    offenders = {n: v for n, v in flagged.items() if n not in EXPLAINED}
    assert not offenders, (
        f"super-linear runtime scaling without a rationale: {offenders} — "
        "either fix the query or add it to EXPLAINED with a measured "
        "justification"
    )


@pytest.mark.skipif(not _have_files, reason="timing files not yet generated")
def test_explained_entries_are_current():
    """An EXPLAINED entry whose query no longer trips either flag (or no
    longer exists) is stale — prune it so the exception list stays an
    honest record of known super-linear queries."""
    flagged = _flagged(*_load())
    stale = [n for n in EXPLAINED if n not in flagged]
    assert not stale, f"stale EXPLAINED entries (no longer flagged): {stale}"
