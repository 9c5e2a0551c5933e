"""Repo-wide single-partition-window invariant.

An unpartitioned `Window.orderBy(...)` moves EVERY input row to one
partition (Spark's `WindowExec: No Partition Defined` warning) — fine over
a bounded post-aggregation relation, the classic scale-killer over a
corpus- or dimension-cardinality relation.  The corpus-scale windows were
converted to the two-phase distributed order (`functions/order.py`); this
suite is the standing guard that no registered query re-introduces one.

Structural bounded categories (a window passes if ANY matches):

- ``partition_offsets`` — the window orders on a ``_bkt`` column (the
  two-phase offset prefix over per-bucket totals: ≤ n_buckets rows,
  bounded by CONFIGURATION, not data size).
- ``limit``   — the window's child subtree contains GlobalLimit /
  CollectLimit / TakeOrderedAndProject: k rows by construction.
- ``scalar``  — the relation under the window is a keys=[] aggregate.

Windows over relations whose boundedness is a MODEL fact rather than a
plan-structural fact are acknowledged by name with an exact expected
count and a written rationale (`ACKNOWLEDGED` below).  A new unpartitioned
window anywhere else — or an acknowledged query growing MORE of them —
fails this suite and must either restructure onto
`functions/order.with_global_order` or argue its bound here.
"""

from __future__ import annotations

import re

import pytest

from iceberg_table_generator_spark import all_queries
from iceberg_table_generator_spark.plans import explain

QUERIES = all_queries()

LIMIT = re.compile(r"TakeOrderedAndProject|GlobalLimit|CollectLimit")
SCALAR_AGG = re.compile(r"(?:Hash|Sort|Object\w*)Aggregate\(keys=\[\]")
PID_ORDER = re.compile(r"windowspecdefinition\(_bkt#\d+")

#: query name -> (max unpartitioned windows, why the relation is bounded).
ACKNOWLEDGED: dict[str, tuple[int, str]] = {
    "events_dau_rolling": (1, "one row per calendar day (time domain)"),
    "events_peak_concurrency": (
        1,
        "per-minute session boundary deltas: one row per minute of the "
        "dataset's time span (time domain, not row count); two-phase "
        "conversion measured 2.4x local cost for zero scale benefit (r9)",
    ),
    "pipeline_token_budget_split": (
        1,
        "largest-remainder rank over the source-domain relation: one row "
        "per source (fixed model domain); two-phase conversion measured "
        "+73% local cost for zero scale benefit (r9)",
    ),
    "stats_spearman_rho": (
        2,
        "value-marginal histograms: one row per distinct quantity / "
        "discount value (fixed model domains); two-phase conversion "
        "measured +86% local cost for zero scale benefit (r9)",
    ),
    "events_gini_concentration": (
        1,
        "count-of-counts histogram: distinct per-user event counts, "
        "O(sqrt(total events)) under any count distribution",
    ),
    "events_rate_anomaly": (1, "one row per hour (time domain)"),
    "orders_holt_forecast": (
        2,
        "row_number over the monthly relation: one row per month "
        "(time domain) — the recursive-CTE month index; the month CTE "
        "is planned twice (anchor join + final join), hence two copies",
    ),
    "orders_mom_growth": (1, "one row per month (time domain)"),
    "orders_revenue_drawdown": (
        2,
        "running-max over the day-level revenue relation: one row per "
        "calendar day (time domain); planned twice — the scalar "
        "max-drawdown branch and the output branch both read it "
        "(the orders_holt_forecast two-copy pattern)",
    ),
    "orders_survival_hazard": (1, "fixed duration-bucket grid"),
    "stats_runs_test": (
        2,
        "LAG over the day-level revenue relation (time domain); the "
        "median-crossing cumulative was converted to the two-phase scan "
        "in r9",
    ),
    "text_ngram_coverage": (
        1,
        "count-of-counts histogram over word frequencies, "
        "O(sqrt(corpus tokens)) under Zipf",
    ),
    "pipeline_dedup_roi_curve": (
        1,
        "cumulative shares over the cluster-SIZE domain (count-of-counts "
        "of head-fingerprint clusters): O(sqrt(corpus docs)) rows under "
        "any size distribution",
    ),
}


def _structural_reasons(line: str, sub: str) -> list[str]:
    reasons: list[str] = []
    if PID_ORDER.search(line):
        reasons.append("partition_offsets")
    if LIMIT.search(sub):
        reasons.append("limit")
    if SCALAR_AGG.search(sub.splitlines()[0] if sub else ""):
        reasons.append("scalar")
    return reasons


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_single_partition_window(name, spark, sf_small):
    df = QUERIES[name](spark, sf_small)
    unexplained = []
    for line, sub in explain.global_window_subtrees(df):
        if not _structural_reasons(line, sub):
            unexplained.append(line)
    allowed, why = ACKNOWLEDGED.get(name, (0, ""))
    assert len(unexplained) <= allowed, (
        f"{name}: {len(unexplained)} unpartitioned window(s) with no "
        f"structural bound (acknowledged budget {allowed}"
        f"{': ' + why if why else ''}) — a corpus-scale relation here is "
        f"the single-partition scale-killer class; restructure onto "
        f"functions/order.with_global_order or acknowledge with a "
        f"rationale.  Windows:\n" + "\n".join(unexplained)
    )
