"""Drift-normalized mover tagging (r13 verdict #2): a raw >1.5x mover
that the measured host drift explains must be tagged `host`, not `code`;
a mover that survives normalization is `code`."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench_movers", Path(__file__).parent.parent / "scripts" / "bench_movers.py"
)
bench_movers = importlib.util.module_from_spec(_spec)
sys.modules["bench_movers"] = bench_movers
_spec.loader.exec_module(bench_movers)


def _full(queries, cal=None):
    d = {"queries": dict(queries)}
    if cal is not None:
        d["calibration"] = [{"at": f"p{i}", "sec": s} for i, s in enumerate(cal)]
    return d


def test_host_drift_mover_is_tagged_host():
    # Host got 1.6x slower (calibration 1.0 -> 1.6); a query that slowed
    # exactly with the host is raw-mover 1.6 but norm 1.0 -> host tag.
    old = _full({"q": 2.0, "stable": 1.0}, cal=[1.0, 1.0, 1.0])
    new = _full({"q": 3.2, "stable": 1.6}, cal=[1.6, 1.6, 1.6])
    rows, summary = bench_movers.compare(old, new, 1.5, 1.0, 0.3)
    assert summary["drift"] == 1.6
    by = {r["query"]: r for r in rows}
    assert by["q"]["tag"] == "host"
    assert by["q"]["norm_ratio"] == 1.0
    # |delta| of `stable` is 0.6s < min_sec -> no tag even though raw 1.6x
    assert by["stable"]["tag"] == ""


def test_code_mover_survives_normalization():
    old = _full({"q": 2.0}, cal=[1.0])
    new = _full({"q": 5.0}, cal=[1.1])  # host only 10% slower
    rows, _ = bench_movers.compare(old, new, 1.5, 1.0, 0.3)
    assert rows[0]["tag"] == "code"
    assert rows[0]["norm_ratio"] > 2.0


def test_floor_and_missing_queries_skipped():
    old = _full({"tiny": 0.1, "gone": 2.0, "kept": 1.0}, cal=[1.0])
    new = _full({"tiny": 0.4, "kept": 1.0}, cal=[1.0])
    rows, summary = bench_movers.compare(old, new, 1.5, 1.0, 0.3)
    assert [r["query"] for r in rows] == ["kept"]
    assert summary["n_compared"] == 1


def test_fallback_calibration_uses_sentinel_query():
    q = bench_movers.CALIBRATION_QUERY
    old = _full({q: 1.0, "x": 2.0})  # pre-sentinel file: no calibration key
    new = _full({q: 2.0, "x": 4.0}, cal=[2.0])
    rows, summary = bench_movers.compare(old, new, 1.5, 1.0, 0.3)
    assert summary["old_calibration"] == (1.0, "fallback:in-bench")
    assert summary["drift"] == 2.0
    by = {r["query"]: r for r in rows}
    assert by["x"]["tag"] == "host"  # 2x raw, fully explained by drift
