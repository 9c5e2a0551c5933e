"""bench.py HEADLINE coverage guard: every registered query is benched
or carries a named exclusion (the r10 bench-guard-gap rule, now
enforced mechanically instead of by review)."""

from __future__ import annotations

import importlib.util
import os

from iceberg_table_generator_spark import all_queries

#: Queries deliberately NOT benched, each with a written rationale at
#: its bench.py comment.  orders_holt_forecast: ~24 sequential UnionLoop
#: job-scheduling steps (~0.5 s/step, data-size-independent) would add
#: ~11 s of constant without measuring data-path work (BENCH_NOTES_r8).
EXCLUDED = {"orders_holt_forecast"}


def _load_headline() -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_every_query_is_benched_or_excluded():
    headline = _load_headline()
    assert len(headline) == len(set(headline)), "duplicate HEADLINE entries"
    registered = set(all_queries())
    benched = set(headline)
    unknown = benched - registered
    assert not unknown, f"HEADLINE entries not in the registry: {unknown}"
    missing = registered - benched - EXCLUDED
    assert not missing, (
        f"registered queries with no bench guard and no named exclusion: "
        f"{sorted(missing)}"
    )
    stale = EXCLUDED & benched
    assert not stale, f"excluded queries that are actually benched: {stale}"
