"""Structural invariants of the PageRank operator (beyond the oracle).

The oracle pins bit-exactness against DuckDB; these pin the *algebraic*
properties that must survive any refactor of the integer scheme.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.graph import (
    PR_BASE,
    PR_SCALE,
    events_pagerank,
)


def test_pagerank_mass_and_floor(spark, sf_small):
    out = events_pagerank(spark, sf_small).toPandas()
    n = len(out)
    assert n > 0
    # Every node keeps at least the teleport term.
    assert (out["rank_micro"] >= PR_BASE).all()
    # Mass conservation upper bound: integer division and dangling nodes
    # only LOSE mass, so total rank never exceeds the initial N·SCALE.
    assert out["rank_micro"].sum() <= n * PR_SCALE
    # The damped share actually circulates: some node must sit above the
    # teleport-only floor (the transition graph is non-degenerate).
    assert (out["rank_micro"] > PR_BASE).any()


def test_pagerank_deterministic_across_builds(spark, sf_small):
    a = events_pagerank(spark, sf_small).toPandas().sort_values("node")
    b = events_pagerank(spark, sf_small).toPandas().sort_values("node")
    assert a["rank_micro"].tolist() == b["rank_micro"].tolist()
