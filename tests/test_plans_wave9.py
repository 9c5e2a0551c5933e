"""Plan-quality assertions for the round-9 operator wave (the
correctness twin lives in the oracle gate; these pin the SCALE
properties the docstrings claim)."""

from __future__ import annotations

from iceberg_table_generator_spark.operators import wave9
from iceberg_table_generator_spark.plans import explain


def test_span_dedup_never_joins_on_the_span(spark, sf_small):
    """The Lee-et-al span pass must be join-free: one span-keyed groupBy
    (map-side combinable) and a global top-k — no posting-list join, no
    shingle-keyed skew join anywhere in the plan."""
    df = wave9.dedup_span_exact(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds
    assert explain.has_operator(df, "TakeOrderedAndProject")
    assert explain.global_window_subtrees(df) == []


def test_span_stats_is_join_free_rollup(spark, sf_small):
    df = wave9.dedup_span_stats(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def _only_pid_offset_windows(df):
    """Every unpartitioned window must be the two-phase order's internal
    offset prefix over per-partition totals (orders on _pid, <= cluster
    size rows) — the same `partition_offsets` bounded category the
    repo-wide window-invariant suite applies."""
    return [
        (line, sub)
        for line, sub in explain.global_window_subtrees(df)
        if "windowspecdefinition(_pid#" not in line
    ]


def test_lorenz_runs_on_range_shuffle_not_global_window(spark, sf_small):
    """The fact-table Lorenz curve must be the two-phase order: a range
    exchange, NO single-partition window over the fact relation, the
    offset/total relations broadcast, and the scan pruned to exactly the
    four columns used."""
    df = wave9.lineitem_lorenz_deciles(spark, sf_small)
    assert _only_pid_offset_windows(df) == []
    assert "rangepartitioning" in explain.plan_text(df, mode="simple").lower()
    kinds = explain.join_kinds(df)
    # One BNLJ is the broadcast crossJoin against the single-row
    # (n_total, t_rev) scalar aggregate — the repo's scalar-broadcast
    # pattern; anything beyond that (or any sort-merge) is a regression.
    assert kinds["BroadcastNestedLoopJoin"] <= 1, kinds
    assert kinds["SortMergeJoin"] == 0, kinds
    for cols in explain.read_schemas(df):
        assert set(cols) <= {
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "l_discount",
        }, cols


def test_gini_positions_avoid_global_window(spark, sf_small):
    df = wave9.customer_gini_spend(spark, sf_small)
    assert _only_pid_offset_windows(df) == []
    assert "rangepartitioning" in explain.plan_text(df, mode="simple").lower()
