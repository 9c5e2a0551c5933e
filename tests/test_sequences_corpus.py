"""Behavioral invariants for the round-7 sequence/corpus/graph operators.

The oracle pack already hash-checks every query against DuckDB; these
tests pin the MATHEMATICAL contracts the hash can't express — probability
mass, monotone dedup tiers, coverage monotonicity, core-degree lower
bounds — so a future edit that changes both engines in the same wrong way
still fails CI.
"""

from __future__ import annotations

from iceberg_table_generator_spark import all_queries

QUERIES = all_queries()


def _rows(name, spark, sf):
    return QUERIES[name](spark, sf).collect()


def test_markov_probability_mass(spark, sf_small):
    rows = _rows("events_markov_transitions", spark, sf_small)
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, grp in by_from.items():
        total = sum(r.prob_micro for r in grp)
        # Each term floors, so the mass can fall short by < one micro-unit
        # per destination but never exceed 1e6.
        assert 1_000_000 - len(grp) < total <= 1_000_000, from_type
        assert grp[0].n_from == sum(r.n_transitions for r in grp)


def test_gini_bounds(spark, sf_small):
    (row,) = _rows("events_gini_concentration", spark, sf_small)
    assert 0 <= row.gini_micro < 1_000_000
    assert row.n_users > 0 and row.total_events >= row.n_users


def test_cooccurrence_counts_consistent(spark, sf_small):
    for r in _rows("events_cooccurrence_lift", spark, sf_small):
        assert r.type_a < r.type_b
        assert 0 < r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_dedup_cascade_monotone(spark, sf_small):
    (row,) = _rows("pipeline_dedup_cascade", spark, sf_small)
    # Looser identities can only merge more: exact >= bag-of-words, and
    # exact >= 8-token-prefix; every tier is bounded by the corpus.
    assert row.n_raw >= row.n_exact >= row.n_bow
    assert row.n_exact >= row.n_prefix8
    assert row.exact_keep_micro <= 1_000_000


def test_coverage_monotone_in_k(spark, sf_small):
    rows = sorted(
        _rows("text_ngram_coverage", spark, sf_small), key=lambda r: r.k
    )
    cov = [r.coverage_micro for r in rows]
    assert cov == sorted(cov)
    assert all(0 < c <= 1_000_000 for c in cov)
    for r in rows:
        assert r.n_vocab_used <= r.k


def test_epoch_shards_partition_the_corpus(spark, sf_small):
    rows = _rows("pipeline_epoch_shuffle", spark, sf_small)
    docs = QUERIES["dedup_exact"](spark, sf_small).count()
    assert sum(r.n_docs for r in rows) == docs
    assert {r.shard for r in rows} <= set(range(8))
    for r in rows:
        assert r.min_key <= r.max_key


def test_kcore_degrees_meet_threshold(spark, sf_small):
    from iceberg_table_generator_spark.operators.graph import KCORE_K

    rows = _rows("events_kcore_membership", spark, sf_small)
    assert rows, "3-core unexpectedly empty on the test graph"
    for r in rows:
        assert r.core_degree >= KCORE_K


def test_minhash_error_bounded(spark, sf_small):
    rows = _rows("dedup_minhash_error_audit", spark, sf_small)
    assert rows
    for r in rows:
        assert -1_000_000 <= r.min_err_micro <= r.max_err_micro <= 1_000_000
        assert 0 <= r.err_bucket <= 32


def test_boilerplate_support_threshold(spark, sf_small):
    from iceberg_table_generator_spark.operators.corpus import (
        BOILERPLATE_MIN_DOCS,
        BOILERPLATE_TOP_K,
    )

    rows = _rows("text_boilerplate_ngrams", spark, sf_small)
    assert 0 < len(rows) <= BOILERPLATE_TOP_K
    for r in rows:
        assert r.n_docs >= BOILERPLATE_MIN_DOCS
        assert r.n_occurrences >= r.n_docs


def test_cluster_stats_share_sums_to_one(spark, sf_small):
    rows = _rows("similarity_cluster_stats", spark, sf_small)
    total_share = sum(r.share_micro for r in rows)
    # Per-cluster floor rounding: short by < one micro-unit per cluster.
    assert 1_000_000 - len(rows) < total_share <= 1_000_000
    for r in rows:
        assert r.min_d2 <= r.max_d2
        assert r.inertia >= r.n_vectors * r.min_d2
