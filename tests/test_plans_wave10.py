"""Plan-quality and property assertions for the round-10 operator wave
(maximal span islands, feature-space multimodal near-dup).  Correctness
twins live in the oracle gate; these pin the SCALE properties the
docstrings claim."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators import wave10
from iceberg_table_generator_spark.plans import explain


def _join_lines(df):
    return [
        ln
        for ln in explain.plan_text(df, mode="simple").splitlines()
        if "Join" in ln
    ]


def test_span_islands_join_only_on_hash(spark, sf_small):
    """The islands plan may join — but ONLY on the 60-bit span hash
    (1-row-per-key build side, no pair explosion), never on the span
    text; and every window is doc-partitioned."""
    df = wave10.dedup_span_islands(spark, sf_small)
    for ln in _join_lines(df):
        assert "span#" not in ln, ln
    assert explain.global_window_subtrees(df) == []
    assert explain.has_operator(df, "TakeOrderedAndProject")


def test_span_island_stats_single_scalar_broadcast(spark, sf_small):
    """Stats add only the scalar total-tokens broadcast on top of the
    islands plan; windows stay doc-partitioned."""
    df = wave10.dedup_span_island_stats(spark, sf_small)
    kinds = explain.join_kinds(df)
    assert kinds["BroadcastNestedLoopJoin"] <= 1, kinds
    for ln in _join_lines(df):
        assert "span#" not in ln, ln
    assert explain.global_window_subtrees(df) == []


def test_feature_simhash_runs_the_arrow_decode_path(spark, sf_small):
    """The feature-space near-dup must actually run the Arrow-batched
    decode (the content tier's whole point) and end in a bounded top-k.
    r15: the decode + fingerprint fold is one mapInArrow pass (the
    byte_stats pattern) instead of mapInPandas decode + JVM simhash."""
    df = wave10.multimodal_feature_simhash_dedup(spark, sf_small)
    txt = explain.plan_text(df, mode="simple")
    assert "MapInArrow" in txt
    assert explain.has_operator(df, "TakeOrderedAndProject")
    # the band join is on (chunk_id, chunk_val) — never payload bytes
    for ln in _join_lines(df):
        assert "payload#" not in ln, ln


def _write_docs(spark, rows, td):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(td, "documents.parquet")
    )


def test_islands_merge_planted_paragraph(spark):
    """Property (the r9→r10 delta): a duplicated 3K-token paragraph is
    reported as ONE maximal island of exactly 3K tokens per document —
    not 2K+1 overlapping fixed-k hits — and the island algebra recovers
    its exact extent."""
    k = wave10.SPAN_K
    para = " ".join(f"p{i}" for i in range(3 * k))
    rows = [
        (0, f"a0 b0 c0 {para} d0 e0"),
        (1, f"x1 y1 {para} z1 w1 v1"),
        (2, "lone doc with no duplicated content at all"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, rows, td)
        isl = wave10._span_islands(spark, td).collect()
    assert len(isl) == 2, isl
    by_doc = {r.doc_id: r for r in isl}
    assert set(by_doc) == {0, 1}
    # doc 0: paragraph starts at token 4 (1-based), doc 1: token 3
    assert (by_doc[0].token_start, by_doc[0].token_end) == (4, 3 + 3 * k)
    assert (by_doc[1].token_start, by_doc[1].token_end) == (3, 2 + 3 * k)
    for r in isl:
        assert r.token_end - r.token_start + 1 == 3 * k
        assert r.n_kspans == 2 * k + 1
        assert r.max_span_occurrences == 2


def test_island_coverage_never_double_counts(spark):
    """Two islands in one doc whose token EXTENTS overlap (positions 2
    apart, k > 2) must contribute the union of their token ranges to
    dup_tokens, not the sum of their lengths."""
    k = wave10.SPAN_K
    s1 = " ".join(f"q{i}" for i in range(k))
    s2 = " ".join(f"r{i}" for i in range(k))
    # doc 0: s1 at pos 1..k, one unique token, s2 at pos k+2..2k+1 —
    # islands at positions {1} and {k+2}; extents [1,k] and [k+2,2k+1]
    # are disjoint here, so build the OVERLAP case via a doc where the
    # two duplicated windows sit 2 positions apart:
    # doc 2: s1, then the LAST k-2 tokens of s1 again... simpler: plant
    # two copies of a k+1-token string T in docs 2 and 3, then break the
    # middle of one copy in doc 2 so its duplicated windows split into
    # two islands 2 apart with overlapping extents.
    t = " ".join(f"t{i}" for i in range(3 * k))
    rows = [
        (0, f"{s1} u0 {s2}"),
        (1, f"m1 {s1} n1 {s2}"),
        (2, f"{t} filler"),
        (3, f"pre3 {t}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, rows, td)
        stats = wave10.dedup_span_island_stats(spark, td).collect()[0]
        isl = wave10._span_islands(spark, td).collect()
    # sanity: every doc has islands; per-doc extents
    spans = sorted(
        (r.doc_id, r.token_start, r.token_end) for r in isl
    )
    # union-of-extents computed in python from the island rows
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e in spans:
        per_doc.setdefault(d, []).append((s, e))
    expect = 0
    for ranges in per_doc.values():
        covered: set[int] = set()
        for s, e in ranges:
            covered.update(range(s, e + 1))
        expect += len(covered)
    assert stats.dup_tokens == expect
    assert stats.n_islands == len(isl)


def test_frame_motion_runs_arrow_decode_with_partitioned_windows(
    spark, sf_small
):
    df = wave10.multimodal_frame_motion_profile(spark, sf_small)
    txt = explain.plan_text(df, mode="simple")
    assert "MapInPandas" in txt
    assert explain.global_window_subtrees(df) == []


def test_siegel_tukey_uses_deterministic_bucket_order(spark, sf_small):
    """The pooled dispersion ranks must come from the two-phase order
    (hashpartitioning on the literal-boundary _bkt), never a
    single-partition window over the fact relation."""
    df = wave10.stats_siegel_tukey(spark, sf_small)
    txt = explain.plan_text(df, mode="simple")
    assert "hashpartitioning(_bkt" in txt
    for line, sub in explain.global_window_subtrees(df):
        assert "_bkt" in line, line


def test_siegel_tukey_rank_is_a_permutation(spark):
    """The alternating-extreme rank CASE must be a permutation of 1..n
    for both parities of n."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.wave10 import _ST_RANK

    for n in (7, 8, 1, 2, 1001):
        got = (
            spark.range(1, n + 1)
            .selectExpr(f"id AS pos", f"{n}::long AS n")
            .selectExpr(f"{_ST_RANK} AS r")
        )
        agg = got.agg(
            F.countDistinct("r").alias("d"),
            F.min("r").alias("lo"),
            F.max("r").alias("hi"),
        ).first()
        assert (agg.d, agg.lo, agg.hi) == (n, 1, n), (n, agg)


def test_harmonic_centrality_on_planted_graph(spark):
    """Path graph 1-2-3 planted via user navigation sequences: harmonic
    of the middle node is 1/1 + 1/1 = 2; the ends get 1 + 1/2."""
    import datetime
    import os
    import tempfile

    from iceberg_table_generator_spark.operators.wave10 import HC_LCM

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # one user walks 1 -> 2 -> 3 (undirected path graph)
        (1, base, 1, '{"k": 1}'),
        (1, base + datetime.timedelta(minutes=1), 2, '{"k": 2}'),
        (1, base + datetime.timedelta(minutes=2), 3, '{"k": 3}'),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, props string"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.node: (r.n_reached, r[f"harmonic_{HC_LCM}"])
            for r in wave10.events_harmonic_centrality(spark, td).collect()
        }
    assert got[2] == (2, 2 * HC_LCM)
    assert got[1] == (2, HC_LCM + HC_LCM // 2)
    assert got[3] == (2, HC_LCM + HC_LCM // 2)
