"""functions/order.py: the distributed global-order primitive must be
bit-identical to the single-partition window it replaces, its plan must
contain NO unpartitioned window over the input relation, and — the r10
determinism contract — its answer must NOT depend on cache residency:
bucket ids are pure expressions over literal boundaries, so recompute
after a full cache wipe (the executor-loss simulation) is bit-equal."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from iceberg_table_generator_spark.functions.order import (
    ntile_expr,
    range_boundaries,
    sort_cols,
    with_global_order,
)
from iceberg_table_generator_spark.plans import explain


def _toy(spark, n=997):
    # Deterministic, collision-rich values (ties on v resolved by id) and
    # a negative-value column so cumsum offsets exercise sign handling.
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * 37 + 11, F.lit(101)).alias("v"),
        (F.pmod(F.col("id") * 53, F.lit(19)) - 9).alias("signed"),
    )


def test_matches_global_window_pos_and_cumsum(spark):
    df = _toy(spark)
    order = [("v", False), ("id", True)]
    got = with_global_order(
        df, order, cums=[(F.col("signed"), "cum_signed")], pos="pos"
    )
    w = Window.orderBy(*sort_cols(order))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("pos"),
        F.sum("signed").over(run).alias("cum_signed"),
    )
    joined = got.select("id", "pos", "cum_signed").join(
        want.withColumnsRenamed({"pos": "wpos", "cum_signed": "wcum"}), "id"
    )
    bad = joined.filter(
        (F.col("pos") != F.col("wpos")) | (F.col("cum_signed") != F.col("wcum"))
    )
    assert bad.count() == 0
    assert got.count() == df.count()


@pytest.mark.parametrize("n,k", [(997, 4), (8, 3), (3, 7), (100, 10)])
def test_ntile_expr_matches_spark_ntile(spark, n, k):
    df = _toy(spark, n)
    order = [("v", False), ("id", True)]
    got = (
        with_global_order(df, order, pos="pos")
        .withColumn("n_total", F.lit(n).cast("long"))
        .select("id", ntile_expr("pos", "n_total", k).alias("tile"))
    )
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy(*sort_cols(order))).alias("wtile")
    )
    bad = (
        got.join(want, "id")
        .filter(F.col("tile") != F.col("wtile"))
        .count()
    )
    assert bad == 0


def test_no_global_window_in_plan(spark):
    df = _toy(spark)
    got = with_global_order(
        df, [("v", True), ("id", True)], cums=[(F.col("v"), "cv")]
    )
    # The only unpartitioned window allowed is the offset prefix over the
    # per-bucket totals — bounded by configuration, keyed on _bkt.
    for line, sub in explain.global_window_subtrees(got):
        assert "_bkt" in line, f"unexpected global window: {line}\n{sub}"


def test_nullable_cumsum_matches_window_null_semantics(spark):
    """SUM ignores nulls: a bucket whose leading values are all NULL must
    inherit the cross-bucket offset (not poison it to NULL), and only an
    all-NULL global prefix stays NULL — exactly the window form."""
    # Nulls concentrated at the FRONT of the global order so the first
    # bucket's local running sum is NULL while later offsets are not.
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") < 40, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 7)
        .alias("val"),
    )
    order = [("id", True)]
    got = with_global_order(
        df.repartition(8), order, cums=[(F.col("val"), "cum_val")], pos="pos"
    )
    w = Window.orderBy(*sort_cols(order)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("id", F.sum("val").over(w).alias("wcum"))
    joined = got.select("id", "cum_val").join(want, "id")
    bad = joined.filter(
        ~(
            (F.col("cum_val") == F.col("wcum"))
            | (F.col("cum_val").isNull() & F.col("wcum").isNull())
        )
    )
    assert bad.count() == 0
    # the all-null global prefix really is NULL in both forms
    assert (
        joined.filter(F.col("id") < 40)
        .filter(F.col("cum_val").isNotNull())
        .count()
        == 0
    )


def test_null_sort_keys_bucket_correctly(spark):
    """Sort-KEY nulls must land in the right bucket relative to literal
    boundaries: asc ⇒ nulls first (before every non-null boundary), desc ⇒
    nulls last (after every boundary) — checked against the window form,
    for both directions, with nulls dense enough to cross boundaries."""
    df = spark.range(500).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 23)
        .alias("v"),
    )
    for asc in (True, False):
        order = [("v", asc), ("id", True)]
        got = with_global_order(df, order, pos="pos")
        w = Window.orderBy(*sort_cols(order))
        want = df.select(
            "id", F.row_number().over(w).cast("long").alias("wpos")
        )
        assert (
            got.join(want, "id").filter(F.col("pos") != F.col("wpos")).count()
            == 0
        ), f"asc={asc}"


def test_recompute_after_cache_wipe_is_bit_equal(spark):
    """The r10 determinism contract (r9 verdict lead item): the bucket id
    is a pure expression over literal boundaries, so recomputing the WHOLE
    plan from lineage — every cached block dropped, simulating executor
    loss / release_tracked() + a second action — yields the identical
    positions.  Under the r9 design (repartitionByRange + persist) this
    test would be flaky-wrong: a fresh range-sampler run could place the
    rank and offset branches on different partitionings."""
    df = _toy(spark, 50_000)
    order = [("v", False), ("id", True)]
    got = with_global_order(df, order, pos="pos")
    w = Window.orderBy(*sort_cols(order))
    want = df.select("id", F.row_number().over(w).cast("long").alias("wpos"))

    first = got.join(want, "id").filter(F.col("pos") != F.col("wpos")).count()
    assert first == 0
    # Simulate total cache loss between actions: every block gone, the
    # next action recomputes both branches from lineage.
    spark.catalog.clearCache()
    for _ in range(3):
        assert (
            got.join(want, "id").filter(F.col("pos") != F.col("wpos")).count()
            == 0
        )
        spark.catalog.clearCache()
    # positions are a permutation of 1..n even after recompute
    n = df.count()
    agg = got.agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("pos").alias("d"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
    ).first()
    assert (agg.c, agg.d, agg.lo, agg.hi) == (n, n, 1, n)


def _cut_point(b):
    """A boundary's cut point in the (lead, tie) prefix order: scalar v
    cuts at (v, +sup) — after every tie of v — composite (v, t) at (v, t).
    +sup is modeled as a sentinel that _cmp-compares greater than every
    real tie value via the tuple second-pass below."""
    return b if isinstance(b, tuple) else (b, _SUP)


_SUP = object()


def _cmp_cut(order, a, b):
    from iceberg_table_generator_spark.functions.order import _cmp_lead

    c = _cmp_lead(order[0][1], a[0], b[0])
    if c != 0:
        return c
    if a[1] is _SUP and b[1] is _SUP:
        return 0
    if a[1] is _SUP:
        return 1
    if b[1] is _SUP:
        return -1
    return _cmp_lead(order[1][1], a[1], b[1])


def test_boundaries_are_bounded_sorted_and_deduped(spark):
    df = _toy(spark, 10_000).persist()
    try:
        order = [("v", True), ("id", True)]
        # 10k rows / 4096-per-bucket floor => 3 effective buckets max
        bounds = range_boundaries(df, order, 32)
        assert 0 < len(bounds) <= 2, bounds
        for a, b in zip(bounds, bounds[1:]):
            assert _cmp_cut(order, _cut_point(a), _cut_point(b)) < 0
        # large n_buckets request on a big-enough relation caps at config
        big = spark.range(200_000).selectExpr(
            "id", "id % 977 AS v"
        ).persist()
        try:
            big_order = [("v", True), ("id", True)]
            bb = range_boundaries(big, big_order, 32)
            assert 0 < len(bb) <= 31
            for a, b in zip(bb, bb[1:]):
                assert _cmp_cut(big_order, _cut_point(a), _cut_point(b)) < 0
        finally:
            big.unpersist()
        # empty relation ⇒ no boundaries ⇒ single bucket
        empty = df.filter(F.lit(False))
        assert range_boundaries(empty, order, 32) == []
    finally:
        df.unpersist()


def test_tie_heavy_leading_column_keeps_bucket_parallelism(spark):
    """r11 lead item (r10 VERDICT what's-wrong #1): a leading column where
    ONE value covers half the relation (the Zipf hapax shape: cnt=1 over
    ~half the vocabulary) must not collapse into a single bucket — the
    duplicated boundaries become (lead, tiebreak) composites and the
    tie block splits by the tiebreak.  Done-criterion: ≥ n_buckets/2
    non-empty buckets on the tie-heavy fixture, and positions stay
    bit-equal to the single-partition window."""
    from iceberg_table_generator_spark.functions.order import (
        capture_bucket_histograms,
    )

    n = 60_000
    # half the rows share lead=1; the rest spread over 1000 values
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") < n // 2, F.lit(1))
        .otherwise(2 + F.pmod(F.col("id") * 31, F.lit(1000)))
        .alias("cnt"),
    )
    order = [("cnt", True), ("id", True)]
    sink: list[dict] = []
    with capture_bucket_histograms(sink):
        got = with_global_order(df, order, pos="pos")
        w = Window.orderBy(*sort_cols(order))
        want = df.select(
            "id", F.row_number().over(w).cast("long").alias("wpos")
        )
        assert (
            got.join(want, "id").filter(F.col("pos") != F.col("wpos")).count()
            == 0
        )
    (h,) = sink
    assert h["n_composite"] > 0, h  # ties detected -> composites emitted
    assert h["n_buckets"] == h["n_bounds"] + 1, h
    # `counts` holds only POPULATED buckets (the totals groupBy can't see
    # empties) — the verdict bar is that at least half the boundary-defined
    # buckets received rows, i.e. the modal tie block really split.
    populated = len(h["counts"])
    assert populated >= h["n_buckets"] / 2, h
    # the modal block must NOT be one bucket: max share well below 50%+
    assert h["max_share"] < 0.30, h


def test_nan_leading_values_sort_and_bucket_like_spark(spark):
    """r10 ADVICE low: NaN is Spark's greatest non-null numeric.  The
    driver comparator must rank it consistently (else the boundary list
    breaks its strictly-increasing invariant) and bucketing must stay
    bit-equal to the window for a NaN-dense column, both directions."""
    from iceberg_table_generator_spark.functions.order import _cmp_lead

    nan = float("nan")
    for asc in (True, False):
        assert _cmp_lead(asc, nan, nan) == 0
        assert _cmp_lead(asc, nan, 1.0) == (1 if asc else -1)
        assert _cmp_lead(asc, 1.0, nan) == (-1 if asc else 1)
        # None stays outermost: asc nulls first, desc nulls last
        assert _cmp_lead(asc, None, nan) == (-1 if asc else 1)
        assert _cmp_lead(asc, nan, None) == (1 if asc else -1)
    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, F.lit(nan))
        .when(F.col("id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise((F.pmod(F.col("id") * 13, F.lit(97))).cast("double"))
        .alias("v"),
    )
    for asc in (True, False):
        order = [("v", asc), ("id", True)]
        got = with_global_order(df, order, pos="pos")
        w = Window.orderBy(*sort_cols(order))
        want = df.select(
            "id", F.row_number().over(w).cast("long").alias("wpos")
        )
        assert (
            got.join(want, "id").filter(F.col("pos") != F.col("wpos")).count()
            == 0
        ), f"asc={asc}"


def test_boundary_source_and_precomputed_count_are_result_neutral(spark):
    """r11 amortization (r10 VERDICT #2): boundary jobs redirected to a
    same-rows source relation, and a caller-supplied count, must produce
    the identical positions — boundaries only affect balance."""
    base = _toy(spark, 30_000).persist()
    try:
        n = base.count()
        order = [("v", False), ("id", True)]
        # chained call: order the ENRICHED frame, boundaries from base
        enriched = with_global_order(
            base, order, pos="p1", precomputed_count=n
        )
        got = with_global_order(
            enriched,
            [("signed", True), ("id", True)],
            pos="p2",
            boundary_source=base,
            precomputed_count=n,
        )
        w = Window.orderBy(*sort_cols([("signed", True), ("id", True)]))
        want = base.select(
            "id", F.row_number().over(w).cast("long").alias("wp")
        )
        assert (
            got.join(want, "id").filter(F.col("p2") != F.col("wp")).count()
            == 0
        )
    finally:
        base.unpersist()


def test_offset_branch_sees_the_same_partitioning(spark):
    """Regression (r9, redesigned r10): the rank branch and the offset
    branch must agree on row→bucket assignment.  r9 pinned this with a
    correctness-required persist; r10 makes the bucket a deterministic
    literal-boundary expression, so agreement holds by construction — but
    keep the behavioral pin (bit-equality to the single-partition window
    across repeated runs on a relation large enough that the old sampler
    was observably ambiguous), plus the perf persist's presence."""
    df = _toy(spark, 50_000)
    order = [("v", False), ("id", True)]
    got = with_global_order(df, order, pos="pos")
    assert "InMemoryTableScan" in explain.plan_text(got, mode="simple")
    w = Window.orderBy(*sort_cols(order))
    want = df.select("id", F.row_number().over(w).cast("long").alias("wpos"))
    for _ in range(3):
        joined = with_global_order(df, order, pos="pos").join(want, "id")
        assert joined.filter(F.col("pos") != F.col("wpos")).count() == 0
