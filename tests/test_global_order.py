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


def test_boundaries_are_bounded_sorted_and_deduped(spark):
    df = _toy(spark, 10_000).persist()
    try:
        order = [("v", True), ("id", True)]
        # 10k rows / 4096-per-bucket floor => 3 effective buckets max
        bounds = range_boundaries(df, order, 32)
        assert 0 < len(bounds) <= 2, bounds
        from iceberg_table_generator_spark.functions.order import _cmp_lead

        for a, b in zip(bounds, bounds[1:]):
            assert _cmp_lead(True, a, b) < 0
        # large n_buckets request on a big-enough relation caps at config
        big = spark.range(200_000).selectExpr(
            "id", "id % 977 AS v"
        ).persist()
        try:
            bb = range_boundaries(big, [("v", True), ("id", True)], 32)
            assert 0 < len(bb) <= 31
            for a, b in zip(bb, bb[1:]):
                assert _cmp_lead(True, a, b) < 0
        finally:
            big.unpersist()
        # empty relation ⇒ no boundaries ⇒ single bucket
        empty = df.filter(F.lit(False))
        assert range_boundaries(empty, order, 32) == []
    finally:
        df.unpersist()


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
