"""functions/order.py: the distributed global-order primitive must be
bit-identical to the single-partition window it replaces, and its plan
must contain NO unpartitioned window over the input relation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from iceberg_table_generator_spark.functions.order import (
    ntile_expr,
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
    order = [F.desc("v"), F.asc("id")]
    got = with_global_order(
        df, order, cums=[(F.col("signed"), "cum_signed")], pos="pos"
    )
    w = Window.orderBy(*order)
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
    order = [F.desc("v"), F.asc("id")]
    got = (
        with_global_order(df, order, pos="pos")
        .withColumn("n_total", F.lit(n).cast("long"))
        .select("id", ntile_expr("pos", "n_total", k).alias("tile"))
    )
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy(*order)).alias("wtile")
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
        df, [F.asc("v"), F.asc("id")], cums=[(F.col("v"), "cv")]
    )
    # The only unpartitioned window allowed is the offset prefix over the
    # per-partition totals — bounded by cluster size, keyed on _pid.
    for line, sub in explain.global_window_subtrees(got):
        assert "_pid" in line, f"unexpected global window: {line}\n{sub}"


def test_nullable_cumsum_matches_window_null_semantics(spark):
    """SUM ignores nulls: a partition whose leading values are all NULL
    must inherit the cross-partition offset (not poison it to NULL), and
    only an all-NULL global prefix stays NULL — exactly the window form."""
    # Nulls concentrated at the FRONT of the global order so the first
    # partition's local running sum is NULL while later offsets are not.
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") < 40, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 7)
        .alias("val"),
    )
    order = [F.asc("id")]
    got = with_global_order(
        df.repartition(8), order, cums=[(F.col("val"), "cum_val")], pos="pos"
    )
    w = Window.orderBy(*order).rowsBetween(
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


def test_offset_branch_sees_the_same_partitioning(spark):
    """Regression (r9): Spark's range sampler is nondeterministic across
    executions and ReuseExchange does not dedupe the range exchange, so
    without the internal persist the offset branch could aggregate a
    DIFFERENT partitioning than the rank branch (observed live at sf0.1:
    rfm_segments 71 rows vs the window form's 63).  Pin (a) the persist
    is in the plan, and (b) positions are a permutation of 1..n and
    bit-equal to the single-partition window across repeated runs on a
    relation large enough for ambiguous sampling."""
    from iceberg_table_generator_spark.plans import explain

    df = _toy(spark, 50_000)
    order = [F.desc("v"), F.asc("id")]
    got = with_global_order(df, order, pos="pos")
    assert "InMemoryTableScan" in explain.plan_text(got, mode="simple")
    w = Window.orderBy(*order)
    want = df.select("id", F.row_number().over(w).cast("long").alias("wpos"))
    for _ in range(3):
        joined = with_global_order(df, order, pos="pos").join(want, "id")
        assert joined.filter(F.col("pos") != F.col("wpos")).count() == 0
