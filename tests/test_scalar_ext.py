"""Sketch accuracy bounds: approximate aggregates must track exact ones."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.scalar_ext import approx_sketches
from iceberg_table_generator_spark.sources.tables import load_table


def test_sketch_verdicts_all_true(spark, sf_medium):
    """The registered (oracle-paired) shape: every group's HLL and
    t-digest verdicts are TRUE — i.e. both sketches sit inside the
    published relative-error bound of the exact aggregates."""
    rows = approx_sketches(spark, sf_medium).collect()
    assert rows
    assert all(r.exact_parts > 0 for r in rows)
    assert all(r.hll_ok for r in rows), rows
    assert all(r.tdigest_ok for r in rows), rows


def test_sketches_within_tolerance(spark, sf_medium):
    """Tighter Spark-side pin on the raw estimates themselves (the
    registered query only exposes the 5% verdict booleans)."""
    li = load_table(spark, sf_medium, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_median"
        ),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.05
        assert abs(r.approx_median - r.exact_median) / r.exact_median < 0.05
