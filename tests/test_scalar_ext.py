"""Sketch accuracy bounds: approximate aggregates must track exact ones."""

from __future__ import annotations

from iceberg_table_generator_spark.operators.scalar_ext import approx_sketches


def test_sketches_within_tolerance(spark, sf_medium):
    rows = approx_sketches(spark, sf_medium).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.05
        assert abs(r.approx_median - r.exact_median) / r.exact_median < 0.05
