"""Algebraic invariants of the mining/BI pack (beyond the oracles)."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.mining import (
    events_twap_hourly,
    orders_open_backlog,
    orders_perfect_rate,
    supplier_scorecard,
)
from iceberg_table_generator_spark.sources.tables import load_table


def test_backlog_sweep_closes_at_zero(spark, sf_small):
    """Every order eventually ships, so the sweep line must return to zero
    at the last grid month, and the running count can never go negative."""
    out = orders_open_backlog(spark, sf_small).toPandas().sort_values("month")
    assert (out["open_backlog"] >= 0).all()
    assert out["open_backlog"].iloc[-1] == 0
    assert out["started"].sum() == out["shipped"].sum()


def test_perfect_rate_bounds_and_totals(spark, sf_small):
    out = orders_perfect_rate(spark, sf_small).toPandas()
    assert ((out["perfect_rate"] >= 0) & (out["perfect_rate"] <= 1)).all()
    assert (out["perfect_orders"] <= out["n_orders"]).all()
    n_orders = (
        load_table(spark, sf_small, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert out["n_orders"].sum() == n_orders


def test_twap_within_hourly_value_range(spark, sf_small):
    """A time-weighted average is a convex combination of the hour's
    observations: min ≤ twap ≤ max for every hour."""
    twap = events_twap_hourly(spark, sf_small)
    rng = (
        load_table(spark, sf_small, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    joined = twap.join(rng, "window_start").toPandas()
    eps = 1e-6  # output rounding
    assert ((joined["twap"] >= joined["lo"] - eps) & (joined["twap"] <= joined["hi"] + eps)).all()


def test_scorecard_composite_consistent(spark, sf_small):
    out = supplier_scorecard(spark, sf_small).toPandas()
    assert (out["composite"] == out["rev_rank"] + 2 * out["return_rank"]).all()
    assert out["composite"].is_monotonic_increasing
