"""Salted join/agg must equal their plain equivalents on skewed data."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.skew import salt_join, salted_count


def _skewed_df(spark, n=20000):
    # 90% of rows share key 7 — a pathological hot key
    return spark.range(n).select(
        F.when(F.pmod("id", F.lit(10)) < 9, 7).otherwise(F.pmod("id", F.lit(100)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salt_join_equals_plain_join(spark):
    left = _skewed_df(spark)
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = left.join(right, "k").select("k", "payload", "dim_val")
    salted = salt_join(left, right, on="k").select("k", "payload", "dim_val")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_count_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {(r.k, r.n) for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {(r.k, r.n) for r in salted_count(df, "k").collect()}
    assert salted == plain


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Partition-dir layouts must prune at the scan (PartitionFilters)."""
    from iceberg_table_generator_spark.datagen.records import orders
    from iceberg_table_generator_spark.plans.explain import plan_text

    orders(spark, 3000, seed=5).write.partitionBy("order_year").parquet(
        str(tmp_path / "orders_part")
    )
    df = spark.read.parquet(str(tmp_path / "orders_part")).filter(
        F.col("order_year") == 2020
    )
    text = plan_text(df)
    assert "PartitionFilters" in text
    assert "order_year" in text.split("PartitionFilters", 1)[1][:200]
    # and the filter is NOT also a data filter (pure metadata pruning)
    years = {r.order_year for r in df.select("order_year").distinct().collect()}
    assert years == {2020}
