"""Contract tests for sources.tables.spread (r6): widen under-split scans
for per-row-heavy work WITHOUT ever injecting a corpus shuffle at scale."""

from __future__ import annotations

from iceberg_table_generator_spark.sources.tables import load_table, spread


def test_spread_widens_single_partition_scan(spark, sf_small):
    df = load_table(spark, sf_small, "documents")
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    widened = spread(df)
    assert (
        widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_spread_is_noop_when_already_split(spark, sf_small):
    n = spark.sparkContext.defaultParallelism
    df = load_table(spark, sf_small, "documents").repartition(n)
    # Already at cluster parallelism: spread must return the SAME plan —
    # at 100 TB an extra repartition here would be a full-corpus shuffle.
    assert spread(df) is df

    wider = load_table(spark, sf_small, "documents").repartition(n * 2)
    assert spread(wider) is wider
