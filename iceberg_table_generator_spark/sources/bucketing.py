"""Bucketed tables: co-located fact-fact joins with zero shuffle.

The orders ⋈ lineitem join is the engine's biggest shuffle (both sides
hash-exchange on orderkey).  Pre-bucketing both tables on the join key —
`bucketBy(n, key)` + `sortBy(key)` — persists that partitioning, so every
subsequent join/aggregation on the key runs with NO exchange at all: each
task reads bucket i of both tables and merges.

At 100 TB this converts the recurring shuffle cost of every downstream join
into a one-time write cost; it is the Spark-native equivalent of Iceberg's
bucket partition transform.  Bucket count rule of thumb: total size /
bucket ≈ 100-500 MB, and both tables MUST agree on count and key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_table_generator_spark.sources.tables import load_table


def create_bucketed_pair(
    spark: SparkSession, sf_dir: str, base_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Write orders and lineitem bucketed+sorted on orderkey; returns the
    registered table names.  (Bucketing metadata lives in the session
    catalog; production would register in a shared metastore/Iceberg.)"""
    names = ("bucketed_orders", "bucketed_lineitem")
    for name, table, key in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, sf_dir, table)
            .write.mode("overwrite")
            .option("path", f"{base_dir}/{name}")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    return names


def bucketed_join_revenue(spark: SparkSession) -> DataFrame:
    """orders ⋈ lineitem on the bucketed key → revenue per orderstatus.
    With both sides bucketed+sorted on orderkey the plan contains no
    Exchange for the join (asserted in tests/test_bucketing.py)."""
    o = spark.table("bucketed_orders")
    li = spark.table("bucketed_lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)"))
                .cast("double"),
                2,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
