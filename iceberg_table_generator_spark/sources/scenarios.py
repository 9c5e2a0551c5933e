"""Reference generation scenarios re-expressed on the lifecycle layer.

Each function mirrors one scenario from `Main.java` (the reference CLI's
fluent chains, `Main.java:118-134`): deterministic datagen (datagen/records)
+ versioned-table commits (sources/lifecycle).  Scenario = a sequence of
single-operation commits, exactly the reference's `create→append→commit→
delete→commit` cadence (one logical op per snapshot, SURVEY.md D5).

The golden scenario `products_with_deletes` reproduces the reference's
hand-verified ledger (`Main.java:328-354`, FIXTURES.md A2): 1,000 rows
inserted, 550 deleted across five predicates → 450 visible rows, with every
intermediate running total asserted in tests/test_lifecycle.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from iceberg_table_generator_spark.datagen import records as R
from iceberg_table_generator_spark.sources.lifecycle import ParquetSnapshotTable

ORDERS_COLUMNS = ["order_id", "order_year", "order_date", "source_id", "product_name", "amount"]
PRODUCTS_COLUMNS = ["product_id", "name", "category", "color", "created_date", "weight", "quantity"]


def create_small_orders(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """`createSmallOrders` (`Main.java:136-147`): identity-partitioned by
    order_year, 2 files × 100 rows per partition, one append snapshot per
    partition batch."""
    t = ParquetSnapshotTable(spark, path).create(ORDERS_COLUMNS, partition_by=["order_year"])
    for year in (2019, 2020, 2021):
        df = R.orders(spark, 200, seed=42 + year).withColumn("order_year", F.lit(year))
        t.append(df, num_files=2)
    return t


def create_unpartitioned_orders_with_deletes(
    spark: SparkSession, path: str, n: int = 1000, n_delete_commits: int = 10
) -> ParquetSnapshotTable:
    """`createLargeUnpartitionedOrdersWithDeletes` shape (`Main.java:311-326`):
    one big unpartitioned append, then N separate single-predicate delete
    commits (N snapshots, N delete files)."""
    t = ParquetSnapshotTable(spark, path).create(ORDERS_COLUMNS)
    t.append(R.orders(spark, n, seed=7), num_files=10)
    for k in range(n_delete_commits):
        t.delete_where(f"order_id % {n} == {k}", mode="positional")
    return t


def products_with_deletes(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """The golden-ledger scenario (`Main.java:328-354` javadoc, 450 final):

      +200 (widget)          → 200
      − product_id < 30      → 170
      +200 (gizmo)           → 370
      − color = 'green'      → 333
      +600 (gadget)          → 933
      − product_id % 200 ≥ 100 → 453
      − 50 ≤ product_id < 53 (positional) → 450
    """
    t = ParquetSnapshotTable(spark, path).create(PRODUCTS_COLUMNS, partition_by=["category"])
    t.append(R.products(spark, 200, seed=1, category="widget"), num_files=1)
    t.delete_where("product_id < 30", mode="equality")
    t.append(R.products(spark, 200, seed=2, category="gizmo", id_start=200), num_files=1)
    t.delete_where("color = 'green'", mode="equality")
    t.append(R.products(spark, 600, seed=3, category="gadget", id_start=400), num_files=3)
    t.delete_where("product_id % 200 >= 100", mode="equality")
    t.delete_where("product_id >= 50 AND product_id < 53", mode="positional")
    return t


def products_with_schema_evolution(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """`createProductsWithSchemaEvolution` (`Main.java:410-461`): start with a
    narrow projection, append, ADD COLUMN color + DROP COLUMN product_id,
    append again — the generator adapts to the live schema (R5)."""
    narrow = ["product_id", "name", "category"]
    t = ParquetSnapshotTable(spark, path).create(narrow, partition_by=["category"])
    t.append(R.products(spark, 100, seed=4, category="widget", columns=narrow), num_files=1)
    t.add_column("color")
    t.drop_column("product_id")
    evolved = ["name", "category", "color"]
    t.append(
        R.products(spark, 100, seed=5, category="gizmo", id_start=100, columns=["product_id", *evolved]).drop(
            "product_id"
        ),
        num_files=1,
    )
    return t


def orders_with_partition_evolution(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """`createMultiSpecOrders...` (`Main.java:269-291`): append under
    order_year partitioning, REPLACE PARTITION FIELD with source_id, append
    again — old files keep the old layout."""
    t = ParquetSnapshotTable(spark, path).create(ORDERS_COLUMNS, partition_by=["order_year"])
    t.append(R.orders(spark, 300, seed=11), num_files=2)
    t.set_partition_fields(["source_id"])
    t.append(R.orders(spark, 300, seed=12), num_files=2)
    return t


def wide_metrics_table(spark: SparkSession, path: str, n_rows: int = 30) -> ParquetSnapshotTable:
    """`createWideMetrics` (`Main.java:463-473`): 1,000-column table,
    30 rows across 30 files."""
    cols = ["id"] + [f"metric_{i}" for i in range(999)]
    t = ParquetSnapshotTable(spark, path).create(cols)
    t.append(R.wide_metrics(spark, n_rows), num_files=n_rows)
    return t
