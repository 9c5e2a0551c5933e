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
    # True equality-delete files (value tuples + sequence rule), matching
    # the reference's equality ids (`IcebergTableGenerator.java:336`).
    t.delete_where("product_id < 30", mode="equality", equality_columns=["product_id"])
    t.append(R.products(spark, 200, seed=2, category="gizmo", id_start=200), num_files=1)
    t.delete_where("color = 'green'", mode="equality", equality_columns=["color"])
    t.append(R.products(spark, 600, seed=3, category="gadget", id_start=400), num_files=3)
    t.delete_where(
        "product_id % 200 >= 100", mode="equality", equality_columns=["product_id"]
    )
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


MULTI_RG_PROPS = {
    "write.parquet.row-group-size-bytes": str(16 * 1024),
    "write.parquet.page-size-bytes": str(4 * 1024),
    "write.parquet.dict-size-bytes": str(4 * 1024),
}

LONG_TABLE_NAME = (
    "orders_with_a_table_name_that_is_longer_than_two_hundred_and_fifty_six_"
    "characters_so_that_i_can_reproduce_a_bug_due_to_very_very_very_very_very_"
    "very_very_very_very_very_very_very_very_very_very_very_very_very_very_"
    "long_paths"
)


def small_orders_with_deletes(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """`createSmallOrdersWithDeletes` (`Main.java:149-175`): appends and
    positional deletes INTERLEAVED across snapshots (deletes bind to the
    rows visible at delete time; later appends to the same partitions are
    untouched), plus the reference's `appendEmptyFile` — a pre-made
    zero-row parquet registered in place (via add_files), exercising the
    empty-rowgroup reader edge."""
    t = ParquetSnapshotTable(spark, path).create(ORDERS_COLUMNS, partition_by=["order_year"])
    for year in (2019, 2020):
        t.append(
            R.orders(spark, 200, seed=60 + year).withColumn("order_year", F.lit(year)),
            num_files=2,
        )
    t.delete_where(
        "order_year IN (2019, 2020) AND order_id % 10 = 0", mode="positional"
    )
    for year in (2020, 2021):
        t.append(
            R.orders(spark, 200, seed=70 + year).withColumn("order_year", F.lit(year)),
            num_files=2,
        )
    t.delete_where(
        "order_year IN (2019, 2020) AND order_id % 10 = 3", mode="positional"
    )
    # appendEmptyFile: register a pre-made EMPTY parquet (schema, no rows)
    import os

    empty_dir = os.path.join(path, "premade", "empty-rowgroup")
    t.read(with_row_id=False).limit(0).coalesce(1).write.parquet(empty_dir)
    t.add_files([empty_dir])
    t.delete_where("order_year = 2021 AND order_id % 10 = 6", mode="positional")
    return t


def multi_rowgroup_orders_with_deletes(spark: SparkSession, path: str) -> ParquetSnapshotTable:
    """`createMultiRowGroupOrdersWithDeletes` (`Main.java:176-206`): 16 KiB
    row groups / 4 KiB pages force many row groups per file, then three
    positional-delete commits whose predicates straddle row-group
    boundaries — the reference's MoR-reader stress shape."""
    t = ParquetSnapshotTable(spark, path).create(
        ORDERS_COLUMNS, partition_by=["order_year"], properties=MULTI_RG_PROPS
    )
    for year in (2019, 2020, 2021):
        df = R.orders(spark, 3000, seed=30 + year).withColumn("order_year", F.lit(year))
        t.append(df, num_files=3)
    t.delete_where("order_year = 2021 AND order_id % 10 < 3", mode="positional")
    t.delete_where(
        "order_year = 2021 AND order_id % 10 > 0 AND order_id % 100 = 5", mode="positional"
    )
    t.delete_where(
        "order_year IN (2020, 2021) AND order_id % 3000 >= 700 AND order_id % 3000 < 1200",
        mode="positional",
    )
    return t


def orders_with_long_paths(spark: SparkSession, base_path: str) -> ParquetSnapshotTable:
    """`createOrdersWithLongPaths` (`Main.java:228-249`): the >200-char
    table identifier bug-repro — every data/delete file lives under the
    overlong directory name, exercising long-path handling end to end."""
    import os

    t = ParquetSnapshotTable(spark, os.path.join(base_path, LONG_TABLE_NAME)).create(
        ORDERS_COLUMNS, partition_by=["order_year"], properties=MULTI_RG_PROPS
    )
    for year in (2019, 2020, 2021):
        df = R.orders(spark, 1000, seed=50 + year).withColumn("order_year", F.lit(year))
        t.append(df, num_files=3)
    t.delete_where("order_year = 2019 AND order_id < 900", mode="positional")
    return t


def wide_metrics_table(spark: SparkSession, path: str, n_rows: int = 30) -> ParquetSnapshotTable:
    """`createWideMetrics` (`Main.java:463-473`): 1,000-column table,
    30 rows across 30 files."""
    cols = ["id"] + [f"metric_{i}" for i in range(999)]
    t = ParquetSnapshotTable(spark, path).create(cols)
    t.append(R.wide_metrics(spark, n_rows), num_files=n_rows)
    return t
