"""Versioned-table lifecycle: the reference's golden ledger + evolution.

The central assertion reproduces the hand-verified row-count ledger of
`Main.java:328-354` (FIXTURES.md A2) snapshot by snapshot."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.sources import scenarios
from iceberg_table_generator_spark.sources.lifecycle import ParquetSnapshotTable


def test_golden_ledger_products(spark, tmp_path):
    """200 → 170 → 370 → 333 → 933 → 453 → 450 (Main.java:328-354)."""
    t = scenarios.products_with_deletes(spark, str(tmp_path / "products"))
    snaps = t.snapshots()
    expected = {
        1: 200,  # +200 widget
        2: 170,  # - product_id < 30
        3: 370,  # +200 gizmo
        4: 333,  # - color = 'green'
        5: 933,  # +600 gadget
        6: 453,  # - product_id % 200 >= 100
        7: 450,  # - 50 <= product_id < 53 (positional)
    }
    for sid, want in expected.items():
        got = t.read(version=sid).count()
        assert got == want, f"snapshot {sid}: expected {want} visible rows, got {got}"
    assert len(snaps) == 8  # create + 7 operations
    assert [s.operation for s in snaps] == [
        "create", "append", "delete-equality", "append", "delete-equality",
        "append", "delete-equality", "delete-positional",
    ]


def test_golden_ledger_delete_composition(spark, tmp_path):
    """Total deletes split 547 equality + 3 positional (Main.java:350-353)."""
    t = scenarios.products_with_deletes(spark, str(tmp_path / "p2"))
    final = t.read(with_row_id=False)
    assert final.count() == 450
    # the positional delete removed ids 50,51,52
    assert final.filter("product_id >= 50 AND product_id < 53").count() == 0
    # equality deletes apply to rows present AT DELETE TIME (MoR semantics):
    # later appends may legitimately re-introduce matching rows.
    assert final.filter("product_id < 30").count() == 0  # no later append reused ids < 30
    # green delete ran before the +600 gadget append (ids 400+): only those survive
    assert final.filter("color = 'green' AND product_id < 400").count() == 0
    # the %200 delete ran after the last append: no survivors at all
    assert final.filter("product_id % 200 >= 100").count() == 0


def test_small_orders_partitioned(spark, tmp_path):
    t = scenarios.create_small_orders(spark, str(tmp_path / "orders"))
    df = t.read(with_row_id=False)
    assert df.count() == 600
    years = {r.order_year for r in df.select("order_year").distinct().collect()}
    assert years == {2019, 2020, 2021}
    # partition pruning surface: physical layout has order_year=... dirs
    assert df.filter("order_year = 2020").count() == 200


def test_delete_commits_accumulate_snapshots(spark, tmp_path):
    t = scenarios.create_unpartitioned_orders_with_deletes(
        spark, str(tmp_path / "big"), n=500, n_delete_commits=5
    )
    snaps = t.snapshots()
    assert len(snaps) == 7  # create + append + 5 deletes (Main.java:322-325 shape)
    assert t.read().count() == 500 - 5  # one order_id matches each predicate
    # time travel: before any delete
    assert t.read(version=1).count() == 500


def test_schema_evolution(spark, tmp_path):
    t = scenarios.products_with_schema_evolution(spark, str(tmp_path / "evo"))
    df = t.read(with_row_id=False)
    assert df.columns == ["name", "category", "color"]  # product_id dropped
    assert df.count() == 200
    # pre-evolution rows surface NULL color (added column), post have values
    assert df.filter("color IS NULL").count() == 100
    assert df.filter("color IS NOT NULL").count() == 100
    # VERSION AS OF before evolution still shows product_id
    v1 = t.read(version=1)
    assert "product_id" in v1.columns


def test_partition_evolution(spark, tmp_path):
    t = scenarios.orders_with_partition_evolution(spark, str(tmp_path / "pevo"))
    assert t.read().count() == 600
    specs = [s.partition_by for s in t.snapshots()]
    assert ["order_year"] in specs and ["source_id"] in specs


def test_wide_metrics(spark, tmp_path):
    t = scenarios.wide_metrics_table(spark, str(tmp_path / "wide"), n_rows=30)
    df = t.read(with_row_id=False)
    assert len(df.columns) == 1000
    assert df.count() == 30


def test_compaction_preserves_rows_and_history(spark, tmp_path):
    """rewrite_data_files semantics: same visible rows, zero delete files,
    bounded file count, time travel intact."""
    t = scenarios.products_with_deletes(spark, str(tmp_path / "cmp"))
    before = {r.product_id for r in t.read(with_row_id=False).select("product_id").collect()}
    snap = t.compact(target_files=2)
    after = {r.product_id for r in t.read(with_row_id=False).select("product_id").collect()}
    assert after == before and len(after) == 450
    assert snap.delete_files == []
    assert len(snap.data_files) == 1  # one compacted dir replaces 5 append dirs
    # time travel to pre-compaction snapshots still resolves old files
    assert t.read(version=5).count() == 933
    # further deletes work against the compacted layout
    t.delete_where("product_id >= 900")
    assert t.read().count() == 450 - len({p for p in after if p >= 900})


def test_read_respects_column_projection_order(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "proj")).create(["a", "b"])
    t.append(spark.range(10).select(F.col("id").alias("a"), (F.col("id") * 2).alias("b")))
    assert t.read(with_row_id=False).columns == ["a", "b"]
