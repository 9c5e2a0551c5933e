"""Incremental view maintenance: changelog-folded aggregates must equal a
full recompute at every snapshot, including across compaction (whose
physical rewrite appears in the changelog as delete+insert of the same
rows and must cancel under the ±1 sign fold)."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.incremental import apply_agg_delta
from iceberg_table_generator_spark.sources.lifecycle import ParquetSnapshotTable


def _full_agg(df):
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v")
    )


def _as_dict(df):
    return {r["grp"]: (r["cnt"], r["sum_v"]) for r in df.collect()}


def test_maintained_agg_matches_recompute_at_every_snapshot(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "ivm")).create(["k", "grp", "v"])
    rows = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 3).alias("v"),
    )
    t.append(rows.filter("k < 60"))
    t.append(rows.filter("k >= 60"))
    t.delete_where("k % 7 = 0", mode="equality", equality_columns=["k"])
    t.compact(target_files=2)
    t.delete_where("k % 7 = 1", mode="positional")
    t.append(rows.filter("k < 10").withColumn("v", F.col("v") + 1000))
    head = t.snapshots()[-1].snapshot_id

    state = _full_agg(t.read(version=1))
    for v in range(2, head + 1):
        state = apply_agg_delta(
            state, t.read_changes(v - 1, v), ["grp"], {"sum_v": "v"}
        )
        expected = _full_agg(t.read(version=v))
        assert _as_dict(state) == _as_dict(expected), f"diverged at snapshot {v}"


def test_maintained_group_disappears_at_zero_count(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "ivm0")).create(["k", "grp", "v"])
    t.append(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k int, grp string, v int"
        )
    )
    t.delete_where("grp = 'a'", mode="equality", equality_columns=["k"])
    state = apply_agg_delta(
        _full_agg(t.read(version=1)), t.read_changes(1, 2), ["grp"], {"sum_v": "v"}
    )
    assert _as_dict(state) == {"b": (1, 30)}


def test_read_changes_all_matches_pairwise(spark, sf_small):
    """The single-materialization full-history changelog must equal the
    per-pair read_changes stream, version by version."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.metadata_tables import (
        _value_fixture_table,
    )

    t = _value_fixture_table(spark, sf_small)
    n = len(t.snapshots()) - 1
    allch = (
        t.read_changes_all()
        .groupBy("_version", "_change_type")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        .orderBy("_version", "_change_type")
        .collect()
    )
    expected = []
    first = t.read(version=1)
    expected.append(
        (1, "insert", first.count(), first.agg(F.sum("doc_id")).collect()[0][0])
    )
    for v in range(2, n + 1):
        ch = (
            t.read_changes(v - 1, v)
            .groupBy("_change_type")
            .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
            .collect()
        )
        for r in ch:
            expected.append((v, r["_change_type"], r["n"], r["s"]))
    got = [(r["_version"], r["_change_type"], r["n"], r["s"]) for r in allch]
    assert sorted(got) == sorted(expected)
