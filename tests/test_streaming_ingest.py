"""Streaming ingest into the snapshot table: exactly-once under replay.

The sink must (a) commit one snapshot per micro-batch with the epoch
recorded atomically, (b) drop replayed epochs, and (c) resume from the
checkpoint after a restart ingesting only new files."""

from __future__ import annotations

import shutil

from iceberg_table_generator_spark.sources.lifecycle import ParquetSnapshotTable
from iceberg_table_generator_spark.sources.tables import table_path
from iceberg_table_generator_spark.streaming.ingest import (
    EPOCH_PROP,
    ingest_stream_to_table,
    snapshot_epoch_sink,
)


def _docs_stream(spark, sf_small, landing):
    schema = spark.read.parquet(table_path(sf_small, "documents")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )


def test_ingest_snapshot_per_batch_and_restart(spark, sf_small, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    src = table_path(sf_small, "documents")
    shutil.copy(src, landing / "arrival_1.parquet")
    n_docs = spark.read.parquet(src).count()

    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl")).create(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )
    q = ingest_stream_to_table(
        _docs_stream(spark, sf_small, landing), t, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert t.read().count() == n_docs
    head = t.snapshots()[-1]
    assert head.operation == "append" and head.properties[EPOCH_PROP] == "0"

    # restart with the same checkpoint after a new file lands: ONLY the new
    # file is ingested, the epoch advances
    shutil.copy(src, landing / "arrival_2.parquet")
    q2 = ingest_stream_to_table(
        _docs_stream(spark, sf_small, landing), t, str(tmp_path / "ckpt")
    )
    q2.awaitTermination()
    assert t.read().count() == 2 * n_docs
    assert t.snapshots()[-1].properties[EPOCH_PROP] == "1"
    # one data commit per micro-batch, nothing extra
    appends = [s for s in t.snapshots() if s.operation == "append"]
    assert len(appends) == 2


def test_replayed_epoch_is_dropped(spark, sf_small, tmp_path):
    docs = spark.read.parquet(table_path(sf_small, "documents")).limit(50)
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl")).create(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sink = snapshot_epoch_sink(t)
    sink(docs, 0)
    sink(docs, 1)
    n_after = t.read().count()
    versions_after = len(t.snapshots())
    # crash-recovery replay re-delivers epochs 0 and 1: both must no-op
    sink(docs, 0)
    sink(docs, 1)
    assert t.read().count() == n_after == 100
    assert len(t.snapshots()) == versions_after
    # the next fresh epoch still commits
    sink(docs, 2)
    assert t.read().count() == 150


def test_streaming_maintained_aggregate(spark, sf_small, tmp_path):
    """The streaming materialized view: after N micro-batches, the
    maintained aggregate equals a full groupBy over everything ingested,
    replays heal both tables, and each epoch's state is time-travelable."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.streaming.ingest import (
        snapshot_epoch_sink_with_agg,
    )

    t = ParquetSnapshotTable(spark, str(tmp_path / "data")).create(
        ["k", "grp", "v"]
    )
    agg = ParquetSnapshotTable(spark, str(tmp_path / "agg")).create(
        ["grp", "cnt", "sum_v"]
    )
    sink = snapshot_epoch_sink_with_agg(t, agg, ["grp"], {"sum_v": "v"})
    batches = [
        spark.range(lo, lo + 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("grp"),
            (F.col("id") * 2).alias("v"),
        )
        for lo in (0, 30, 60)
    ]
    for i, b in enumerate(batches):
        sink(b, i)
    expected = {
        (r["grp"], r["cnt"], r["sum_v"])
        for r in t.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    }
    got = {
        (r["grp"], r["cnt"], r["sum_v"]) for r in agg.read(with_row_id=False).collect()
    }
    assert got == expected and t.read().count() == 90
    # replay every epoch: both tables unchanged
    n_snaps = (len(t.snapshots()), len(agg.snapshots()))
    for i, b in enumerate(batches):
        sink(b, i)
    assert (len(t.snapshots()), len(agg.snapshots())) == n_snaps
    # epoch-1 state is still readable via time travel (2 batches = 60 rows)
    v2 = agg.snapshots()[-2].snapshot_id
    assert sum(r["cnt"] for r in agg.read(version=v2, with_row_id=False).collect()) == 60
