"""foreachBatch incremental dedup: duplicates across micro-batches dropped."""

from __future__ import annotations

import shutil

from iceberg_table_generator_spark.sources.tables import table_path
from iceberg_table_generator_spark.streaming.dedup import incremental_dedup


def test_incremental_dedup_across_batches(spark, sf_small, tmp_path):
    # Stage a landing dir where the same document file arrives twice —
    # maxFilesPerTrigger=1 forces the copies into separate micro-batches.
    landing = tmp_path / "landing"
    landing.mkdir()
    src = table_path(sf_small, "documents")
    shutil.copy(src, landing / "arrival_1.parquet")
    shutil.copy(src, landing / "arrival_2.parquet")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = incremental_dedup(
        stream,
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    n_unique = spark.read.parquet(src).count()  # all texts distinct in fixture
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == n_unique  # second arrival fully deduped
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == n_unique
