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


def test_drop_duplicates_within_watermark(spark, sf_small, tmp_path):
    """A doubled stream must come out exactly deduplicated, matching the
    batch distinct count."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.sources.tables import load_table
    from iceberg_table_generator_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )
    from iceberg_table_generator_spark.streaming.events import run_available_now

    stream_df = dedup_stream_within_watermark(spark, sf_small)
    assert stream_df.isStreaming
    result = run_available_now(
        stream_df, "wm_dedup_test", str(tmp_path / "ckpt_wm"), output_mode="append"
    )
    n_distinct = (
        load_table(spark, sf_small, "events").select("event_id").distinct().count()
    )
    got = result.select("event_id").collect()
    assert len(got) == n_distinct
    assert len({r.event_id for r in got}) == n_distinct
