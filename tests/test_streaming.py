"""Structured Streaming: stream results must equal the batch twins."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.relational import events_hourly_window
from iceberg_table_generator_spark.streaming import events as streaming_events


def test_hourly_stream_matches_batch(spark, sf_small, tmp_path):
    stream_df = streaming_events.hourly_window_stream(spark, sf_small)
    assert stream_df.isStreaming
    result = streaming_events.run_available_now(
        stream_df, "hourly_test", str(tmp_path / "ckpt")
    )
    batch = events_hourly_window(spark, sf_small).select(
        "window_start", "event_type", "n_events", "total_value"
    )
    s = {tuple(r) for r in result.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_stream_watermark_column_present(spark, sf_small):
    ev = streaming_events.read_events_stream(spark, sf_small)
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    assert ev.isStreaming
