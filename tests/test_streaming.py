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


def test_session_window_stream_matches_batch(spark, sf_small, tmp_path):
    """The streaming session_window aggregation must produce exactly the
    batch `events_session_window` sessions on a finite replay — parity
    for the same dynamic-gap merge operator the r4 sf0.1 oracle bug was
    found in (microsecond gap semantics, not second-boundary crossings)."""
    from iceberg_table_generator_spark.operators.relational_ext import (
        events_session_window,
    )

    stream_df = streaming_events.session_window_stream(spark, sf_small)
    assert stream_df.isStreaming
    result = streaming_events.run_available_now(
        stream_df, "session_test", str(tmp_path / "ckpt_sw")
    )
    batch = events_session_window(spark, sf_small)
    s = {tuple(r) for r in result.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert s, "sessionization should be non-empty on this data"


def test_stream_stream_interval_join_matches_batch(spark, sf_small, tmp_path):
    """Attribution join (click -> purchase within 30 min, same user) must
    produce the same pairs through the streaming engine as the static
    interval join over the same data."""
    from iceberg_table_generator_spark.sources.tables import load_table

    stream_df = streaming_events.click_purchase_join_stream(spark, sf_small)
    assert stream_df.isStreaming
    result = streaming_events.run_available_now(
        stream_df, "attribution_test", str(tmp_path / "ckpt_ss"), output_mode="append"
    )
    ev = load_table(spark, sf_small, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    s = {(r.click_id, r.purchase_id) for r in result.collect()}
    b = {(r.click_id, r.purchase_id) for r in batch.collect()}
    assert s == b
    assert s, "interval join should be non-empty on this data"


def test_stream_restart_from_checkpoint_no_duplicates(spark, sf_small, tmp_path):
    """A stream stopped and restarted from its checkpoint must not
    re-aggregate already-committed data into duplicates — the exactly-once
    contract the checkpoint exists for."""
    ckpt = str(tmp_path / "ckpt_restart")
    stream_df = streaming_events.hourly_window_stream(spark, sf_small)
    # first drain: everything available
    q = (
        stream_df.writeStream.format("memory")
        .queryName("restart_a")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    first = {tuple(r) for r in spark.table("restart_a").collect()}
    # restart from the SAME checkpoint into a fresh sink: no new input,
    # so the restarted query must terminate without emitting new state
    q2 = (
        streaming_events.hourly_window_stream(spark, sf_small)
        .writeStream.format("memory")
        .queryName("restart_b")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    second = {tuple(r) for r in spark.table("restart_b").collect()}
    batch = {
        tuple(r)
        for r in __import__(
            "iceberg_table_generator_spark.operators.relational", fromlist=["events_hourly_window"]
        ).events_hourly_window(spark, sf_small).select(
            "window_start", "event_type", "n_events", "total_value"
        ).collect()
    }
    assert first == batch
    # the restarted run replays committed state (complete mode) or stays
    # empty — either way it must never contain counts above the batch truth
    assert second in ({tuple(r) for r in []}, first) or second <= first
