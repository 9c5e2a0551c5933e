"""Event-time timeout eviction: closed sessions stream out as the
watermark advances across micro-batches; no session is emitted twice."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.relational import events_sessionize
from iceberg_table_generator_spark.sources.tables import load_table
from iceberg_table_generator_spark.streaming.stateful import sessionize_stream_evicting


def test_eviction_emits_closed_sessions_once(spark, sf_small, tmp_path):
    # Split events into 3 time-ordered arrivals so the watermark advances
    # between micro-batches and fires the event-time timeouts.
    ev = load_table(spark, sf_small, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(3):
        part = ev.filter(
            (F.col("ts") >= F.lit(lo + i * span)) & (F.col("ts") < F.lit(lo + (i + 1) * span))
            if i < 2
            else (F.col("ts") >= F.lit(lo + 2 * span))
        )
        part.coalesce(1).write.mode("overwrite").parquet(str(landing / f"arrival_{i}"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing / "arrival_*"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize_stream_evicting(stream)
        .writeStream.format("memory")
        .queryName("evict_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("evict_test").collect()
    assert got, "watermark advancement should close sessions"
    emitted = [(r.user_id, r.session_start) for r in got]
    assert len(emitted) == len(set(emitted)), "no session emitted twice"
    # every emitted session matches a batch-sessionizer session exactly
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in events_sessionize(spark, str(sf_small)).collect()
    }
    for r in got:
        key = (r.user_id, r.session_start, r.session_end, r.n_events)
        assert key in batch, f"emitted session {key} not in batch result"
    assert all(r.closed for r in got)
