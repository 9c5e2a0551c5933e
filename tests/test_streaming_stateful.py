"""applyInPandasWithState sessionization must agree with the batch twin."""

from __future__ import annotations

from iceberg_table_generator_spark.operators.relational import events_sessionize
from iceberg_table_generator_spark.streaming import events as se
from iceberg_table_generator_spark.streaming.stateful import sessionize_stream


def test_stateful_sessionize_matches_batch(spark, sf_small, tmp_path):
    stream = sessionize_stream(se.read_events_stream(spark, sf_small))
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sessions_test")
    # update mode re-emits a user's open session each batch — keep the last
    # emission per (user, session_start)
    got.createOrReplaceTempView("got")
    dedup = spark.sql(
        """
        SELECT user_id, session_start, max(session_end) AS session_end,
               max(n_events) AS n_events
        FROM got GROUP BY user_id, session_start
        """
    )
    batch = events_sessionize(spark, sf_small)
    s = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in dedup.collect()
    }
    b = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert s == b
