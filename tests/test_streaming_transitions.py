"""Streaming Markov transition deltas must sum to the batch matrix."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.sequences import (
    events_markov_transitions,
)
from iceberg_table_generator_spark.streaming import events as se
from iceberg_table_generator_spark.streaming.transitions import (
    transitions_stream,
)


def test_streaming_transitions_match_batch(spark, sf_small, tmp_path):
    stream = transitions_stream(se.read_events_stream(spark, sf_small))
    q = (
        stream.writeStream.format("memory")
        .queryName("transitions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("transitions_test")
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("n_transitions"))
    )
    s = {
        (r.from_type, r.to_type, r.n_transitions) for r in got.collect()
    }
    b = {
        (r.from_type, r.to_type, r.n_transitions)
        for r in events_markov_transitions(spark, sf_small).collect()
    }
    assert s == b
