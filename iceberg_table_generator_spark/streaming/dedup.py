"""Streaming incremental exact dedup via foreachBatch.

The batch dedup operators (operators/dedup.py) assume the corpus is fully
visible; a training-data ingest stream needs dedup AGAINST HISTORY — each
micro-batch checked against all previously seen content keys.  foreachBatch
gives every micro-batch as a normal DataFrame, so the increment is plain
relational algebra:

  batch → content-key → in-batch dropDuplicates → anti-join seen-keys store
        → append survivors to output, their keys to the store

Scale posture: the store holds 16-byte keys only (not documents); the
anti-join shuffles on the key hash; at 100 TB of history the store is a
key-bucketed table so the anti-join co-partitions.  NOTE: parquet append is
not transactional with the checkpoint — a retried batch could double-append.
Production uses an ACID sink (Iceberg MERGE) for exactly-once; the
algorithm is unchanged.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def incremental_dedup(
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> StreamingQuery:
    """Start the dedup stream; returns the StreamingQuery handle."""
    spark = docs_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.withColumn(
            "content_key", F.md5(F.lower(F.col(text_col)))
        ).dropDuplicates(["content_key"])
        if os.path.isdir(store_dir):
            seen = spark.read.parquet(store_dir)
            fresh = keyed.join(seen, "content_key", "left_anti")
        else:
            fresh = keyed
        # Materialize once: the two writes below must see the same rows.
        fresh = fresh.localCheckpoint(eager=True)
        fresh.drop("content_key").write.mode("append").parquet(out_dir)
        fresh.select("content_key").write.mode("append").parquet(store_dir)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream_within_watermark(spark, sf_dir: str) -> DataFrame:
    """Built-in streaming exact dedup: `dropDuplicatesWithinWatermark` on
    the event id over a synthetically duplicated stream (each event
    emitted twice).  Unlike plain dropDuplicates — whose state grows
    unboundedly — the watermark variant evicts a key's state once the
    event-time watermark passes it, so the state store holds only the
    in-flight window at any corpus scale.  The foreachBatch operator
    above is the dedup-against-ALL-history complement; this one is
    dedup-within-the-stream."""
    from iceberg_table_generator_spark.streaming.events import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    duplicated = ev.withColumn(
        "__copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("__copy")
    return duplicated.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
