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
key-bucketed table so the anti-join co-partitions.  Writes are replay-safe
(streaming/store.py): each batch overwrites its own batch_id partition in
BOTH the output and the key store, and the history read excludes that
partition, so a crash-replay converges instead of double-appending (r12
verdict #4).  An ACID sink (Iceberg MERGE) subsumes the partition trick;
the algorithm is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming import StreamingQuery

from iceberg_table_generator_spark.streaming.store import read_store, write_batch


def dedup_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the exact-dedup sink (module-level for the
    replay test).  Replay-safe: the history read excludes this batch's
    own partition (the half-written keys must not anti-join away their
    own rows), and both writes overwrite only this batch's partition.

    The in-batch representative is DETERMINISTIC — min `id_col` per
    content key (r13 advice): `dropDuplicates` keeps an arbitrary row,
    so a crash-replay of a batch holding two distinct rows with the
    same lowercased text could overwrite partition N with a different
    surviving row than the original run, breaking the byte-for-byte
    replay contract store.py promises (the neardup sink's F.min(doc_id)
    idiom, applied here)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    w = Window.partitionBy("content_key").orderBy(F.asc(id_col))
    keyed = (
        batch_df.withColumn("content_key", F.md5(F.lower(F.col(text_col))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    seen = read_store(spark, store_dir, exclude_batch_id=batch_id)
    fresh = keyed.join(seen, "content_key", "left_anti") if seen is not None else keyed
    # Materialize once: the two writes below must see the same rows.
    fresh = fresh.localCheckpoint(eager=True)
    write_batch(fresh.drop("content_key"), out_dir, batch_id)
    write_batch(fresh.select("content_key"), store_dir, batch_id)


def incremental_dedup(
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> StreamingQuery:
    """Start the dedup stream; returns the StreamingQuery handle."""
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_process_batch(batch_df, batch_id, store_dir, out_dir, text_col)

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
