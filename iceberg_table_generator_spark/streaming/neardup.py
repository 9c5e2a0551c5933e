"""Streaming incremental NEAR-dedup (MinHash-LSH) via foreachBatch.

The streaming exact dedup (streaming/dedup.py) only drops byte-identical
re-arrivals; a training-data ingest stream also needs the near-duplicates
— boilerplate re-crawls, templated mirrors — filtered AGAINST HISTORY.
This is the streaming tier of the batch MinHash-LSH operator
(operators/dedup.py::dedup_minhash_lsh): the SAME engine-independent
signature pipeline (md5-60 shingle hash → 64-perm minhash → 16 band
keys), with the band keys of every KEPT document accumulated in a store.

Per micro-batch:

  batch → band keys (operators.dedup.minhash_band_keys)
        → drop docs whose ANY band key hits the history store
        → in-batch one-pass rule: drop a doc if any of its band buckets
          contains a smaller doc_id
        → append survivors to output, their band keys to the store

Semantics — the standard ONE-PASS LSH-prefilter contract, stated
honestly: a dropped doc always shares a band bucket (i.e. is an LSH
candidate near-dup) with some smaller-id doc, and chains terminate at a
kept representative, but unlike the batch connected-components operator
the rule is not transitive — a cluster whose members never share a
bucket with the cluster minimum can keep more than one representative,
and candidates are NOT exact-Jaccard verified (LSH false positives are
dropped too).  Streams that need transitive keep-min clusters run the
batch CC operator over the accumulated corpus; this stage is the cheap
always-on prefilter in front of it.

Scale posture: the store holds (band_id, 8-byte band_hash) keys per kept
doc — 16 longs per document, no text; the history check is an equi-join
on (band_id, band_hash), co-partitionable by bucketing the store.  A hot
bucket (boilerplate band shared by millions of docs) is bounded on the
store side by keeping ONE exemplar row per (band_id, band_hash) — a
bucket's first kept doc is enough to condemn every later arrival.
Writes are replay-safe (streaming/store.py): each batch overwrites its
own batch_id partition in BOTH the output and the key store, and the
history read excludes that partition, so a crash-replay converges
instead of double-appending (r12 verdict #4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iceberg_table_generator_spark.streaming.store import read_store, write_batch


# The per-batch keep/drop rule lives with the other dedup relational
# algebra (and its DuckDB oracle) in operators/dedup.py; re-exported here
# because it is this sink's decision procedure.
from iceberg_table_generator_spark.operators.dedup import (  # noqa: E402,F401
    near_dedup_batch_verdict,
)


def neardup_process_batch(
    batch_df: DataFrame, batch_id: int, store_dir: str, out_dir: str
) -> None:
    """One micro-batch of the near-dedup sink (module-level for the
    replay test).  Replay-safe: the history read excludes this batch's
    own partition (the half-written keys must not condemn their own
    batch's rows), and both writes overwrite only this batch's
    partition."""
    from iceberg_table_generator_spark.operators.dedup import minhash_band_keys

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    seen = read_store(spark, store_dir, exclude_batch_id=batch_id)
    verdict = near_dedup_batch_verdict(batch_df, seen)
    keep_ids = verdict.filter("keep").select("doc_id")
    # Materialize once: output rows and store keys must agree.
    kept = batch_df.join(keep_ids, "doc_id").localCheckpoint(eager=True)
    write_batch(kept, out_dir, batch_id)
    # One exemplar row per bucket bounds the store under boilerplate:
    # the first kept doc of a bucket condemns every later arrival.
    new_keys = (
        minhash_band_keys(kept)
        .groupBy("band_id", "band_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    if seen is not None:
        new_keys = new_keys.join(seen, ["band_id", "band_hash"], "left_anti")
    write_batch(new_keys, store_dir, batch_id)


def incremental_near_dedup(
    docs_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the near-dedup stream; returns the StreamingQuery handle."""
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        neardup_process_batch(batch_df, batch_id, store_dir, out_dir)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
