"""Streaming incremental SEMANTIC dedup (SemDeDup) via foreachBatch.

The streaming exact tier (streaming/dedup.py) drops byte-identical
re-arrivals and the LSH tier (streaming/neardup.py) drops lexical
near-dups; an embedding-aware ingest stream also needs SAME-MEANING
re-arrivals (paraphrases, translations-of-boilerplate) filtered against
the kept-exemplar index.  This is the streaming tier of the batch
operators `dedup_semdedup_*` / `dedup_semdedup_incremental`
(operators/wave11.py): the SAME engine-exact k-means assignment
(`semdedup_members`) and the SAME τ rule, with the kept exemplars of
every batch accumulated in a store.

Per micro-batch:

  batch → cluster assignment (semdedup_members, broadcast centroids)
        → drop vectors within cosine τ of ANY stored same-cluster
          exemplar (the `dedup_semdedup_incremental` probe rule)
        → in-batch prefix dominance (`_semdedup_dropped` — the batch
          SemDeDup upper-triangle rule, so two duplicates arriving in
          one batch keep exactly the centroid-farthest one)
        → append survivors (cid, vec_id, vec, nrm) to the store

Semantics, stated honestly: the store IS the output (an exemplar index
— SemDeDup's product is the kept set), decisions are one-pass and not
transitive across batches (a vector is only ever compared against
exemplars that were KEPT before it arrived — exactly the day-2 contract
of `dedup_semdedup_incremental`), and the cluster model is FIXED (fit
once on the reference corpus; production refits offline and replays).

Scale posture: the store holds one (cid, vec, nrm) row per kept
exemplar — the post-dedup set, the cheapest relation the pipeline owns;
the history probe is a cid-co-partitioned pair join (cluster-local,
never all-pairs), identical to the batch operator's plan.  Store writes
are replay-safe (streaming/store.py): each batch overwrites its own
batch_id partition, and the history read excludes that partition, so a
crash-replay of a batch converges to the same store contents instead of
double-appending (r12 verdict #4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

# The per-batch keep/drop rule lives with the other SemDeDup relational
# algebra (and its DuckDB-oracle-paired siblings) in operators/wave11.py;
# re-exported here because it is this sink's decision procedure.
from iceberg_table_generator_spark.operators.wave11 import (  # noqa: F401
    semdedup_batch_verdict,
    semdedup_members,
)
from iceberg_table_generator_spark.streaming.store import read_store, write_batch


def semdedup_process_batch(
    batch_df: DataFrame, batch_id: int, centroids, store_dir: str
) -> None:
    """One micro-batch of the semantic-dedup sink (module-level so the
    replay test can re-execute a batch exactly as a crash-recovery would).

    Replay-safe by construction: the history read EXCLUDES this batch's
    own partition (on a crash-replay the half-written partition must not
    condemn its own rows — a kept exemplar matches itself at cosine 1.0),
    and the write overwrites ONLY this batch's partition."""
    # Empty micro-batches must not touch the store: a zero-row write can
    # create a data-file-less directory that breaks the next batch's
    # schema inference (r11 ADVICE).
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    emb = batch_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    # A vec_id re-arriving twice WITHIN one micro-batch (duplicate rows
    # in one file) would fan out the verdict join; the batch verdict's
    # contract is unique vec_ids per batch (r11 ADVICE), so enforce it
    # here.  Cross-batch re-arrivals need no special case: a kept
    # exemplar re-arriving matches itself in the history probe at
    # cosine 1.0 ≥ τ and is dropped.
    emb = emb.dropDuplicates(["vec_id"])
    # Materialize once: the verdict reads the member relation on both
    # pair-join sides and the store write must agree with it.
    m = semdedup_members(emb, centroids).localCheckpoint(eager=True)
    seen = read_store(spark, store_dir, exclude_batch_id=batch_id)
    verdict = semdedup_batch_verdict(m, seen)
    keep_ids = verdict.filter("keep").select("vec_id")
    kept = m.join(keep_ids, "vec_id").select("cid", "vec_id", "vec", "nrm")
    write_batch(kept, store_dir, batch_id)


def incremental_semantic_dedup(
    vec_stream: DataFrame,
    centroids,
    store_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the semantic-dedup stream; returns the StreamingQuery.

    `vec_stream` carries (vec_id, embedding) rows; `centroids` is the
    engine-exact integer k-means index (`similarity.ivf_index` output)
    the batch SemDeDup family shares — fit once, passed in, broadcast
    per batch.  The kept-exemplar store at `store_dir` is both history
    and output."""
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        semdedup_process_batch(batch_df, batch_id, centroids, store_dir)

    return (
        vec_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
