"""Streaming quality gate (Gopher rules) via foreachBatch.

The ingest-time twin of `pipeline_gopher_quality_rules`
(operators/wave14.py): every arriving document is scored against the
SAME four rule expressions — the projection is literally shared
(`gopher_rule_flags`), so the streaming gate and the batch audit can
never disagree on a verdict — and the per-document verdict row
(doc_id, source, the four 0/1 flags, keep) is appended to the verdict
store.  This is the stateless-filter tier of the streaming family: the
dedup tiers (exact / LSH / SemDeDup) need cross-batch state; a rule
gate needs none, which is exactly why production pipelines run it FIRST
(cheapest rejection, no state to shard).

Scale posture: the rule projection is one codegen'd in-row pass per
micro-batch (no shuffle at all — the gate adds zero exchanges to the
ingest stream); verdict writes are replay-safe (streaming/store.py):
each batch overwrites its own batch_id partition, so a crash-replay
rewrites the same verdicts instead of duplicating them (r12 verdict #4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from iceberg_table_generator_spark.operators.wave14 import gopher_rule_flags
from iceberg_table_generator_spark.streaming.store import write_batch


def quality_verdicts(batch_df: DataFrame) -> DataFrame:
    """(doc_id, source, wc_ok, mwl_ok, stop_ok, rep_ok, keep) for one
    batch of documents — the shared rule projection plus the all-rules
    keep verdict."""
    flags = gopher_rule_flags(batch_df, keep=["doc_id", "source"])
    keep = (
        (F.col("wc_ok") == 1)
        & (F.col("mwl_ok") == 1)
        & (F.col("stop_ok") == 1)
        & (F.col("rep_ok") == 1)
    )
    return flags.withColumn("keep", keep)


def quality_process_batch(
    batch_df: DataFrame, batch_id: int, verdict_dir: str
) -> None:
    """One micro-batch of the quality gate (module-level for the replay
    test).  Stateless rules ⇒ a replay recomputes identical verdicts; the
    batch_id-partition overwrite makes the rewrite idempotent."""
    # An empty micro-batch must not create a data-file-less store
    # directory (the streaming/semdedup.py lesson).
    if batch_df.isEmpty():
        return
    write_batch(quality_verdicts(batch_df), verdict_dir, batch_id)


def streaming_quality_gate(
    doc_stream: DataFrame, verdict_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Start the quality-gate stream; appends one verdict row per
    arriving document to `verdict_dir`."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        quality_process_batch(batch_df, batch_id, verdict_dir)

    return (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
