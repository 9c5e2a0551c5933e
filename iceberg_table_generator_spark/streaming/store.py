"""Replay-safe parquet batch stores for the foreachBatch sinks.

Every streaming suite in this package accumulates state/output in a
parquet directory from inside ``foreachBatch``.  Plain ``append`` writes
are NOT transactional with the streaming checkpoint: a crash between the
store append and the checkpoint commit makes Structured Streaming replay
the same micro-batch, double-appending its rows (r12 verdict #4 — the
"What's wrong #3" watch item).

The standard fix, implemented here: every batch writes its rows into its
own ``batch_id=N`` partition with DYNAMIC partition overwrite.  A replay
of batch N recomputes the same rows (decisions are deterministic given
the history, and the history read EXCLUDES batch N's own partition, so a
half-written partition cannot feed back into its own recomputation) and
overwrites only partition N — the store converges to exactly-once
contents without an ACID table format.  This is precisely the
``foreachBatch`` idempotence recipe the Structured Streaming guide
prescribes ("use batchId to deduplicate / make writes idempotent"); with
an Iceberg/Delta sink the same code path becomes a transactional
``MERGE`` and the partition trick disappears.

Write path invariants:
- the sink must not call this for an EMPTY batch (a zero-row overwrite
  touches no partitions, but the empty-directory hazard of r11 remains —
  callers keep their ``batch_df.isEmpty()`` early return);
- decisions must be deterministic given (batch contents, history-minus-
  this-batch) — true for every sink here (hash rules, LSH band rules,
  cosine-τ rules, stateless quality rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: Partition column stamped on every stored row.  Consumers of a store as
#: a RELATION (history joins, parity tests) read through `read_store`,
#: which drops it; the column exists only for replay idempotence.
BATCH_COL = "batch_id"


def store_exists(spark: SparkSession, store_dir: str) -> bool:
    """True iff `store_dir` exists AND holds at least one parquet data file.

    Resolves through Hadoop's FileSystem so the check works on ANY
    configured scheme (HDFS/S3A/DBFS), not just the driver-local
    filesystem (r11 ADVICE: os.path.isdir silently read a remote store as
    absent).  An existing-but-empty directory has no data files and would
    fail parquet schema inference."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return False
    it = fs.listFiles(path, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            return True
    return False


def read_store(
    spark: SparkSession, store_dir: str, exclude_batch_id: int | None = None
) -> DataFrame | None:
    """The store as a relation (batch_id dropped), or None if absent/empty.

    `exclude_batch_id` removes one batch's partition from the view — the
    replay rule: when batch N re-executes, its history must be the store
    AS OF batch N-1, so a partially-committed partition N (the crash that
    caused the replay) cannot feed back into its own recomputation."""
    if not store_exists(spark, store_dir):
        return None
    df = spark.read.parquet(store_dir)
    if exclude_batch_id is not None:
        df = df.filter(F.col(BATCH_COL) != exclude_batch_id)
    return df.drop(BATCH_COL)


def write_batch(df: DataFrame, store_dir: str, batch_id: int) -> None:
    """Write one batch's rows into partition `batch_id=N`, replay-safe.

    Dynamic partition overwrite replaces ONLY the partitions present in
    `df` — i.e. exactly partition N — leaving every other batch's rows
    untouched.  First write and replay are the same code path."""
    (
        df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL)
        .parquet(store_dir)
    )
