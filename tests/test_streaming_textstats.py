"""Streaming retrieval-stats maintenance: the incrementally maintained
df/dl/N statistics must equal a from-scratch batch recomputation, before
and after compaction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from iceberg_table_generator_spark.sources.tables import load_table, table_path
from iceberg_table_generator_spark.streaming.textstats import (
    compact_stats,
    incremental_text_stats,
    read_text_stats,
)


def _batch_truth(docs):
    tok = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    df = {
        r.w: r.df
        for r in tok.select("doc_id", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    s = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("t")).first()
    return df, s.n, s.t


def test_incremental_stats_match_batch_recompute(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    pdf = docs.toPandas()
    landing = tmp_path / "landing"
    landing.mkdir()
    # two disjoint arrivals as single files
    half = len(pdf) // 2
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:half]), landing / "a1.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[half:]), landing / "a2.parquet")

    schema = spark.read.parquet(str(landing / "a1.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = incremental_text_stats(
        stream,
        stats_dir=str(tmp_path / "stats"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    want_df, want_n, want_dl = _batch_truth(docs)

    got_df, got_scalars = read_text_stats(spark, str(tmp_path / "stats"))
    assert {r.w: r.df for r in got_df.collect()} == want_df
    assert (got_scalars.n_docs, got_scalars.total_dl) == (want_n, want_dl)

    # the delta log has 2 scalar rows pre-compaction; exactly 1 after —
    # and the merged view is unchanged (checkpoint-aware path: both
    # batches are committed, so the cutoff folds everything)
    compact_stats(
        spark, str(tmp_path / "stats"), checkpoint_dir=str(tmp_path / "ckpt")
    )
    got_df2, got_scalars2 = read_text_stats(spark, str(tmp_path / "stats"))
    assert {r.w: r.df for r in got_df2.collect()} == want_df
    assert (got_scalars2.n_docs, got_scalars2.total_dl) == (want_n, want_dl)


def test_compaction_skips_uncommitted_batch(spark, sf_small, tmp_path):
    """r13 advice: a batch whose store write landed but whose checkpoint
    commit did not must NOT be folded into base — the stream will replay
    it into its own partition on restart, and a folded copy would
    double-count.  Simulate the crash window by writing batch 1's deltas
    with no commit file, compacting, then 'replaying' batch 1."""
    from iceberg_table_generator_spark.streaming.textstats import (
        textstats_process_batch,
    )

    docs = (
        load_table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    stats = str(tmp_path / "stats")
    ckpt = tmp_path / "ckpt" / "commits"
    ckpt.mkdir(parents=True)
    textstats_process_batch(b0, 0, stats)
    (ckpt / "0").write_text("v1")  # batch 0 committed
    textstats_process_batch(b1, 1, stats)  # CRASH: write ok, commit lost

    want_df, want_n, want_dl = _batch_truth(docs)
    # compaction bounded by the checkpoint folds only batch 0 + base
    compact_stats(spark, stats, checkpoint_dir=str(tmp_path / "ckpt"))
    # restart: Structured Streaming replays batch 1 (same id, same rows)
    textstats_process_batch(b1, 1, stats)
    (ckpt / "1").write_text("v1")
    got_df, got_scalars = read_text_stats(spark, stats)
    assert {r.w: r.df for r in got_df.collect()} == want_df
    assert (got_scalars.n_docs, got_scalars.total_dl) == (want_n, want_dl)
    # and a second compaction now folds everything down to base only
    compact_stats(spark, stats, checkpoint_dir=str(tmp_path / "ckpt"))
    log = spark.read.parquet(stats + "/scalars")
    assert [r.batch_id for r in log.select("batch_id").collect()] == [-1]
    got_df2, got_scalars2 = read_text_stats(spark, stats)
    assert {r.w: r.df for r in got_df2.collect()} == want_df
    assert (got_scalars2.n_docs, got_scalars2.total_dl) == (want_n, want_dl)
