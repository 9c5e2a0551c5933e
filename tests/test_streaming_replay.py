"""Crash-replay idempotence of the foreachBatch parquet stores.

Structured Streaming's failure contract: if the driver dies between a
sink's store write and the checkpoint commit, the SAME micro-batch (same
batch_id, same rows) is re-executed on restart.  A plain parquet append
double-appends under that replay; the batch_id-partition + dynamic-
overwrite scheme (streaming/store.py, r12 verdict #4) must instead
converge — replaying a batch leaves every store byte-for-byte at the
same row multiset.

Each test drives the sink's module-level per-batch function directly —
exactly what foreachBatch calls — runs batch 0, batch 1, then REPLAYS
batch 1 (the crash-recovery scenario: history already contains batch 1's
own half-written partition), and asserts all store contents are
unchanged.  Also replays batch 0 out of order (a retried speculative
write) to check the exclusion logic keys on batch_id, not recency.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.sources.tables import table_path
from iceberg_table_generator_spark.streaming.store import (
    read_store,
    write_batch,
)


def _rows(spark, path):
    """Sorted row-tuple multiset of a store directory (batch_id included
    — replay must not even reshuffle rows between partitions)."""
    df = spark.read.parquet(str(path))
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# store.py primitives
# ---------------------------------------------------------------------------
def test_write_batch_overwrites_only_its_partition(spark, tmp_path):
    d = str(tmp_path / "s")
    a = spark.range(3).select(F.col("id").alias("k"))
    b = spark.range(10, 14).select(F.col("id").alias("k"))
    write_batch(a, d, 0)
    write_batch(b, d, 1)
    before = _rows(spark, d)
    # replay batch 1 with identical rows: nothing may change
    write_batch(b, d, 1)
    assert _rows(spark, d) == before
    # replay batch 1 with FEWER rows (e.g. a deterministic recompute after
    # upstream compaction): only partition 1 is replaced
    write_batch(b.limit(2), d, 1)
    # sorted cols = (batch_id, k): k is index 1
    got = {r[1] for r in _rows(spark, d)}
    assert {0, 1, 2} <= got and len(got) == 5


def test_read_store_excludes_one_batch(spark, tmp_path):
    d = str(tmp_path / "s")
    assert read_store(spark, d) is None  # absent dir
    write_batch(spark.range(2).select(F.col("id").alias("k")), d, 7)
    full = read_store(spark, d)
    assert full is not None and "batch_id" not in full.columns
    assert read_store(spark, d, exclude_batch_id=7).count() == 0
    assert read_store(spark, d, exclude_batch_id=3).count() == 2


# ---------------------------------------------------------------------------
# sink replays
# ---------------------------------------------------------------------------
def _doc_batches(spark, sf_small):
    docs = (
        spark.read.parquet(table_path(sf_small, "documents"))
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
        .limit(60)
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    # batch 1 overlaps batch 0 (re-arrivals) so the history path is live
    b1 = docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0))
    return b0, b1


def test_exact_dedup_replay_idempotent(spark, sf_small, tmp_path):
    from iceberg_table_generator_spark.streaming.dedup import (
        dedup_process_batch,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    b0, b1 = _doc_batches(spark, sf_small)
    dedup_process_batch(b0, 0, store, out)
    dedup_process_batch(b1, 1, store, out)
    s1, o1 = _rows(spark, store), _rows(spark, out)
    dedup_process_batch(b1, 1, store, out)  # crash-replay of batch 1
    assert _rows(spark, store) == s1 and _rows(spark, out) == o1
    dedup_process_batch(b0, 0, store, out)  # out-of-order retry of batch 0
    assert _rows(spark, store) == s1 and _rows(spark, out) == o1


def test_exact_dedup_representative_deterministic(spark, tmp_path):
    """In-batch text collisions (distinct doc_ids, same lowercased text)
    must keep the MIN doc_id — r13 advice: dropDuplicates kept an
    arbitrary row, so a crash-replay could legally surface a different
    survivor while the replay test still passed on collision-free
    fixtures."""
    from iceberg_table_generator_spark.streaming.dedup import (
        dedup_process_batch,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    batch = spark.createDataFrame(
        [
            (7, "a", "Same Text"),
            (3, "b", "same text"),  # collides with 7 after lower()
            (5, "c", "unique text"),
        ],
        "doc_id int, source string, text string",
    ).repartition(4)  # spread the collision across partitions
    dedup_process_batch(batch, 0, store, out)
    survivors = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert survivors == {3, 5}  # min doc_id won the collision
    o0 = _rows(spark, out)
    dedup_process_batch(batch, 0, store, out)  # crash-replay: byte-identical
    assert _rows(spark, out) == o0


def test_neardup_replay_idempotent(spark, sf_small, tmp_path):
    from iceberg_table_generator_spark.streaming.neardup import (
        neardup_process_batch,
    )

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    b0, b1 = _doc_batches(spark, sf_small)
    neardup_process_batch(b0, 0, store, out)
    neardup_process_batch(b1, 1, store, out)
    s1, o1 = _rows(spark, store), _rows(spark, out)
    neardup_process_batch(b1, 1, store, out)
    assert _rows(spark, store) == s1 and _rows(spark, out) == o1
    neardup_process_batch(b0, 0, store, out)
    assert _rows(spark, store) == s1 and _rows(spark, out) == o1


def test_semdedup_replay_idempotent(spark, sf_small, tmp_path):
    from iceberg_table_generator_spark.operators.similarity import ivf_index
    from iceberg_table_generator_spark.streaming.semdedup import (
        semdedup_process_batch,
    )

    emb = spark.read.parquet(table_path(sf_small, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = ivf_index(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("vec")
        ),
        cache_key=sf_small,
    )
    store = str(tmp_path / "store")
    b0 = emb.filter(F.col("vec_id") % 10 != 0)
    # batch 1 includes re-arrivals of kept batch-0 vectors (cosine-1.0
    # self-matches in the history probe) plus the genuinely new tenth
    b1 = emb.filter((F.col("vec_id") % 10 == 0) | (F.col("vec_id") % 7 == 0))
    semdedup_process_batch(b0, 0, cents, store)
    semdedup_process_batch(b1, 1, cents, store)
    s1 = _rows(spark, store)
    semdedup_process_batch(b1, 1, cents, store)
    assert _rows(spark, store) == s1
    semdedup_process_batch(b0, 0, cents, store)
    assert _rows(spark, store) == s1


def test_quality_gate_replay_idempotent(spark, sf_small, tmp_path):
    from iceberg_table_generator_spark.streaming.quality import (
        quality_process_batch,
    )

    verdicts = str(tmp_path / "verdicts")
    b0, b1 = _doc_batches(spark, sf_small)
    quality_process_batch(b0, 0, verdicts)
    quality_process_batch(b1, 1, verdicts)
    v1 = _rows(spark, verdicts)
    quality_process_batch(b1, 1, verdicts)
    assert _rows(spark, verdicts) == v1


def test_textstats_replay_idempotent(spark, sf_small, tmp_path):
    from iceberg_table_generator_spark.streaming.textstats import (
        read_text_stats,
        textstats_process_batch,
    )

    stats = str(tmp_path / "stats")
    b0, b1 = _doc_batches(spark, sf_small)
    textstats_process_batch(b0, 0, stats)
    textstats_process_batch(b1, 1, stats)
    df, sc = read_text_stats(spark, stats)
    before = (sorted((r.w, r.df) for r in df.collect()), sc.n_docs, sc.total_dl)
    textstats_process_batch(b1, 1, stats)  # replay must not double-count
    df, sc = read_text_stats(spark, stats)
    after = (sorted((r.w, r.df) for r in df.collect()), sc.n_docs, sc.total_dl)
    assert after == before
