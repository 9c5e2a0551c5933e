"""Per-stage wall-time breakdown for the heavy eval queries.

The BENCH_NOTES_r11 §4 protocol says any query whose standalone median
exceeds 4 s needs either a refactor or a measured irreducibility note.
This script produces the measurement: it decomposes each heavy query
into its composed stages, times each stage standalone (terminal .count()
or noop write, after one warmup of the scan), and prints a table for
BENCH_NOTES.  Stages are timed COLD-ish (each stage re-runs its own
lineage), so the sum over stages exceeds the query's end-to-end time —
the point is the RATIO between stages, which identifies the dominant
cost.

Usage: python scripts/stage_timing.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from iceberg_table_generator_spark import get_spark  # noqa: E402
from iceberg_table_generator_spark.functions.cache import (  # noqa: E402
    release_tracked,
)


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"    {label:<46s} {dt:7.2f}s   ({out})")
    return out


def profile_band_sweep(spark, sf_dir):
    from iceberg_table_generator_spark.operators.dedup import (
        _band_fold,
        _md5_60,
        MH_P,
        minhash_signatures,
        shingles,
        tokenize,
    )
    from iceberg_table_generator_spark.operators.wave14 import (
        BAND_SWEEP,
        SWEEP_JACCARD_DEN,
        SWEEP_JACCARD_NUM,
    )
    from iceberg_table_generator_spark.functions.cache import persist_tracked
    from iceberg_table_generator_spark.sources.tables import load_table, spread

    print("dedup_minhash_band_sweep stages (r13 fused-join shape):")
    d = shingles(tokenize(spread(load_table(spark, sf_dir, "documents"))))
    sset = d.select("doc_id", F.array_distinct("shingles").alias("sset"))
    sh = sset.select(
        "doc_id",
        F.explode(F.transform("sset", lambda s: _md5_60(s) % MH_P)).alias("h"),
    )
    sig = persist_tracked(minhash_signatures(sh))
    timed("minhash signatures (persist+count)", sig.count)
    stack_args = []
    for b, r in BAND_SWEEP:
        for bb in range(b):
            key = _band_fold([F.col(f"mh_{bb * r + i}") for i in range(r)])
            stack_args.append((F.lit(b), F.lit(r), F.lit(bb), key))
    rows = F.array(
        *[
            F.struct(
                b.alias("n_bands"),
                r.alias("rows_per_band"),
                bb.alias("band_id"),
                key.alias("band_hash"),
            )
            for b, r, bb, key in stack_args
        ]
    )
    bands = sig.select("doc_id", F.explode(rows).alias("e")).select(
        "doc_id", "e.n_bands", "e.rows_per_band", "e.band_id", "e.band_hash"
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.n_bands") == F.col("y.n_bands"))
            & (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.n_bands").alias("n_bands"),
            F.col("x.rows_per_band").alias("rows_per_band"),
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    cand = persist_tracked(cand)
    timed("fused band self-join, all 3 plans", cand.count)
    pairs = cand.select("doc_a", "doc_b").distinct()
    sa = sset.select(F.col("doc_id").alias("doc_a"), F.col("sset").alias("sa"))
    sb = sset.select(F.col("doc_id").alias("doc_b"), F.col("sset").alias("sb"))
    jn, jd = SWEEP_JACCARD_NUM, SWEEP_JACCARD_DEN
    jac = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias("shared"),
            (F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb")))
            .cast("long")
            .alias("uni"),
        )
    )
    truth = jac.filter(F.col("shared") * jd >= F.col("uni") * jn)
    truth = persist_tracked(truth)
    timed("exact-Jaccard verify on union (persist+count)", truth.count)
    release_tracked()


def profile_tier_overlap(spark, sf_dir):
    from iceberg_table_generator_spark.operators.dedup import dedup_minhash_lsh
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_prior_pairs,
        _semdedup_relation,
        SEMDEDUP_TAU,
    )
    from iceberg_table_generator_spark.sources.tables import load_table

    print("dedup_tier_overlap_matrix stages:")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    x = d.select(F.col("doc_id").alias("a"), "h")
    y = d.select(F.col("doc_id").alias("b"), "h")
    exact_p = x.join(y, "h").filter(F.col("a") < F.col("b")).select("a", "b")
    timed("exact md5 pair self-join", exact_p.count)
    lex = dedup_minhash_lsh(spark, sf_dir)
    timed("dedup_minhash_lsh (full registered query)", lex.count)
    release_tracked()
    m = _semdedup_relation(spark, sf_dir)
    sem = (
        _semdedup_prior_pairs(m)
        .filter(F.col("sim") >= SEMDEDUP_TAU)
        .select(
            F.least("u_id", "v_id").alias("a"),
            F.greatest("u_id", "v_id").alias("b"),
        )
        .distinct()
    )
    timed("semdedup pair relation (members + tau cut)", sem.count)
    release_tracked()


def profile_frontier(spark, sf_dir):
    from iceberg_table_generator_spark.operators.similarity import (
        similarity_ann_lsh,
        similarity_cosine_topk,
        similarity_ivf_topk,
        similarity_pq_topk,
    )
    from iceberg_table_generator_spark.operators.wave12 import (
        similarity_sq8_recall,
    )
    from iceberg_table_generator_spark.operators.wave14 import (
        similarity_bq_recall,
        similarity_matryoshka_recall,
    )
    from iceberg_table_generator_spark.operators.wave16 import (
        similarity_ivfpq_recall,
    )

    print("similarity_compression_frontier stages (each composed query):")
    for label, fn in [
        ("exact cosine top-k (gold)", similarity_cosine_topk),
        ("lsh", similarity_ann_lsh),
        ("ivf", similarity_ivf_topk),
        ("pq", similarity_pq_topk),
        ("sq8_recall (gold via memo since r13)", similarity_sq8_recall),
        ("bq_recall (gold via memo since r13)", similarity_bq_recall),
        ("ivfpq_recall (gold via memo since r13)", similarity_ivfpq_recall),
        ("matryoshka_recall (gold via memo since r13)", similarity_matryoshka_recall),
    ]:
        timed(label, fn(spark, sf_dir).count)
        release_tracked()


PROFILES = {
    "dedup_minhash_band_sweep": profile_band_sweep,
    "dedup_tier_overlap_matrix": profile_tier_overlap,
    "similarity_compression_frontier": profile_frontier,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or list(PROFILES)
    spark = get_spark("stage_timing")
    # warm the scan / JVM once
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in only:
        PROFILES[name](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
