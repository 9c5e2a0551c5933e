"""Dedup behavior: LSH recall vs the exact operator, SimHash invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators import dedup
from iceberg_table_generator_spark.sources.tables import load_table


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_minhash_recall_vs_exact(spark, sf_medium):
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_medium))
    approx = _pairs(dedup.dedup_minhash_lsh(spark, sf_medium))
    assert exact, "fixture should contain planted near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f} below 0.8"
    # verification step guarantees no false positives above threshold
    assert approx <= exact | approx  # candidates all jaccard-verified >= 0.5


def test_minhash_no_false_positives(spark, sf_medium):
    """Verification joins back to exact Jaccard, so every reported pair
    must also be in the exact operator's output."""
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_medium))
    approx = _pairs(dedup.dedup_minhash_lsh(spark, sf_medium))
    assert approx <= exact


def test_simhash_identical_docs_distance_zero(spark, sf_small):
    d = load_table(spark, sf_small, "documents").limit(50)
    dup = d.withColumn("doc_id", F.col("doc_id") + 100000)
    fp = dedup.simhash(dedup.tokenize(d.union(dup)))
    joined = (
        fp.alias("a")
        .join(fp.alias("b"), F.col("a.doc_id") + 100000 == F.col("b.doc_id"))
        .select(
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("ham")
        )
    )
    assert joined.agg(F.max("ham")).first()[0] == 0


def test_exact_dedup_drops_planted_duplicates(spark, sf_small):
    d = load_table(spark, sf_small, "documents")
    n = d.count()
    doubled = d.union(d.withColumn("doc_id", F.col("doc_id") + 100000))
    keyed = doubled.withColumn("content_key", F.md5(F.lower("text")))
    kept = keyed.groupBy("content_key").agg(F.min("doc_id").alias("keep"))
    assert kept.count() == n  # every duplicate collapsed
    # keep-first: all surviving ids are the original (lower) ones
    assert kept.filter("keep >= 100000").count() == 0
