"""Pipeline operators: stratified sampling rates, chunk invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators import pipeline
from iceberg_table_generator_spark.sources.tables import load_table


def test_stratified_sample_rates(spark, sf_medium):
    d = load_table(spark, sf_medium, "documents")
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sample = pipeline.pipeline_stratified_sample(spark, sf_medium)
    kept = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, rate in pipeline.STRATA_RATES.items():
        if lang not in totals:
            continue
        got = kept.get(lang, 0) / totals[lang]
        # 500-doc strata: generous tolerance, but the ordering must hold
        assert abs(got - rate) < 0.15, (lang, got, rate)
    # deterministic: same rows on rerun
    a = {r.doc_id for r in sample.collect()}
    b = {r.doc_id for r in pipeline.pipeline_stratified_sample(spark, sf_medium).collect()}
    assert a == b


def test_chunk_overlap_invariants(spark, sf_small):
    chunks = pipeline.pipeline_chunk_documents(spark, sf_small)
    rows = chunks.filter(F.col("doc_id") == 1).orderBy("chunk_id").collect()
    assert rows, "doc 1 should produce chunks"
    for r in rows:
        assert r.chunk_start == r.chunk_id * pipeline.CHUNK_STRIDE
        assert 1 <= r.n_tokens <= pipeline.CHUNK_SIZE
        assert len(r.chunk_text.split(" ")) == r.n_tokens
    # consecutive chunks overlap by CHUNK_SIZE - CHUNK_STRIDE tokens
    if len(rows) > 1 and rows[0].n_tokens == pipeline.CHUNK_SIZE:
        head_tail = rows[0].chunk_text.split(" ")[pipeline.CHUNK_STRIDE:]
        next_head = rows[1].chunk_text.split(" ")[: len(head_tail)]
        assert head_tail == next_head
