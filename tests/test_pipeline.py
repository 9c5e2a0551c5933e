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


# --------------------------------------------------------------------------
# Sequence packing / mixture sampling invariants (beyond the oracle)
# --------------------------------------------------------------------------
def test_sequence_packing_conserves_tokens(spark, sf_small):
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.pipeline import (
        SEQ_LEN,
        pipeline_sequence_packing,
    )
    from iceberg_table_generator_spark.sources.tables import load_table

    out = pipeline_sequence_packing(spark, sf_small).toPandas()
    total_tokens = (
        load_table(spark, sf_small, "documents")
        .select(F.size(F.split("text", " ")).alias("t"))
        .filter(F.col("t") > 0)
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    # Every token lands in exactly one sequence slot.
    assert out["seq_tokens"].sum() == total_tokens
    # Within a shard, only the LAST sequence may be under-full.
    for shard, grp in out.groupby("shard_id"):
        under = grp[grp["seq_tokens"] < SEQ_LEN]
        assert len(under) <= 1
        if len(under) == 1:
            assert under["seq_id"].iloc[0] == grp["seq_id"].max()
        # Sequence ids are dense from 0.
        assert sorted(grp["seq_id"]) == list(range(len(grp)))


def test_mixture_sample_budget_semantics(spark, sf_small):
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.pipeline import (
        MIX_BUDGET,
        pipeline_mixture_sample,
    )
    from iceberg_table_generator_spark.sources.tables import load_table

    out = pipeline_mixture_sample(spark, sf_small).toPandas()
    totals = (
        load_table(spark, sf_small, "documents")
        .select("source", F.size(F.split("text", " ")).alias("t"))
        .filter(F.col("t") > 0)
        .groupBy("source")
        .agg(F.sum("t").alias("total"), F.max("t").alias("max_doc"))
        .toPandas()
        .set_index("source")
    )
    for r in out.itertuples():
        total, max_doc = totals.loc[r.source, ["total", "max_doc"]]
        if r.budget_hit:
            # Start-under-budget rule: the last doc may overshoot by less
            # than its own length.
            assert MIX_BUDGET <= r.kept_tokens < MIX_BUDGET + max_doc
        else:
            # Source ran dry: everything kept, under budget.
            assert r.kept_tokens == total < MIX_BUDGET
