"""Similarity search: ANN recall vs exact, local/global top-k equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators import similarity


def test_ann_recall_vs_exact(spark, sf_medium):
    exact = similarity.similarity_cosine_topk(spark, sf_medium)
    approx = similarity.similarity_ann_lsh(spark, sf_medium)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"ANN recall {recall:.2f} below 0.7"


def test_ivf_recall_vs_exact(spark, sf_medium):
    exact = similarity.similarity_cosine_topk(spark, sf_medium)
    approx = similarity.similarity_ivf_topk(spark, sf_medium)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # nprobe/k = 6/16 of the corpus scanned; weakly clustered testdata
    assert recall >= 0.6, f"IVF recall {recall:.2f} below 0.6"


def test_exact_topk_self_excluded_and_ranked(spark, sf_small):
    df = similarity.similarity_cosine_topk(spark, sf_small)
    rows = df.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    assert all(1 <= r.rank <= similarity.TOP_K for r in rows)
    assert all(-1.0 - 1e-9 <= r.sim <= 1.0 + 1e-9 for r in rows)
    # ranks ordered by descending sim within each query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True), f"query {q} not sorted"


def test_topk_local_global_matches_window(spark, sf_small):
    from iceberg_table_generator_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = similarity.with_norm(emb)
    qry = similarity.with_norm(emb.filter(F.col("vec_id") < 5)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.aggregate(
                    F.zip_with("qvec", "vec", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
                / (F.col("qnorm") * F.col("norm"))
            ).alias("sim"),
        )
    )
    two_phase = similarity.topk_local_global(pairs, k=5)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    window_topk = (
        pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    )
    a = {(r.query_id, r.neighbor_id) for r in two_phase.collect()}
    b = {(r.query_id, r.neighbor_id) for r in window_topk.collect()}
    assert a == b


def test_pq_recall_vs_exact(spark, sf_medium):
    exact = similarity.similarity_cosine_topk(spark, sf_medium)
    approx = similarity.similarity_pq_topk(spark, sf_medium)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # shortlist-50 ADC recall on weakly clustered vectors (exact rerank
    # inside the shortlist, so this IS the shortlist recall)
    assert recall >= 0.55, f"PQ recall {recall:.2f} below 0.55"


def test_pq_codes_shape_and_determinism(spark, sf_small):
    """PQ codes: one code per subspace, each in [0, PQ_K); re-encoding is
    bit-identical (deterministic sample fit + argmin tie-break)."""
    emb = similarity.load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    books = similarity.pq_fit(emb)
    assert len(books) == similarity.PQ_M
    assert all(len(b) == similarity.PQ_K for b in books)
    coded = emb.select("vec_id", similarity._pq_codes("vec", books).alias("codes"))
    rows = coded.collect()
    assert all(len(r.codes) == similarity.PQ_M for r in rows)
    assert all(0 <= c < similarity.PQ_K for r in rows for c in r.codes)
    again = {r.vec_id: list(r.codes) for r in coded.collect()}
    assert {r.vec_id: list(r.codes) for r in rows} == again


def test_pq_encode_zero_shuffle(spark, sf_small):
    from iceberg_table_generator_spark.plans import explain

    emb = similarity.load_table(spark, sf_small, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    books = similarity.pq_fit(emb)
    coded = emb.select("vec_id", similarity._pq_codes("vec", books).alias("codes"))
    assert explain.exchange_count(coded) == 0
    assert explain.join_kinds(coded)["BroadcastNestedLoopJoin"] == 0


def test_vectorized_cosine_matches_fold_variant(spark, sf_small):
    """The Arrow/int64-GEMM scorer and the JVM-fold scorer differ only by
    DECIMAL(12,6) quantization (~1e-6 in sim): their top-k NEIGHBOR SETS
    must agree almost everywhere (rank flips require two sims within 1e-6
    of each other)."""
    from iceberg_table_generator_spark.operators.similarity import (
        similarity_cosine_topk,
        similarity_cosine_topk_vectorized,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity_cosine_topk(spark, sf_small).collect()
    }
    vec = {
        (r.query_id, r.neighbor_id)
        for r in similarity_cosine_topk_vectorized(spark, sf_small).collect()
    }
    assert len(vec) == len(exact)
    overlap = len(exact & vec) / len(exact)
    assert overlap >= 0.95, overlap


def test_mmr_first_pick_is_exact_top1_and_sets_nest(spark, sf_small):
    """MMR's rank-1 must equal exact cosine top-1 (λ-penalty only applies
    from the second pick), and every selection must come from the
    relevance-ranked pool."""
    import pyspark.sql.functions as F

    from iceberg_table_generator_spark.operators.similarity import (
        MMR_K,
        similarity_cosine_topk,
        similarity_mmr_topk,
    )

    mmr = similarity_mmr_topk(spark, sf_small).toPandas()
    exact = similarity_cosine_topk(spark, sf_small).toPandas()
    top1 = exact[exact["rank"] == 1].set_index("query_id")["neighbor_id"]
    first = mmr[mmr["rank"] == 1].set_index("query_id")["cid"]
    assert first.to_dict() == top1.to_dict()
    # K picks per query, all distinct.
    g = mmr.groupby("query_id")
    assert (g.size() == MMR_K).all()
    assert (g["cid"].nunique() == MMR_K).all()


def test_pps_sample_draw_count_exact(spark, sf_small):
    """Systematic PPS must take exactly PPS_TARGET draws in total: the
    integer boundary test crosses each of the k grid lines once."""
    from iceberg_table_generator_spark.operators.pipeline import (
        PPS_TARGET,
        pipeline_pps_sample,
    )

    out = pipeline_pps_sample(spark, sf_small).toPandas()
    assert out["sampled_docs"].sum() == PPS_TARGET


def test_drift_monitor_tv_bounds(spark, sf_small):
    """Total-variation distance is a metric on [0, 1]."""
    from iceberg_table_generator_spark.operators.mining import (
        pipeline_drift_monitor,
    )

    out = pipeline_drift_monitor(spark, sf_small).toPandas()
    assert ((out["tv_distance"] >= 0) & (out["tv_distance"] <= 1)).all()
    assert out["n_docs"].sum() > 0
