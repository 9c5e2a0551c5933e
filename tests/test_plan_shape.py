"""Plan-shape regression guard (r13 verdict #6).

SCALING.md tables every query's exchanges / join strategies / hinted
broadcasts, but nothing FAILED when an edit quietly added a shuffle to
an existing query — the measured runtime exponents would catch it only
above their 1 s floor, a round later.  This suite re-derives the same
per-query (exchanges, join strategies, broadcast count) inventory that
`scripts/scaling_report.py` commits to PLAN_SNAPSHOT.json and fails on
any deviation for an EXISTING query, so a plan change only lands as a
reviewed regeneration of the snapshot (same pattern as
tests/test_runtime_scaling.py's EXPLAINED list).

Queries added since the last regeneration are reported but not failures
— the round checklist regenerates the snapshot with SCALING.md.
Queries REMOVED from the registry fail (stale snapshot).
"""

from __future__ import annotations

import json
from pathlib import Path

from iceberg_table_generator_spark import all_queries
from iceberg_table_generator_spark.functions.cache import release_tracked
from iceberg_table_generator_spark.plans import explain

SF_DIR = "/root/testdata/sf0.001"
SNAPSHOT = Path(__file__).parent.parent / "PLAN_SNAPSHOT.json"

#: Intentional plan-shape changes since the committed snapshot:
#: name → one-line rationale.  Entries here are skipped by the diff and
#: must be dropped when the snapshot is next regenerated.
EXPLAINED: dict[str, str] = {
    # r14 optimization round: intentional plan reshapes, each oracle-green
    # at 3 SFs (OPTIMIZATION_r14.md has the before/after pins and plans).
    "events_pagerank": "model-sized driver fold: distributed work ends at the |V|^2-bounded weighted edge relation (katz policy)",
    "events_katz_centrality": "model-sized driver fold: distributed work ends at the |V|^2-bounded edge relation",
    "events_absorption_probability": "model-sized driver fold: distributed work ends at the |V|^2-bounded edge relation",
    "pipeline_repetition_stats": "zero-exchange rewrite: per-doc run-length fold replaces corpus-wide (doc_id, bigram) shuffle",
    "multimodal_byte_stats": "per-byte folds moved to vectorized numpy over Arrow batches (MapInArrow + spread replace the 3-pass hex-string HOF chain)",
    "text_lang_signature_jaccard": "lower(text) hoisted out of per-position lambda (no shape change expected; listed for the reviewed diff)",
    "dedup_tier_overlap_matrix": "one-hot flag union + max-fold replaces union-distinct + 3 pair-set joins (each tier now evaluated once)",
    "text_source_vocab_overlap": "single groupBy collect_set off the explode; pre-distinct shuffle + oversized persist dropped",
    "text_novelty_rate": "shingled relation persisted once; both branches previously re-ran the full tokenize+shingle build",
    "events_triangle_count": "model-sized driver fold over the collected |V|^2-bounded edge relation",
    "events_clustering_coefficient": "model-sized driver fold over the collected |V|^2-bounded edge relation",
    "events_link_prediction": "model-sized driver fold over the collected |V|^2-bounded edge relation",
    "events_resource_allocation": "model-sized driver fold over the collected |V|^2-bounded edge relation",
    "events_markov_stationary": "pi iteration folds driver-side over the one collected counter row (16-deep nested-select chain dropped)",
    "approx_sketches": "countDistinct split into its own agg subtree joined on the 3-row returnflag domain (Expand dropped; subtrees run concurrently)",
    "dedup_keep_canonical": "joins _cc_labels directly: the cluster-size attach (sizes groupBy + hot/tail joins) computed a column this query never reads",
    "dedup_semdedup_by_lang": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_clusters": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_cross_lang_shadow": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_incremental": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_lang_cluster_matrix": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_lang_tau_sweep": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_shadow_map": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_tau_sweep": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "dedup_semdedup_verdict": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ann_lsh": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ann_ndcg_eval": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ann_recall_eval": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_bq_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_bq_rerank_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_centroid_classifier": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_centroid_drift": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cluster_outlier_audit": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cluster_purity": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cluster_separation": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cluster_stats": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_compression_frontier": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cos_pair_hist": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_cosine_topk": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_isotropy_audit": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ivf_nprobe_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ivf_topk": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_ivfpq_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_knn_label": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_label_centroid_matrix": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_lsh_bucket_profile": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_matryoshka_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_norm_profile": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_pq_distortion": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_pq_topk": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_quantize_int8": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_random_projection": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_range_search": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_rrf_fusion_eval": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_silhouette_audit": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_sq8_recall": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "similarity_triplet_mining": "spread() on the embeddings scan: +N round-robin exchanges (no-op at scale), HOF folds no longer run on the single-file scan partition",
    "incremental_scd2_intervals": "read_changes_all rewrite: one groupBy over the unioned tagged versions replaces 2(V-1) anti-joins + V persists (17 -> 6 exchanges, SortMergeJoin dropped)",
}


def _shape(df) -> dict:
    joins = sorted(
        {
            n
            for n in explain.plan_nodes(df)
            if n.endswith("Join") and not n.startswith("Broadcast Exchange")
        }
    )
    return {
        "exchanges": explain.exchange_count(df),
        "joins": ", ".join(joins),
        "n_broadcasts": len(explain.broadcast_subtrees(df)),
    }


def test_plan_shapes_match_snapshot(spark):
    assert SNAPSHOT.exists(), "run scripts/scaling_report.py to create it"
    snapshot = json.loads(SNAPSHOT.read_text())
    queries = all_queries()
    removed = sorted(set(snapshot) - set(queries))
    assert not removed, (
        f"snapshot lists queries no longer registered: {removed} — "
        "regenerate scripts/scaling_report.py"
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    changed: list[str] = []
    new: list[str] = []
    try:
        for name in sorted(queries):
            df = queries[name](spark, SF_DIR)
            # Same inspection conditions as scaling_report.py: AQE off for
            # the explain only (load_table re-enables it per construction).
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            got = _shape(df)
            release_tracked()
            want = snapshot.get(name)
            if want is None:
                new.append(name)
            elif got != want and name not in EXPLAINED:
                changed.append(f"{name}: snapshot={want} now={got}")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024
        )
    if new:
        print(f"new since snapshot (regenerate at round end): {new}")
    assert not changed, (
        "plan shape changed for existing queries — if intentional, add an "
        "EXPLAINED rationale or regenerate scripts/scaling_report.py:\n"
        + "\n".join(changed)
    )
