"""Round-11 operator wave: SemDeDup-class SEMANTIC dedup (embedding-
cluster-local near-dup removal — Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication") and
SPAN-LEVEL DECONTAMINATION (maximal-span coverage of benchmark text
inside training documents — the island-merge composition of the r10
substring-dedup machinery with the benchmark-contamination check).

The reference is a table generator with no analytics surface
(`IcebergTableGenerator.java` writes rows; it never reads them back) —
these operators extend SURVEY.md §2.8's dedup/curation mandate.

Exactness policy (the repo convention): every cross-row accumulation is
integer; doubles appear only in fixed-order in-row chains shared
verbatim with the oracle (the `similarity_cosine_topk` precedent: Spark
`F.aggregate`/`zip_with` left fold ≡ DuckDB
`list_sum(list_transform(generate_series...))`).  The SemDeDup
clustering is the engine-exact integer k-means
(`operators/similarity.py` block comment), so DuckDB refits the
identical centroids and replays cluster-local dedup end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.operators.wave9 import (
    SPAN_K,
    _span_positions,
    _sql_span_groups,
)
from iceberg_table_generator_spark.operators.wave10 import (
    merge_position_islands,
    with_interval_coverage,
)
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means cluster-local cosine pruning
# --------------------------------------------------------------------------
#: Cosine threshold above which two SAME-CLUSTER vectors are semantic
#: duplicates.  This testdata's near-dup band tops out ≈ 0.51
#: (`dedup.COSINE_DUP_THRESHOLD` rationale), so 0.35 exercises real
#: drops at every SF; production corpora of normalized text embeddings
#: run this at 0.95+.
SEMDEDUP_TAU = 0.35

#: Scaled-integer micro-fraction denominator (repo convention).
_MICRO = 1_000_000


def _semdedup_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cid, vec_id, vec, nrm, ccos): every vector with its k-means
    cluster, norm, and cosine-to-centroid — the shared pre-pair relation
    of the SemDeDup family, persisted because the pair join reads it
    twice (u and v sides) and the summary reads it again.

    Clustering is the SHARED engine-exact integer k-means index
    (`similarity.ivf_index`, same cache key as the IVF/PQ/purity
    queries — a real pipeline builds the cluster model once and serves
    search AND dedup from it).  Assignment is one narrow pass; the
    centroid attach is a k-row literal broadcast."""
    from iceberg_table_generator_spark.operators.similarity import (
        _d2_structs_int,
        _dot,
        _qint,
        centroids_to_float,
        ivf_index,
        with_norm,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = ivf_index(emb, cache_key=sf_dir)
    cents_df = spark.createDataFrame(
        [(cid, v) for cid, v in centroids_to_float(cents)],
        schema="cid INT, cent ARRAY<DOUBLE>",
    )
    best = F.array_min(_d2_structs_int(_qint("vec"), cents))
    assigned = with_norm(emb).select(
        "vec_id",
        "vec",
        F.col("norm").alias("nrm"),
        best["cluster_id"].alias("cid"),
    )
    # ccos evaluates as  cdot / (nrm * cnrm)  — the oracle writes the
    # IDENTICAL operation tree, so the doubles agree bit-for-bit.
    m = assigned.join(F.broadcast(cents_df), "cid").select(
        "cid",
        "vec_id",
        "vec",
        "nrm",
        (
            _dot("vec", "cent")
            / (F.col("nrm") * F.sqrt(_dot("cent", "cent")))
        ).alias("ccos"),
    )
    return persist_tracked(m)


def _semdedup_dropped(m: DataFrame) -> DataFrame:
    """(cid, vec_id) of every DROPPED vector under the SemDeDup rule:
    within a cluster, order members by cosine-to-centroid ASCENDING
    (vec_id tiebreak) — the paper keeps LOW-centroid-similarity
    examples to preserve diversity — and drop v iff ANY earlier u has
    cos(u, v) ≥ τ.  This is the upper-triangular matrix walk of the
    released SemDeDup implementation (prefix dominance, NOT transitive
    greedy: a dropped u still shadows later v — exactly the semantics
    of zeroing the upper triangle row-wise).

    Scale: the pair join is cid-co-partitioned (sort-merge, never
    broadcast of corpus data) and materializes only same-cluster pairs
    — O(Σ c_i²), the algorithm's defining cost; production SemDeDup
    scales k with the corpus (the paper runs k = 50k on LAION) so
    cluster size — and with it pair count per key — stays bounded."""
    from iceberg_table_generator_spark.operators.similarity import _dot

    u = m.select(
        "cid",
        F.col("vec_id").alias("u_id"),
        F.col("vec").alias("u_vec"),
        F.col("nrm").alias("u_nrm"),
        F.col("ccos").alias("u_ccos"),
    )
    v = m.select(
        "cid",
        F.col("vec_id").alias("v_id"),
        F.col("vec").alias("v_vec"),
        F.col("nrm").alias("v_nrm"),
        F.col("ccos").alias("v_ccos"),
    )
    pairs = u.join(v, "cid").filter(
        (F.col("u_ccos") < F.col("v_ccos"))
        | ((F.col("u_ccos") == F.col("v_ccos")) & (F.col("u_id") < F.col("v_id")))
    )
    hits = pairs.filter(
        _dot("u_vec", "v_vec") / (F.col("u_nrm") * F.col("v_nrm"))
        >= SEMDEDUP_TAU
    )
    return hits.select("cid", F.col("v_id").alias("vec_id")).distinct()


def _sql_semdedup_ctes() -> str:
    """DuckDB twin CTE chain ending at `m` (member relation) and
    `dropped`: replays the integer k-means fit (`_sql_ivf_fit_ctes`),
    full-corpus assignment, the ccos chain with the IDENTICAL operation
    tree, and the prefix-dominance pair rule."""
    from iceberg_table_generator_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_ITERS,
        _sql_d2_int,
        _sql_ivf_fit_ctes,
        _sql_km_setup,
        _VEC_DIM,
    )

    dim, cf = _VEC_DIM, f"c{IVF_ITERS}"
    cvd = "CAST(c.cv[i] AS DOUBLE)/1000000.0"
    return f"""{_sql_km_setup()}{_sql_ivf_fit_ctes(IVF_CLUSTERS, IVF_ITERS, dim)},
asg AS (
  SELECT vec_id, vec, cid FROM (
    SELECT q0.vec_id, q0.vec, c.cid,
           row_number() OVER (PARTITION BY q0.vec_id
               ORDER BY {_sql_d2_int('q0.qv', 'c.cv', dim)}, c.cid) AS rn
    FROM q0 CROSS JOIN {cf} c) WHERE rn = 1),
m0 AS (
  SELECT a.vec_id, a.vec, a.cid,
         sqrt(list_sum(list_transform(generate_series(1, {dim}),
                                      i -> a.vec[i] * a.vec[i]))) AS nrm,
         list_sum(list_transform(generate_series(1, {dim}),
                                 i -> a.vec[i] * ({cvd}))) AS cdot,
         sqrt(list_sum(list_transform(generate_series(1, {dim}),
                                      i -> ({cvd}) * ({cvd})))) AS cnrm
  FROM asg a JOIN {cf} c USING (cid)),
m AS (SELECT vec_id, vec, cid, nrm, cdot / (nrm * cnrm) AS ccos FROM m0),
dropped AS (
  SELECT DISTINCT v.cid, v.vec_id
  FROM m u JOIN m v ON u.cid = v.cid
   AND (u.ccos < v.ccos OR (u.ccos = v.ccos AND u.vec_id < v.vec_id))
  WHERE list_sum(list_transform(generate_series(1, {dim}),
                                i -> u.vec[i] * v.vec[i]))
        / (u.nrm * v.nrm) >= {SEMDEDUP_TAU})"""


def _semdedup_clusters_oracle() -> str:
    return f"""{_sql_semdedup_ctes()},
mem AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM m GROUP BY cid),
dr AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_dropped,
         CAST(sum(vec_id) AS BIGINT) AS dropped_id_sum
  FROM dropped GROUP BY cid)
SELECT mem.cid, mem.n_members,
       CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(mem.n_members - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept,
       CAST((coalesce(dr.n_dropped, 0) * {_MICRO}) // mem.n_members
            AS BIGINT) AS drop_micro,
       CAST(coalesce(dr.dropped_id_sum, 0) AS BIGINT) AS dropped_id_sum
FROM mem LEFT JOIN dr USING (cid)
"""


@query("dedup_semdedup_clusters", oracle=_semdedup_clusters_oracle())
def dedup_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster report: per k-means cluster, how many embeddings
    the semantic-dedup pass keeps vs drops (τ = {SEMDEDUP_TAU}
    cluster-local cosine, keep-the-centroid-farthest rule) plus a
    dropped-id checksum — the tier of the dedup family that removes
    SEMANTIC duplicates exact/MinHash/SimHash/substring passes can't
    see (same meaning, different words).  Completes the r10 VERDICT #5
    mandate.

    Oracle-paired end-to-end: the engine-exact integer k-means
    (`similarity.py`) lets DuckDB refit identical centroids; the ccos /
    pair-cosine chains share one operation tree with the oracle, so
    keep/drop decisions are bit-reproducible, not just row-counted.

    Scale: fit on a bounded sample (one TakeOrdered job), assignment one
    narrow pass, centroid attach a k-row literal broadcast, and the pair
    join cid-co-partitioned with no broadcast of corpus data; output is
    ≤ k rows.  Σ c_i² pair work is SemDeDup's defining cost — k scales
    with the corpus (50k clusters in the paper) to bound cluster size."""
    m = _semdedup_relation(spark, sf_dir)
    dropped = _semdedup_dropped(m)
    mem = m.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    dr = dropped.groupBy("cid").agg(
        F.count(F.lit(1)).alias("_nd"),
        F.sum("vec_id").alias("_ds"),
    )
    nd = F.coalesce(F.col("_nd"), F.lit(0)).cast("long")
    return mem.join(dr, "cid", "left").select(
        "cid",
        "n_members",
        nd.alias("n_dropped"),
        (F.col("n_members") - nd).cast("long").alias("n_kept"),
        F.expr(f"(coalesce(_nd, 0) * {_MICRO}) div n_members")
        .cast("long")
        .alias("drop_micro"),
        F.coalesce(F.col("_ds"), F.lit(0)).cast("long").alias("dropped_id_sum"),
    )


_SEMDEDUP_VERDICT_ORACLE = f"""{_sql_semdedup_ctes()}
SELECT m.vec_id, m.cid, d.vec_id IS NULL AS keep,
       round(m.ccos, 6) AS centroid_sim
FROM m LEFT JOIN (SELECT DISTINCT vec_id FROM dropped) d USING (vec_id)
"""


@query("dedup_semdedup_verdict", oracle=_SEMDEDUP_VERDICT_ORACLE)
def dedup_semdedup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-embedding SemDeDup verdict — the actionable keep/drop list a
    curation pipeline joins back to the corpus before training (the
    `dedup_incremental_verdict` pattern at the semantic tier), with the
    cosine-to-centroid that ranked the vector inside its cluster.

    Same plan as `dedup_semdedup_clusters` up to the verdict join;
    output is corpus-cardinality by design (it IS the dedup result — at
    100 TB this is a write, not a collect)."""
    m = _semdedup_relation(spark, sf_dir)
    dropped = _semdedup_dropped(m).select("vec_id").distinct()
    return m.join(
        dropped.withColumn("_d", F.lit(1)), "vec_id", "left"
    ).select(
        "vec_id",
        "cid",
        F.col("_d").isNull().alias("keep"),
        F.round("ccos", 6).alias("centroid_sim"),
    )


# --------------------------------------------------------------------------
# Span-level decontamination: maximal benchmark-span coverage per doc
# --------------------------------------------------------------------------
#: Same held-out-benchmark stand-in as `pipeline_contamination_check`
#: (doc_id % BENCH_MOD == 0 plays the benchmark suite; in production the
#: bench side is a real fixed corpus — MMLU/GSM8K-sized).
DECON_BENCH_MOD = 20


def _decon_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal contaminated spans per TRAINING doc: every {SPAN_K}-token
    window that also occurs in a benchmark doc, merged into maximal
    islands (`wave10.merge_position_islands` — the r10 island machinery
    REUSED, not duplicated: r10 VERDICT #6).

    Shape: one posexplode (`_span_positions`, persisted — bench and
    corpus sides both read it), a bench-side hash set broadcast (the
    benchmark corpus is fixed-size in production), one LEFT SEMI join on
    the 60-bit hash — never the text, never a pair explosion (semi join
    output ≤ probe side) — then the doc-partitioned island merge."""
    sp = persist_tracked(_span_positions(spark, sf_dir))
    bench = sp.filter(
        F.pmod("doc_id", F.lit(DECON_BENCH_MOD)) == 0
    ).select("h")
    corpus = sp.filter(F.pmod("doc_id", F.lit(DECON_BENCH_MOD)) != 0)
    flagged = corpus.join(F.broadcast(bench), "h", "left_semi")
    return merge_position_islands(flagged)


def _sql_decon_cov() -> str:
    """DuckDB twin ending at `cov` + `lens`: appended to
    `_sql_span_groups`'s chain (which defines t/sp; its `grp` CTE goes
    unreferenced here and DuckDB prunes it)."""
    return f""",
bench AS (SELECT DISTINCT h FROM sp WHERE doc_id % {DECON_BENCH_MOD} = 0),
fl AS (
  SELECT sp.doc_id, sp.pos FROM sp JOIN bench USING (h)
  WHERE sp.doc_id % {DECON_BENCH_MOD} <> 0),
runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp_id
  FROM fl),
islands AS (
  SELECT doc_id,
         CAST(min(pos) AS BIGINT) AS token_start,
         CAST(max(pos) + {SPAN_K - 1} AS BIGINT) AS token_end,
         CAST(count(*) AS BIGINT) AS n_kspans
  FROM runs GROUP BY doc_id, grp_id),
cov AS (
  SELECT doc_id, token_start, token_end,
         greatest(CAST(0 AS BIGINT),
                  token_end - greatest(
                      coalesce(max(token_end) OVER (
                          PARTITION BY doc_id ORDER BY token_start
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        CAST(0 AS BIGINT)),
                      token_start - 1)) AS covered
  FROM islands),
lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t)"""


_DECON_ORACLE = f"""{_sql_span_groups()}{_sql_decon_cov()}
SELECT c.doc_id, l.n_tokens,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(c.token_end - c.token_start + 1) AS BIGINT)
         AS longest_island_tokens,
       CAST(sum(c.covered) AS BIGINT) AS contaminated_tokens,
       CAST((sum(c.covered) * {_MICRO}) // l.n_tokens AS BIGINT)
         AS contamination_micro
FROM cov c JOIN lens l USING (doc_id)
GROUP BY c.doc_id, l.n_tokens
"""


@query("pipeline_span_decontamination", oracle=_DECON_ORACLE)
def pipeline_span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (r10 VERDICT #6): for every training
    document sharing at least one maximal {SPAN_K}-token span with the
    benchmark set, the EXACT number of its tokens inside contaminated
    spans (per-doc interval union — overlapping island extents counted
    once) and the integer-micro contaminated fraction.  This replaces
    `pipeline_contamination_check`'s doc-pair shingle-hit RATE with the
    token-precise view a decontamination pass acts on: drop the doc when
    the fraction is high, surgically cut the island extents when low.

    Scale: the `_decon_islands` shape (posexplode + fixed-size bench
    broadcast + semi join + doc-bounded windows) and one doc-keyed
    aggregate joined to the pruned (doc_id, n_tokens) relation — no
    pair explosion anywhere; output is one row per contaminated doc."""
    isl = _decon_islands(spark, sf_dir)
    cov = with_interval_coverage(isl)
    per_doc = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max(F.col("token_end") - F.col("token_start") + 1).alias(
            "longest_island_tokens"
        ),
        F.sum("covered").cast("long").alias("contaminated_tokens"),
    )
    lens = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return per_doc.join(lens, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_islands",
        "longest_island_tokens",
        "contaminated_tokens",
        F.expr(f"(contaminated_tokens * {_MICRO}) div n_tokens")
        .cast("long")
        .alias("contamination_micro"),
    )


_DECON_STATS_ORACLE = f"""{_sql_span_groups()}{_sql_decon_cov()},
per_doc AS (
  SELECT doc_id, CAST(sum(covered) AS BIGINT) AS ct
  FROM cov GROUP BY doc_id),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_corpus_docs,
         CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens
  FROM lens WHERE doc_id % {DECON_BENCH_MOD} <> 0)
SELECT c.n_corpus_docs,
       CAST(count(p.doc_id) AS BIGINT) AS n_contaminated_docs,
       c.corpus_tokens,
       CAST(coalesce(sum(p.ct), 0) AS BIGINT) AS contaminated_tokens,
       CAST((coalesce(sum(p.ct), 0) * {_MICRO}) // c.corpus_tokens AS BIGINT)
         AS contamination_ppm
FROM corpus c LEFT JOIN per_doc p ON true
GROUP BY c.n_corpus_docs, c.corpus_tokens
"""


@query("pipeline_decontamination_stats", oracle=_DECON_STATS_ORACLE)
def pipeline_decontamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level decontamination budget: how many training docs carry
    benchmark spans and what fraction of ALL training tokens a span-cut
    pass would remove (parts-per-million, integer-exact) — the one-row
    go/no-go gate before committing to a surgical decontamination run.

    Scale: `pipeline_span_decontamination`'s plan capped by two scalar
    aggregates and a 1×1 cross join; output is one row."""
    isl = _decon_islands(spark, sf_dir)
    cov = with_interval_coverage(isl)
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("ct")
    )
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.pmod("doc_id", F.lit(DECON_BENCH_MOD)) != 0)
        .agg(
            F.count(F.lit(1)).alias("n_corpus_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("corpus_tokens"),
        )
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).alias("n_contaminated_docs"),
        F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias(
            "contaminated_tokens"
        ),
    )
    return agg.crossJoin(F.broadcast(corpus)).select(
        "n_corpus_docs",
        "n_contaminated_docs",
        "corpus_tokens",
        "contaminated_tokens",
        F.expr(f"(contaminated_tokens * {_MICRO}) div corpus_tokens")
        .cast("long")
        .alias("contamination_ppm"),
    )
