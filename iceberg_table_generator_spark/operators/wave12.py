"""Round-11 third wave: data-SELECTION and corpus-health operators the
LLM-curation surface still lacked — DSIR-style importance weights (Xie
et al. 2023, "Data Selection for Language Models via Importance
Resampling": hashed n-gram bucket log-likelihood ratios against a target
domain), a unigram-LM cross-entropy quality proxy (the CCNet-tier
perplexity filter, expressible without a neural LM), the context-window
truncation-loss curve (how many training tokens each packing length
throws away), graph eccentricity/diameter/radius (completing the
all-pairs-BFS family next to harmonic centrality), and a k-means
cluster-outlier audit on the shared SemDeDup member relation.

The reference is a table generator with no analytics surface
(`IcebergTableGenerator.java` writes rows; it never reads them back) —
these operators extend SURVEY.md §2.8's curation mandate.

Exactness policy (repo convention): cross-row accumulation is integer.
``ln()`` is the one op the engines disagree on (JVM ``Math.log`` vs
libm, last-ulp — the `text.py` BM25 analysis); every log-derived weight
here is rounded to 6 decimals and micro-scaled to BIGINT *per bucket /
per vocabulary word* BEFORE any accumulation, so per-document scores are
exact integer sums of identically-rounded terms on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.operators.dedup import _md5_60, _sql_md5_60
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# DSIR importance weights (hashed-unigram LLR vs a target domain)
# --------------------------------------------------------------------------
#: Hashed feature buckets.  The paper uses 10k hashed n-gram buckets at
#: web scale; 64 keeps the λ relation a trivially-broadcast literal-sized
#: table while still separating the language distributions in this
#: testdata.  The bucket hash is the engine-independent md5-60.
DSIR_BUCKETS = 64
#: Rows returned: the "select the most target-like documents" headline.
DSIR_TOP_K = 25
#: Target domain: English-language documents (the `lang` column is the
#: testdata's domain axis; a production run points this at the curated
#: target corpus instead).
DSIR_TARGET_LANG = "en"

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
tb AS (
  SELECT doc_id, lang, {_sql_md5_60('w')} % {DSIR_BUCKETS} AS b FROM tok),
bs AS (
  SELECT b, CAST(count(*) AS BIGINT) AS raw_c,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS tgt_c
  FROM tb GROUP BY b),
tot AS (
  SELECT CAST(sum(raw_c) AS BIGINT) AS raw_n,
         CAST(sum(tgt_c) AS BIGINT) AS tgt_n FROM bs),
lam AS (
  SELECT b,
         CAST(round((ln(tgt_c + 1.0) - ln(tgt_n + {DSIR_BUCKETS}.0)
                     - ln(raw_c + 1.0) + ln(raw_n + {DSIR_BUCKETS}.0))
                    * 1000000.0, 0) AS BIGINT) AS lam_micro
  FROM bs CROSS JOIN tot),
dc AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tb
  GROUP BY doc_id, b),
sc AS (
  SELECT doc_id, CAST(sum(c * lam_micro) AS BIGINT) AS llr_micro,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM dc JOIN lam USING (b) GROUP BY doc_id),
top AS (
  SELECT d.doc_id, d.source, d.lang, s.n_tokens, s.llr_micro,
         CAST(row_number() OVER (ORDER BY s.llr_micro DESC, d.doc_id)
              AS INT) AS rank
  FROM sc s JOIN documents d USING (doc_id))
SELECT doc_id, source, lang, n_tokens, llr_micro, rank
FROM top WHERE rank <= {DSIR_TOP_K}
"""


def dsir_bucket_lambdas(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """((b, raw_lam, lam_micro), token-bucket relation): per-bucket
    target/raw LLR, raw and micro-rounded, plus the persisted
    (doc_id, lang, b) token relation that produced it — shared by
    `pipeline_dsir_weights` (which joins the rounded column) and the
    rounding-margin guard test (which measures the raw column's distance
    from every rounding boundary)."""
    d = load_table(spark, sf_dir, "documents")
    tb = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).select("doc_id", "lang", (_md5_60(F.col("w")) % DSIR_BUCKETS).alias("b"))
    tb = persist_tracked(tb)
    bs = tb.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).cast("long").alias("tgt_c"),
    )
    tot = bs.agg(
        F.sum("raw_c").cast("long").alias("raw_n"),
        F.sum("tgt_c").cast("long").alias("tgt_n"),
    )
    raw_lam = (
        F.log(F.col("tgt_c") + 1.0)
        - F.log(F.col("tgt_n") + float(DSIR_BUCKETS))
        - F.log(F.col("raw_c") + 1.0)
        + F.log(F.col("raw_n") + float(DSIR_BUCKETS))
    )
    lam = bs.crossJoin(F.broadcast(tot)).select(
        "b",
        raw_lam.alias("raw_lam"),
        F.round(raw_lam * 1000000.0, 0).cast("long").alias("lam_micro"),
    )
    return lam, tb


@query("pipeline_dsir_weights", oracle=_DSIR_ORACLE)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every document by
    the log-likelihood ratio of a hashed-unigram bag-of-buckets model of
    the TARGET domain vs the RAW corpus, and return the top
    {DSIR_TOP_K} most target-like documents — the selection step of
    importance-resampling data curation.  λ_b =
    ln p̂_tgt(b) − ln p̂_raw(b) with add-one smoothing over
    {DSIR_BUCKETS} md5-hashed buckets; score(doc) = Σ_b count_doc(b)·λ_b.

    Engine determinism: λ_b is rounded to 6 decimals and micro-scaled to
    BIGINT per bucket (the BM25 ln-ulp absorption pattern), so per-doc
    scores are exact integer sums on both engines.

    Scale: one token pass feeds both the per-doc-bucket counts (doc-keyed
    partial agg) and the {DSIR_BUCKETS}-row bucket stats; λ attaches as a
    broadcast of a configuration-bounded relation; the final top-k is a
    TakeOrdered, never a global window."""
    d = load_table(spark, sf_dir, "documents")
    lam, tb = dsir_bucket_lambdas(spark, sf_dir)
    lam = lam.drop("raw_lam")
    dc = tb.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    sc = (
        dc.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("lam_micro")).cast("long").alias("llr_micro"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    top = (
        sc.join(d.select("doc_id", "source", "lang"), "doc_id")
        .orderBy(F.desc("llr_micro"), F.asc("doc_id"))
        .limit(DSIR_TOP_K)
    )
    w = Window.orderBy(F.desc("llr_micro"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "source", "lang", "n_tokens", "llr_micro", "rank"
    )


# --------------------------------------------------------------------------
# Unigram-LM cross-entropy quality proxy (CCNet-tier perplexity filter)
# --------------------------------------------------------------------------
_LOGLOSS_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS v FROM vocab),
lnp AS (
  SELECT w,
         CAST(round((ln(cnt + 1.0) - ln(CAST(n_tok + v AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS lnp_micro
  FROM vocab CROSS JOIN tot),
dc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM tok
  GROUP BY doc_id, w),
pd AS (
  SELECT doc_id,
         CAST((0 - sum(c * lnp_micro)) // sum(c) AS BIGINT) AS ll_pt_micro,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM dc JOIN lnp USING (w) GROUP BY doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(p.ll_pt_micro) // count(*) AS BIGINT) AS avg_logloss_micro,
       CAST(min(p.ll_pt_micro) AS BIGINT) AS min_logloss_micro,
       CAST(max(p.ll_pt_micro) AS BIGINT) AS max_logloss_micro
FROM pd p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def unigram_lnp_terms(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """((w, raw_lnp, lnp_micro), (doc_id, w, c)): the smoothed unigram
    log-probabilities (raw and micro-rounded) plus the persisted per-doc
    term counts — shared by `text_unigram_logloss` and the
    rounding-margin guard test."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    dc = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    dc = persist_tracked(dc)
    vocab = dc.groupBy("w").agg(F.sum("c").cast("long").alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").cast("long").alias("n_tok"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    raw_lnp = F.log(F.col("cnt") + 1.0) - F.log(
        (F.col("n_tok") + F.col("v")).cast("double")
    )
    lnp = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        raw_lnp.alias("raw_lnp"),
        F.round(raw_lnp * 1000000.0, 0).cast("long").alias("lnp_micro"),
    )
    return lnp, dc


@query("text_unigram_logloss", oracle=_LOGLOSS_ORACLE)
def text_unigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-LM cross-entropy profile — the CCNet-style
    perplexity quality filter, expressed without a neural LM: fit an
    add-one-smoothed unigram model on the corpus itself, score every
    document by its per-token negative log-likelihood, and report each
    source feed's mean/min/max.  High-logloss feeds are the gibberish /
    OOV-heavy candidates a perplexity gate would trim first.

    Engine determinism: ln p(w) is rounded to 6 decimals and micro-scaled
    per VOCABULARY WORD before accumulation (BM25 pattern), so per-doc
    sums are exact integers; per-doc and per-source means use integer
    division (all-positive operands, truncation ≡ floor).

    Scale: vocabulary fit is one word-keyed partial agg; the score join
    attaches the per-word λ to (doc_id, word) COUNTS — 1:1 multiplicity,
    the tf·idf join shape, AQE-skew-splittable — never to raw token
    instances; everything after is doc- then source-keyed."""
    d = load_table(spark, sf_dir, "documents")
    lnp, dc = unigram_lnp_terms(spark, sf_dir)
    pd = (
        dc.join(lnp.drop("raw_lnp"), "w")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST((0 - sum(c * lnp_micro)) div sum(c) AS BIGINT)"
            ).alias("ll_pt_micro"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    return (
        pd.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(sum(ll_pt_micro) div count(1) AS BIGINT)"
            ).alias("avg_logloss_micro"),
            F.min("ll_pt_micro").cast("long").alias("min_logloss_micro"),
            F.max("ll_pt_micro").cast("long").alias("max_logloss_micro"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Context-window truncation-loss curve
# --------------------------------------------------------------------------
TRUNC_GRID = (64, 128, 256, 512, 1024)

_TRUNC_ORACLE = f"""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
g(ctx_len) AS (VALUES {", ".join(f"({L})" for L in TRUNC_GRID)}),
a AS (
  SELECT ctx_len,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN tok > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_truncated,
         CAST(sum(CASE WHEN tok > ctx_len THEN tok - ctx_len ELSE 0 END)
              AS BIGINT) AS tokens_lost,
         CAST(sum(tok) AS BIGINT) AS tokens_total
  FROM t CROSS JOIN g GROUP BY ctx_len)
SELECT CAST(ctx_len AS INT) AS ctx_len, n_docs, docs_truncated,
       tokens_total, tokens_lost,
       CAST((tokens_lost * 1000000) // tokens_total AS BIGINT) AS loss_ppm
FROM a
"""


@query("pipeline_truncation_loss", oracle=_TRUNC_ORACLE)
def pipeline_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation-loss curve: for each candidate training
    context length, how many documents exceed it and what fraction of
    corpus tokens a truncate-at-L packing policy would discard
    (loss_ppm) — the capacity-planning twin of `pipeline_sequence_packing`
    (which measures padding waste; this measures truncation waste, and the
    two jointly pick the context length).

    Scale: one narrow per-doc token count crossed with a
    {len(TRUNC_GRID)}-row literal grid (the τ-sweep sentinel-grid shape),
    folded map-side onto the grid domain — no joins, no windows."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.size(F.split("text", " ")).cast("long").alias("tok"))
    grid = spark.createDataFrame(
        [(L,) for L in TRUNC_GRID], "ctx_len int"
    )
    a = (
        t.crossJoin(F.broadcast(grid))
        .groupBy("ctx_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("tok") > F.col("ctx_len"), 1).otherwise(0)
            ).cast("long").alias("docs_truncated"),
            F.sum(
                F.when(
                    F.col("tok") > F.col("ctx_len"),
                    F.col("tok") - F.col("ctx_len"),
                ).otherwise(0)
            ).cast("long").alias("tokens_lost"),
            F.sum("tok").cast("long").alias("tokens_total"),
        )
    )
    return a.select(
        "ctx_len",
        "n_docs",
        "docs_truncated",
        "tokens_total",
        "tokens_lost",
        F.expr(
            "CAST((tokens_lost * 1000000) div tokens_total AS BIGINT)"
        ).alias("loss_ppm"),
    ).orderBy("ctx_len")


# --------------------------------------------------------------------------
# Graph eccentricity / diameter / radius (truncated all-pairs BFS)
# --------------------------------------------------------------------------
ECC_MAX_HOPS = 8  # same truncation as harmonic centrality (wave10)

_ECC_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
bi AS (SELECT u AS src, v AS dst FROM und
       UNION ALL SELECT v AS src, u AS dst FROM und),
nodes AS (SELECT DISTINCT k AS node FROM ev),
walk(src, node, hop) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT w.src, b.dst, w.hop + 1
  FROM walk w JOIN bi b ON b.src = w.node
  WHERE w.hop < {ECC_MAX_HOPS}),
d AS (
  SELECT src, node, CAST(min(hop) AS BIGINT) AS d
  FROM walk WHERE src <> node GROUP BY src, node),
ec AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reached,
         CAST(max(d) AS BIGINT) AS ecc
  FROM d GROUP BY src),
fl AS (
  SELECT n.node, coalesce(ec.n_reached, 0) AS n_reached,
         coalesce(ec.ecc, 0) AS ecc
  FROM nodes n LEFT JOIN ec ON ec.node = n.node),
gl AS (
  SELECT CAST(coalesce(max(ecc), 0) AS BIGINT) AS diameter,
         CAST(coalesce(min(CASE WHEN n_reached > 0 THEN ecc END), 0)
              AS BIGINT) AS radius
  FROM fl)
SELECT f.node, f.n_reached, f.ecc, g.diameter, g.radius,
       CAST(CASE WHEN f.n_reached > 0 AND f.ecc = g.radius
                 THEN 1 ELSE 0 END AS INT) AS is_center,
       CAST(CASE WHEN f.n_reached > 0 AND f.ecc = g.diameter
                 THEN 1 ELSE 0 END AS INT) AS is_periphery
FROM fl f CROSS JOIN gl g
"""


@query("events_graph_eccentricity", oracle=_ECC_ORACLE)
def events_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated eccentricity of every page in the undirected transition
    graph (max BFS distance within {ECC_MAX_HOPS} hops), plus the graph
    diameter (max eccentricity), radius (min over reachable nodes), and
    center/periphery membership — the structural-extent companion to
    `events_harmonic_centrality` (proximity) over the same all-pairs-BFS
    machinery.

    Exactness: distances are integers; every output is an integer or a
    0/1 flag — nothing to round.  Scale: the transition graph is
    MODEL-BOUNDED (|V|² distinct edges, visit-count-independent), so per
    repo policy the all-pairs BFS runs driver-side over one collect() of
    the edge set; the corpus-sized work (events scan → distinct edges)
    stays distributed."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    edge_rows = und.collect()  # |V|²-bounded (model parameter, not corpus)
    nodes = sorted(r["k"] for r in ev.select("k").distinct().collect())
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for r in edge_rows:
        adj[r["u"]].add(r["v"])
        adj[r["v"]].add(r["u"])
    per_node = []
    for s in nodes:
        hop = {s: 0}
        frontier = [s]
        for h in range(1, ECC_MAX_HOPS + 1):
            frontier = sorted(
                {m for f in frontier for m in adj[f] if m not in hop}
            )
            for m in frontier:
                hop[m] = h
            if not frontier:
                break
        dists = [dd for n, dd in hop.items() if n != s]
        per_node.append((s, len(dists), max(dists) if dists else 0))
    diameter = max((e for _, _, e in per_node), default=0)
    reached_eccs = [e for _, n, e in per_node if n > 0]
    radius = min(reached_eccs) if reached_eccs else 0
    rows = [
        (
            s,
            n,
            e,
            diameter,
            radius,
            1 if n > 0 and e == radius else 0,
            1 if n > 0 and e == diameter else 0,
        )
        for s, n, e in per_node
    ]
    return spark.createDataFrame(
        rows,
        "node int, n_reached bigint, ecc bigint, diameter bigint, "
        "radius bigint, is_center int, is_periphery int",
    )


# --------------------------------------------------------------------------
# K-means cluster-outlier audit (on the shared SemDeDup member relation)
# --------------------------------------------------------------------------
#: Cosine-to-centroid below which a member is flagged as an outlier.
#: This testdata's ccos band runs ≈0.16–0.6 with p10 ≈ 0.22 (probed at
#: sf0.001), so 0.22 flags a real ~10% tail in every cluster; production
#: normalized-text embeddings sit much higher and run this at 0.6+.
OUTLIER_TAU = 0.22


def _outlier_oracle() -> str:
    from iceberg_table_generator_spark.operators.wave11 import (
        _sql_semdedup_ctes,
    )

    return f"""{_sql_semdedup_ctes()}
SELECT cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN ccos < {OUTLIER_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST((sum(CASE WHEN ccos < {OUTLIER_TAU} THEN 1 ELSE 0 END)
             * 1000000) // count(*) AS BIGINT) AS outlier_ppm,
       CAST(floor(min(ccos) * 1000000.0) AS BIGINT) AS min_ccos_micro,
       (min(struct_pack(c := ccos, v := vec_id))).v AS farthest_vec_id
FROM m GROUP BY cid
"""


@query("similarity_cluster_outlier_audit", oracle=_outlier_oracle())
def similarity_cluster_outlier_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-cluster embedding-outlier audit on the shared engine-exact
    k-means index: members whose cosine-to-centroid falls below
    τ = {OUTLIER_TAU} are mis-clustered / off-manifold candidates — the
    vectors a curation pass reviews before trusting SemDeDup or IVF
    routing decisions in that cluster.  Reports count, ppm share, the
    worst cosine (micro-floored), and the farthest member's id
    (deterministic (ccos, vec_id) struct-min).

    Oracle-paired end-to-end: reuses `_semdedup_relation`'s member
    relation and its DuckDB CTE twin, so cluster assignment AND the ccos
    chain are bit-identical on both engines.

    Scale: one cid-keyed map-combinable aggregation over the member
    relation (k = 16 groups); no windows, no joins beyond the broadcast
    centroid attach already inside the shared relation."""
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_relation,
    )

    m = _semdedup_relation(spark, sf_dir)
    return (
        m.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(
                F.when(F.col("ccos") < OUTLIER_TAU, 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.floor(F.min("ccos") * 1000000.0).cast("long").alias(
                "min_ccos_micro"
            ),
            F.min(F.struct(F.col("ccos"), F.col("vec_id"))).alias("far"),
        )
        .select(
            "cid",
            "n_members",
            "n_outliers",
            F.expr(
                "CAST((n_outliers * 1000000) div n_members AS BIGINT)"
            ).alias("outlier_ppm"),
            "min_ccos_micro",
            F.col("far.vec_id").alias("farthest_vec_id"),
        )
        .orderBy("cid")
    )
