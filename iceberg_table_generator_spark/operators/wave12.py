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
from iceberg_table_generator_spark.sources.tables import load_table, spread

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
                "CAST(sum(CAST(ll_pt_micro AS DECIMAL(38,0))) div count(1) "
                "AS BIGINT)"
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
       CAST((CAST(tokens_lost AS HUGEINT) * 1000000) // tokens_total
            AS BIGINT) AS loss_ppm
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
            "CAST((CAST(tokens_lost AS DECIMAL(38,0)) * 1000000) "
            "div tokens_total AS BIGINT)"
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
    the edge set — via the SAME `undirected_transition_adjacency` /
    `truncated_bfs_hops` substrate as harmonic centrality (wave10); the
    corpus-sized work (events scan → distinct edges) stays distributed."""
    from iceberg_table_generator_spark.operators.wave10 import (
        truncated_bfs_hops,
        undirected_transition_adjacency,
    )

    nodes, adj = undirected_transition_adjacency(spark, sf_dir)
    per_node = []
    for s in nodes:
        hop = truncated_bfs_hops(adj, s, ECC_MAX_HOPS)
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


# --------------------------------------------------------------------------
# Readability profile (Flesch reading-ease, integer micro arithmetic)
# --------------------------------------------------------------------------
_READABILITY_ORACLE = """
WITH f AS (
  SELECT source,
         greatest(len(string_split(text, ' ')), 1) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS s,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS y
  FROM documents),
pd AS (
  SELECT source, w, s, y,
         206835000 - (1015000 * w) // s - (84600000 * y) // w AS fm
  FROM f)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fm) // count(*) AS BIGINT) AS avg_flesch_micro,
       CAST(min(fm) AS BIGINT) AS min_flesch_micro,
       CAST(max(fm) AS BIGINT) AS max_flesch_micro,
       CAST((1000 * sum(w)) // sum(s) AS BIGINT) AS words_per_sentence_milli,
       CAST((1000 * sum(y)) // sum(w) AS BIGINT) AS syllables_per_word_milli
FROM pd GROUP BY source
"""


@query("text_readability_profile", oracle=_READABILITY_ORACLE)
def text_readability_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease profile: score = 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/word), with syllables
    approximated as vowel groups (`[aeiouy]+`) and every component
    floored into exact micro-integers — readability is the classic
    cheap quality signal next to stopword/punctuation ratios, and a
    feed whose average score collapses is machine-generated or OCR
    garbage.  All counters are per-row regexp counts (zero-shuffle
    narrow pass); the single shuffle is the 20-row source rollup.

    Engine determinism: the score is a pure integer formula
    (206835000 − 1015000·w div s − 84600000·y div w); Spark `div` and
    DuckDB `//` both truncate toward zero (probed), so no floats exist
    anywhere."""
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "source",
        F.greatest(F.size(F.split("text", " ")), F.lit(1))
        .cast("long")
        .alias("w"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]"), 0)), F.lit(1)
        )
        .cast("long")
        .alias("s"),
        F.greatest(
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
            ),
            F.lit(1),
        )
        .cast("long")
        .alias("y"),
    )
    pd = f.withColumn(
        "fm",
        F.expr("206835000 - (1015000 * w) div s - (84600000 * y) div w"),
    )
    return (
        pd.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            # per-source sums accumulate in DECIMAL(38,0) for 100 TB
            # headroom (matches DuckDB's HUGEINT sum); div truncates
            # identically on both engines.
            F.expr(
                "CAST(sum(CAST(fm AS DECIMAL(38,0))) div count(1) "
                "AS BIGINT)"
            ).alias("avg_flesch_micro"),
            F.min("fm").cast("long").alias("min_flesch_micro"),
            F.max("fm").cast("long").alias("max_flesch_micro"),
            F.expr(
                "CAST((1000 * sum(CAST(w AS DECIMAL(38,0)))) div sum(s) "
                "AS BIGINT)"
            ).alias("words_per_sentence_milli"),
            F.expr(
                "CAST((1000 * sum(CAST(y AS DECIMAL(38,0)))) div sum(w) "
                "AS BIGINT)"
            ).alias("syllables_per_word_milli"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# PII incidence matrix (per source x PII type)
# --------------------------------------------------------------------------
_PII_INCIDENCE_ORACLE = None  # assembled below from pipeline's patterns


def _pii_incidence_oracle() -> str:
    from iceberg_table_generator_spark.operators.pipeline import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )

    return f"""
WITH planted AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 < 3
                 THEN ' contact user' || doc_id || '@mail.example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 < 2
                 THEN ' call 555-'
                      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-'
                      || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 3 < 1
                 THEN ' from 10.' || (doc_id % 256) || '.0.'
                      || ((doc_id * 3) % 256)
                 ELSE '' END AS pii_text
  FROM documents),
cnt AS (
  SELECT source,
         CASE WHEN len(regexp_extract_all(pii_text, '{_PII_EMAIL}')) > 0
              THEN 1 ELSE 0 END AS he,
         CASE WHEN len(regexp_extract_all(pii_text, '{_PII_PHONE}')) > 0
              THEN 1 ELSE 0 END AS hp,
         CASE WHEN len(regexp_extract_all(pii_text, '{_PII_IP}')) > 0
              THEN 1 ELSE 0 END AS hi
  FROM planted)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(he) AS BIGINT) AS docs_with_email,
       CAST(sum(hp) AS BIGINT) AS docs_with_phone,
       CAST(sum(hi) AS BIGINT) AS docs_with_ip,
       CAST(sum(CASE WHEN he + hp + hi > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_with_any,
       CAST((sum(he) * 1000000) // count(*) AS BIGINT) AS email_ppm,
       CAST((sum(hp) * 1000000) // count(*) AS BIGINT) AS phone_ppm,
       CAST((sum(hi) * 1000000) // count(*) AS BIGINT) AS ip_ppm
FROM cnt GROUP BY source
"""


@query("pipeline_pii_incidence", oracle=_pii_incidence_oracle())
def pipeline_pii_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII incidence matrix — the compliance dashboard next to
    `pipeline_pii_redaction`'s scrubber: which feeds leak emails / phone
    numbers / IPv4 addresses and at what document rate (ppm).  The corpus
    text is synthetic word soup, so PII is PLANTED deterministically on
    modular doc_id subsets (email on ~3/7 of docs, phone ~2/5, IP ~1/3)
    and detected back through the SAME regex patterns the redaction pass
    uses — the detection path, not the plant, is the deliverable.

    Scale: pure narrow per-row regexp detection (JVM `regexp_count`-class
    expressions, no Python), then the 20-row source rollup."""
    from iceberg_table_generator_spark.operators.pipeline import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )

    docs = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 < 3,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 < 2,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((F.col("doc_id") * 37) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 3 < 1,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                ((F.col("doc_id") * 3) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    planted = docs.select("source", pii_text.alias("pii_text"))
    cnt = planted.select(
        "source",
        F.when(
            F.size(F.regexp_extract_all("pii_text", F.lit(_PII_EMAIL), 0)) > 0,
            1,
        )
        .otherwise(0)
        .alias("he"),
        F.when(
            F.size(F.regexp_extract_all("pii_text", F.lit(_PII_PHONE), 0)) > 0,
            1,
        )
        .otherwise(0)
        .alias("hp"),
        F.when(
            F.size(F.regexp_extract_all("pii_text", F.lit(_PII_IP), 0)) > 0, 1
        )
        .otherwise(0)
        .alias("hi"),
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("he").cast("long").alias("docs_with_email"),
            F.sum("hp").cast("long").alias("docs_with_phone"),
            F.sum("hi").cast("long").alias("docs_with_ip"),
            F.sum(
                F.when(F.col("he") + F.col("hp") + F.col("hi") > 0, 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("docs_with_any"),
            F.expr(
                "CAST((sum(he) * 1000000) div count(1) AS BIGINT)"
            ).alias("email_ppm"),
            F.expr(
                "CAST((sum(hp) * 1000000) div count(1) AS BIGINT)"
            ).alias("phone_ppm"),
            F.expr(
                "CAST((sum(hi) * 1000000) div count(1) AS BIGINT)"
            ).alias("ip_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Pairwise source Hellinger distance (content-drift matrix, sqrt-exact)
# --------------------------------------------------------------------------
_HELLINGER_ORACLE = """
WITH cells AS (
  SELECT source, w.w AS word, CAST(count(*) AS BIGINT) AS c
  FROM documents, unnest(string_split(lower(text), ' ')) AS w(w)
  GROUP BY 1, 2),
per AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY source),
words AS (SELECT DISTINCT word FROM cells),
grid AS (
  SELECT pa.source AS src_a, pa.n AS n_a, pb.source AS src_b, pb.n AS n_b
  FROM per pa JOIN per pb ON pa.source < pb.source),
terms AS (
  SELECT g.src_a, g.src_b, g.n_a, g.n_b,
         CAST(round(sqrt((CAST(COALESCE(ca.c, 0) AS DOUBLE)
                          * COALESCE(cb.c, 0))
                         / (CAST(g.n_a AS DOUBLE) * g.n_b))
                    * 1000000000.0, 0) AS BIGINT) AS bc_term
  FROM grid g CROSS JOIN words w
  LEFT JOIN cells ca ON ca.source = g.src_a AND ca.word = w.word
  LEFT JOIN cells cb ON cb.source = g.src_b AND cb.word = w.word)
SELECT src_a, src_b, n_a AS tokens_a, n_b AS tokens_b,
       CAST(sum(bc_term) AS BIGINT) AS bc_nano,
       round(sqrt(greatest(1.0 - CAST(sum(bc_term) AS DOUBLE) / 1000000000.0,
                           0.0)), 6) AS hellinger
FROM terms GROUP BY src_a, src_b, n_a, n_b
"""


@query("text_source_hellinger", oracle=_HELLINGER_ORACLE)
def text_source_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Hellinger distance between source unigram distributions —
    the geometric companion to `text_source_unigram_tv`: TV weights every
    frequency gap linearly (dominated by head words), Hellinger's
    √(p·q) Bhattacharyya kernel is sensitive to SUPPORT disagreement
    (tail words one source lacks), so the two matrices disagree exactly
    when sources share head vocabulary but diverge in the tail — the
    signature of same-template-different-content scrapes.

    Engine determinism: unlike ln(), IEEE sqrt and division are
    correctly-rounded on both engines, so each per-word √(c_a·c_b /
    (n_a·n_b)) term is bit-identical; terms are NANO-rounded to BIGINT
    and summed exactly (order-free), and the final 1−BC√ is one shared
    double chain rounded once.  Nano (1e9), not micro, units: each
    rounded term carries ≤ 0.5 units of signed error, so the
    accumulated bound is |vocab|/2 units — at a production vocabulary
    of 10^7 words that is ≤ 5e6 nano = 0.005 of the BC mass (vs 5.0 —
    the whole scale — in micro units; r11 ADVICE).  Headroom is safe:
    BC ≤ 1 ⟹ the sum is ≤ 1e9 + |vocab|/2 ≪ 2^63.

    Scale: identical posture to the TV matrix — word cells aggregate
    map-side, the per-word count MAP meets the 190-row source-pair grid
    in one vocabulary×pairs pass, and the only join key is the bounded
    source domain."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cells = persist_tracked(cells)
    per = cells.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    wmap = cells.groupBy("word").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "c"))).alias("m")
    )
    pa = per.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    grid = pa.join(pb, pa.src_a < pb.src_b)
    ca = F.coalesce(F.element_at("m", F.col("src_a")), F.lit(0))
    cb = F.coalesce(F.element_at("m", F.col("src_b")), F.lit(0))
    terms = wmap.crossJoin(grid).select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        F.round(
            F.sqrt(
                (ca.cast("double") * cb)
                / (F.col("n_a").cast("double") * F.col("n_b"))
            )
            * 1000000000.0,
            0,
        )
        .cast("long")
        .alias("bc_term"),
    )
    return (
        terms.groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(F.sum("bc_term").cast("long").alias("bc_nano"))
        .select(
            "src_a",
            "src_b",
            F.col("n_a").alias("tokens_a"),
            F.col("n_b").alias("tokens_b"),
            "bc_nano",
            F.round(
                F.sqrt(
                    F.greatest(
                        F.lit(1.0)
                        - F.col("bc_nano").cast("double") / 1000000000.0,
                        F.lit(0.0),
                    )
                ),
                6,
            ).alias("hellinger"),
        )
    )


# --------------------------------------------------------------------------
# Distinctive terms per source (Dunning log-likelihood keyness)
# --------------------------------------------------------------------------
KEYNESS_TOP_K = 5

_KEYNESS_G2 = """2.0 * (
    CAST(a AS DOUBLE)
      * ln(CAST(a AS DOUBLE) / (CAST(g AS DOUBLE) * ts / t))
    + CASE WHEN g - a > 0
           THEN CAST(g - a AS DOUBLE)
                * ln(CAST(g - a AS DOUBLE)
                     / (CAST(g AS DOUBLE) * (t - ts) / t))
           ELSE 0.0 END
    + CASE WHEN ts - a > 0
           THEN CAST(ts - a AS DOUBLE)
                * ln(CAST(ts - a AS DOUBLE)
                     / (CAST(t - g AS DOUBLE) * ts / t))
           ELSE 0.0 END
    + CASE WHEN t - ts - (g - a) > 0
           THEN CAST(t - ts - (g - a) AS DOUBLE)
                * ln(CAST(t - ts - (g - a) AS DOUBLE)
                     / (CAST(t - g AS DOUBLE) * (t - ts) / t))
           ELSE 0.0 END)"""

_KEYNESS_ORACLE = f"""
WITH cells AS (
  SELECT source, w.w AS word, CAST(count(*) AS BIGINT) AS a
  FROM documents, unnest(string_split(lower(text), ' ')) AS w(w)
  GROUP BY 1, 2),
per AS (SELECT source, CAST(sum(a) AS BIGINT) AS ts FROM cells GROUP BY source),
ws AS (SELECT word, CAST(sum(a) AS BIGINT) AS g FROM cells GROUP BY word),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS t FROM cells),
base AS (
  SELECT c.source AS source, c.word AS word, c.a AS a, w.g AS g,
         p.ts AS ts, tt.t AS t
  FROM cells c
  JOIN ws w USING (word)
  JOIN per p ON p.source = c.source
  CROSS JOIN tot tt
  WHERE CAST(c.a AS DECIMAL(38,0)) * tt.t
        > CAST(w.g AS DECIMAL(38,0)) * p.ts),
sc AS (
  SELECT source, word, a, g,
         CAST(round(({_KEYNESS_G2}) * 1000000.0, 0) AS BIGINT) AS g2_micro
  FROM base),
rk AS (
  SELECT source, word, a, g, g2_micro,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY g2_micro DESC, word) AS INT) AS rank
  FROM sc)
SELECT source, word, CAST(a AS BIGINT) AS src_count,
       CAST(g AS BIGINT) AS corpus_count, g2_micro, rank
FROM rk WHERE rank <= {KEYNESS_TOP_K}
"""


def keyness_scored_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, word, a, g, raw_g2, g2_micro) for every over-represented
    (source, word) cell — shared by `text_distinctive_terms` and the
    rounding-margin guard test."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    cells = persist_tracked(cells)
    per = cells.groupBy("source").agg(F.sum("a").cast("long").alias("ts"))
    ws = cells.groupBy("word").agg(F.sum("a").cast("long").alias("g"))
    tot = cells.agg(F.sum("a").cast("long").alias("t"))
    joined = (
        cells.join(ws, "word")
        # NOTE: no broadcast hint on `per` — its boundedness (one row per
        # source feed) is a model fact, not a plan-structural one, so the
        # broadcast-invariant suite would flag it; the source-keyed
        # shuffle join of a |sources|-row relation is free at any scale.
        .join(per, "source")
        .crossJoin(F.broadcast(tot))
        .filter(
            F.col("a").cast("decimal(38,0)") * F.col("t")
            > F.col("g").cast("decimal(38,0)") * F.col("ts")
        )
    )
    raw_g2 = F.expr(_KEYNESS_G2)
    return joined.select(
        "source",
        "word",
        "a",
        "g",
        raw_g2.alias("raw_g2"),
        F.round(raw_g2 * 1000000.0, 0).cast("long").alias("g2_micro"),
    )


@query("text_distinctive_terms", oracle=_KEYNESS_ORACLE)
def text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{KEYNESS_TOP_K} DISTINCTIVE terms per source by Dunning (1993)
    log-likelihood keyness: G² of the 2×2 (term, source) contingency
    table, restricted to over-represented terms (a/ts > g/t by exact
    integer cross-multiplication) — the corpus-linguistics "what makes
    this feed different" extractor, sharper than raw tf-idf because it
    accounts for both corpus sides of the contrast.

    Engine determinism: the G² double chain is shared verbatim between
    engines (the SQL text IS the Spark expression via `F.expr`) and
    micro-rounded per (source, word) cell before ranking, so ranks
    compare identically-rounded integers (ln-ulp absorbed; margin pinned
    by the guard test).

    Scale: word cells aggregate map-side; g attaches by a word-keyed 1:1
    join (the tf·idf shape); ts and t attach as broadcasts of the
    20-row / 1-row relations; the rank window partitions by source over
    the vocabulary-bounded over-represented subset."""
    scored = keyness_scored_terms(spark, sf_dir).drop("raw_g2")
    w = Window.partitionBy("source").orderBy(F.desc("g2_micro"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KEYNESS_TOP_K)
        .select(
            "source",
            "word",
            F.col("a").alias("src_count"),
            F.col("g").alias("corpus_count"),
            "g2_micro",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# Revenue max drawdown (time-domain risk curve)
# --------------------------------------------------------------------------
_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) * 100 AS BIGINT)
             AS rev_cents
  FROM orders GROUP BY o_orderdate),
runp AS (
  SELECT day, rev_cents,
         CAST(max(rev_cents) OVER (ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS peak_cents
  FROM daily),
dd AS (
  SELECT day, rev_cents, peak_cents,
         peak_cents - rev_cents AS dd_cents,
         CAST(((peak_cents - rev_cents) * 10000) // peak_cents AS BIGINT)
             AS dd_bp
  FROM runp),
mx AS (SELECT CAST(max(dd_cents) AS BIGINT) AS max_dd FROM dd)
SELECT CAST(d.day AS VARCHAR) AS day, d.rev_cents, d.peak_cents,
       CAST(d.dd_cents AS BIGINT) AS dd_cents, d.dd_bp,
       CAST(CASE WHEN d.dd_cents = m.max_dd AND m.max_dd > 0
                 THEN 1 ELSE 0 END AS INT) AS is_max_drawdown
FROM dd d CROSS JOIN mx m
"""


@query("orders_revenue_drawdown", oracle=_DRAWDOWN_ORACLE)
def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue drawdown curve: running peak, absolute and
    basis-point drawdown per day, and the max-drawdown day(s) — the
    risk/monitoring view of the revenue series (a deep drawdown is the
    page that gets ops out of bed; `orders_mom_growth` sees only
    month-grain first differences).

    Exactness: revenue is DECIMAL-summed to integer cents (repo
    convention); peak/drawdown/bp are pure integer ops.  Scale: one
    calendar-bounded daily aggregate, ONE unpartitioned running-max
    window over the day-domain relation (acknowledged in the window
    invariant suite: one row per calendar day), and the max flag joins a
    scalar aggregate back — never a second pass over facts."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 100)
        .cast("long")
        .alias("rev_cents")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        "rev_cents",
        F.max("rev_cents").over(wd).cast("long").alias("peak_cents"),
    ).select(
        "day",
        "rev_cents",
        "peak_cents",
        (F.col("peak_cents") - F.col("rev_cents")).cast("long").alias("dd_cents"),
        F.expr(
            "CAST(((peak_cents - rev_cents) * 10000) div peak_cents AS BIGINT)"
        ).alias("dd_bp"),
    )
    mx = dd.agg(F.max("dd_cents").cast("long").alias("max_dd"))
    return dd.crossJoin(F.broadcast(mx)).select(
        F.col("day").cast("string").alias("day"),
        "rev_cents",
        "peak_cents",
        "dd_cents",
        "dd_bp",
        F.when((F.col("dd_cents") == F.col("max_dd")) & (F.col("max_dd") > 0), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_max_drawdown"),
    )


# --------------------------------------------------------------------------
# Character-entropy profile (encoding-garbage detector)
# --------------------------------------------------------------------------
_CHAR_ENTROPY_ORACLE = """
WITH cells AS (
  SELECT source, c.c AS ch, CAST(count(*) AS BIGINT) AS c
  FROM documents, unnest(string_split(text, '')) AS c(c)
  GROUP BY 1, 2),
per AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY source),
terms AS (
  SELECT cells.source, cells.c,
         CAST(round((ln(CAST(cells.c AS DOUBLE)) - ln(CAST(per.n AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS lnp_micro
  FROM cells JOIN per USING (source))
SELECT t.source, p.n AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       CAST((0 - sum(CAST(t.c AS HUGEINT) * t.lnp_micro)) // p.n
            AS BIGINT) AS entropy_micro
FROM terms t JOIN per p ON p.source = t.source
GROUP BY t.source, p.n
"""


def char_lnp_terms(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """((source, ch, c, raw_lnp, lnp_micro), per-source totals): the
    character-distribution log-probabilities — shared by
    `text_char_entropy_profile` and the rounding-margin guard test."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.select("source", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("source", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cells = persist_tracked(cells)
    per = cells.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    raw_lnp = F.log(F.col("c").cast("double")) - F.log(
        F.col("n").cast("double")
    )
    terms = cells.join(per, "source").select(
        "source",
        "ch",
        "c",
        raw_lnp.alias("raw_lnp"),
        F.round(raw_lnp * 1000000.0, 0).cast("long").alias("lnp_micro"),
    )
    return terms, per


@query("text_char_entropy_profile", oracle=_CHAR_ENTROPY_ORACLE)
def text_char_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-distribution Shannon entropy (nats, micro):
    the Gopher/C4-family encoding-garbage detector — mojibake, base64
    blobs, and binary-in-text all push character entropy far from a
    natural language's band, and a per-feed profile catches a bad
    scraper in one glance.  Also reports the distinct-character count
    (alphabet width, the cheap script/charset-mix signal).

    Engine determinism: ln p(ch) is micro-rounded per (source, char)
    CELL (bounded domain: |sources| × alphabet), then H =
    −Σ c·lnp_micro / n is exact integer arithmetic.

    Scale: the char explode is the `text_fingerprint` pass (narrow,
    map-side combinable into |alphabet|-bounded cells per source);
    everything downstream lives on the bounded cell domain."""
    terms, per = char_lnp_terms(spark, sf_dir)
    # c·lnp accumulates in DECIMAL(38,0): at 100 TB a source's count of a
    # common character (~1e15) times a micro log-prob (~1e7) exceeds int64.
    agg = terms.groupBy("source").agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("lnp_micro"))
        .cast("decimal(38,0)")
        .alias("c_lnp"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
    )
    return (
        agg.join(per, "source")
        .select(
            "source",
            F.col("n").alias("n_chars"),
            "n_distinct_chars",
            F.expr("CAST((0 - c_lnp) div n AS BIGINT)").alias(
                "entropy_micro"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Bigram-LM cross-entropy (sequence-level quality proxy)
# --------------------------------------------------------------------------
_BIGRAM_LOGLOSS_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM tok WHERE len(ws) >= 2),
dc AS (
  SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM bi
  GROUP BY doc_id, bg),
bgc AS (
  SELECT bg, string_split(bg, ' ')[1] AS w1,
         CAST(sum(c) AS BIGINT) AS c12
  FROM dc GROUP BY bg),
hist AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS h FROM bgc GROUP BY w1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS v
        FROM (SELECT DISTINCT string_split(bg, ' ')[2] FROM bgc)),
lnp AS (
  SELECT b.bg,
         CAST(round((ln(b.c12 + 1.0) - ln(CAST(hi.h + t.v AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS lnp_micro
  FROM bgc b JOIN hist hi USING (w1) CROSS JOIN tot t),
pd AS (
  SELECT doc_id,
         CAST((0 - sum(c * lnp_micro)) // sum(c) AS BIGINT) AS ll_pt_micro,
         CAST(sum(c) AS BIGINT) AS n_bigrams
  FROM dc JOIN lnp USING (bg) GROUP BY doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(sum(p.ll_pt_micro) // count(*) AS BIGINT) AS avg_logloss_micro,
       CAST(min(p.ll_pt_micro) AS BIGINT) AS min_logloss_micro,
       CAST(max(p.ll_pt_micro) AS BIGINT) AS max_logloss_micro
FROM pd p JOIN documents d USING (doc_id)
GROUP BY d.source
"""


@query("text_bigram_logloss", oracle=_BIGRAM_LOGLOSS_ORACLE)
def text_bigram_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram-LM cross-entropy — the SEQUENCE-level quality
    proxy next to `text_unigram_logloss`'s bag-of-words one (the KenLM
    filtering tier): p(w₂|w₁) = (c(w₁w₂)+1)/(h(w₁)+V) with add-one
    smoothing over the second-word vocabulary, scored per document and
    profiled per source.  A feed whose bigram logloss exceeds its
    unigram logloss by an unusual margin is shuffled/templated text —
    plausible words in implausible orders.

    Engine determinism: per-BIGRAM micro-rounded ln p (BM25 pattern),
    exact integer accumulation; truncating integer division on
    all-positive operands.

    Scale: bigrams build IN-ROW (the `pipeline_repetition_stats`
    transform — no self-join); bigram counts and histories are
    map-combinable aggregates; the score join attaches per-bigram λ to
    (doc, bigram) COUNTS, 1:1 multiplicity, AQE-skew-splittable."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    bi = tok.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat_ws(' ', ws[i-1], ws[i]))"
            )
        ).alias("bg"),
    )
    dc = bi.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    dc = persist_tracked(dc)
    bgc = dc.groupBy("bg").agg(F.sum("c").cast("long").alias("c12")).select(
        "bg", F.split("bg", " ").getItem(0).alias("w1"), "c12"
    )
    bgc = persist_tracked(bgc)
    hist = bgc.groupBy("w1").agg(F.sum("c12").cast("long").alias("h"))
    tot = (
        bgc.select(F.split("bg", " ").getItem(1).alias("w2"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    lnp = (
        bgc.join(hist, "w1")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.round(
                (
                    F.log(F.col("c12") + 1.0)
                    - F.log((F.col("h") + F.col("v")).cast("double"))
                )
                * 1000000.0,
                0,
            )
            .cast("long")
            .alias("lnp_micro"),
        )
    )
    pd = (
        dc.join(lnp, "bg")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST((0 - sum(c * lnp_micro)) div sum(c) AS BIGINT)"
            ).alias("ll_pt_micro"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    return (
        pd.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.expr(
                "CAST(sum(CAST(ll_pt_micro AS DECIMAL(38,0))) div count(1) "
                "AS BIGINT)"
            ).alias("avg_logloss_micro"),
            F.min("ll_pt_micro").cast("long").alias("min_logloss_micro"),
            F.max("ll_pt_micro").cast("long").alias("max_logloss_micro"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# SQ8 (int8 scalar quantization) ADC search + recall vs exact
# --------------------------------------------------------------------------
def _sq8_recall_oracle() -> str:
    from iceberg_table_generator_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _VEC_DIM,
    )

    dim = _VEC_DIM
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> c.qv[i] * q.vec[i]))"
    )
    xdot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> q.vec[i] * c.vec[i]))"
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(generate_series(1, {dim}),
                                      i -> vec[i] * vec[i]))) AS norm
  FROM v),
c AS (
  SELECT vec_id, vec, norm,
         greatest(list_max(list_transform(vec, x -> abs(x))), 1e-12) / 127.0
           AS scale
  FROM n),
cq AS (
  SELECT vec_id, vec, norm, scale,
         list_transform(vec, x -> round(x / scale)) AS qv
  FROM c),
apx AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         (c.scale * {dot}) / (q.norm * c.norm) AS sim
  FROM n q JOIN cq c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
apk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rn
    FROM apx) WHERE rn <= {TOP_K}),
ext AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {xdot} / (q.norm * c.norm) AS sim
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
epk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rn
    FROM ext) WHERE rn <= {TOP_K}),
hits AS (
  SELECT e.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM epk e LEFT JOIN apk a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id)
SELECT query_id, CAST({TOP_K} AS INT) AS k, n_hits,
       CAST((n_hits * 1000000) // {TOP_K} AS BIGINT) AS recall_ppm
FROM hits
"""


@query("similarity_sq8_recall", oracle=_sq8_recall_oracle())
def similarity_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 asymmetric-distance (ADC) search + recall@k vs exact: score
    every query (raw doubles) against the int8-quantized corpus —
    sim ≈ (scale·Σq̂ᵢxᵢ)/(‖x‖‖c‖) — and report per-query overlap with
    the exact cosine top-k.  Completes the quantized-search family:
    IVF (`similarity_ivf_topk` + nprobe recall) prunes CANDIDATES, PQ
    (`similarity_pq_topk` + distortion) and SQ8 (this + the int8
    distortion audit) compress the SCORING; SQ8 is the 4×-smaller
    index tier every production ANN stack offers.

    Engine determinism: the quantizer is `similarity_quantize_int8`'s
    exact formula (round(x/scale), IEEE ops bit-identical on both
    engines), the ADC fold is one shared in-row op tree, and ties break
    on neighbor_id — so approx AND exact rankings are bit-reproducible,
    making recall an exact integer.

    Scale: the query set broadcasts (N_QUERIES rows); the candidate
    stream quantizes in-row and never shuffles; both rank windows are
    (n_queries × k)-bounded."""
    from iceberg_table_generator_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _dot,
        similarity_cosine_topk,
        with_norm,
    )

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    scale = (
        F.greatest(
            F.array_max(F.transform("vec", lambda x: F.abs(x))), F.lit(1e-12)
        )
        / 127.0
    )
    cq = cand.withColumn("scale", scale).withColumn(
        "qv", F.transform("vec", lambda x: F.round(x / F.col("scale")))
    )
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    apx = (
        cq.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                (F.col("scale") * _dot("qv", "qvec"))
                / (F.col("qnorm") * F.col("norm"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    apk = (
        apx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    epk = similarity_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        epk.alias("e")
        .join(
            apk.alias("a"),
            (F.col("e.query_id") == F.col("a.query_id"))
            & (F.col("e.neighbor_id") == F.col("a.neighbor_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(F.count(F.col("a.neighbor_id")).cast("long").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.lit(TOP_K).cast("int").alias("k"),
        "n_hits",
        F.expr(f"CAST((n_hits * 1000000) div {TOP_K} AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Incremental SemDeDup (new batch vs stored exemplars)
# --------------------------------------------------------------------------
def _semdedup_incremental_oracle() -> str:
    from iceberg_table_generator_spark.operators.similarity import _VEC_DIM
    from iceberg_table_generator_spark.operators.wave11 import (
        SEMDEDUP_TAU,
        _sql_semdedup_ctes,
    )

    dim = _VEC_DIM
    duv = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> u.vec[i] * v.vec[i]))"
    )
    return f"""{_sql_semdedup_ctes()},
old AS (SELECT * FROM m WHERE vec_id % 10 <> 0),
dold AS (
  SELECT DISTINCT v.cid, v.vec_id
  FROM old u JOIN old v ON u.cid = v.cid
   AND (u.ccos < v.ccos OR (u.ccos = v.ccos AND u.vec_id < v.vec_id))
  WHERE {duv} / (u.nrm * v.nrm) >= {SEMDEDUP_TAU}),
kept AS (
  SELECT o.* FROM old o
  LEFT JOIN dold d ON d.cid = o.cid AND d.vec_id = o.vec_id
  WHERE d.vec_id IS NULL),
newv AS (SELECT * FROM m WHERE vec_id % 10 = 0),
hits AS (
  SELECT v.vec_id, u.vec_id AS u_id
  FROM kept u JOIN newv v ON u.cid = v.cid
  WHERE {duv} / (u.nrm * v.nrm) >= {SEMDEDUP_TAU}),
ag AS (
  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(min(u_id) AS BIGINT) AS shadow_exemplar
  FROM hits GROUP BY vec_id)
SELECT n.vec_id, n.cid,
       CASE WHEN a.n_hits IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict,
       CAST(coalesce(a.n_hits, 0) AS BIGINT) AS n_hits,
       a.shadow_exemplar
FROM newv n LEFT JOIN ag a USING (vec_id)
"""


@query("dedup_semdedup_incremental", oracle=_semdedup_incremental_oracle())
def dedup_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup — the production shape SemDeDup runs in
    after day one: the STORED exemplar index is the kept set of a
    SemDeDup pass over the existing corpus (vec_id % 10 ≠ 0 here); each
    NEWLY INGESTED vector (vec_id % 10 = 0, the bench-fraction split) is
    dropped iff a same-cluster stored exemplar sits within cosine τ —
    new data never reshuffles the index, exactly like
    `dedup_incremental_verdict` for the exact tier.

    Oracle-paired end-to-end on the shared engine-exact k-means member
    relation; DuckDB replays the old-corpus prefix-dominance pass, the
    kept-set anti-join, and the new-vs-kept probe with the identical
    cosine chains.

    Scale: both pair joins are cid-co-partitioned (never broadcast of
    corpus data), the new batch is a small fraction of the corpus, and
    the stored side is the POST-dedup exemplar set — the cheapest
    relation the pipeline owns."""
    from iceberg_table_generator_spark.operators.similarity import _dot
    from iceberg_table_generator_spark.operators.wave11 import (
        SEMDEDUP_TAU,
        _semdedup_dropped,
        _semdedup_relation,
    )

    m = _semdedup_relation(spark, sf_dir)
    old = m.filter(F.col("vec_id") % 10 != 0)
    new = m.filter(F.col("vec_id") % 10 == 0)
    dropped_old = _semdedup_dropped(old)
    kept = old.join(dropped_old, ["cid", "vec_id"], "left_anti")
    u = kept.select(
        "cid",
        F.col("vec_id").alias("u_id"),
        F.col("vec").alias("u_vec"),
        F.col("nrm").alias("u_nrm"),
    )
    v = new.select("cid", "vec_id", "vec", "nrm")
    hits = (
        u.join(v, "cid")
        .filter(
            _dot("u_vec", "vec") / (F.col("u_nrm") * F.col("nrm"))
            >= SEMDEDUP_TAU
        )
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("u_id").cast("long").alias("shadow_exemplar"),
        )
    )
    return new.select("vec_id", "cid").join(hits, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.when(F.col("n_hits").isNotNull(), "drop")
        .otherwise("keep")
        .alias("verdict"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        "shadow_exemplar",
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution (channel value via absorbing walks)
# --------------------------------------------------------------------------
ATTR_SCALE = 1_000_000_000_000  # micro-units of probability (1e12)
ATTR_ITERS = 8
ATTR_TARGET = 0  # conversion page (the absorption query's landing page)
ATTR_CHANNELS = 8  # top pages by out-weight get a removal run


def _attribution_oracle() -> str:
    ctes = [
        "ev AS (SELECT user_id, ts, event_id,"
        " CAST(props->>'$.k' AS INT) AS k FROM events)",
        "seq AS (SELECT k AS src, lead(k) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev)",
        "edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt"
        " FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)",
        "outw AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outw"
        " FROM edges GROUP BY src)",
        "er AS (SELECT e.src, e.dst, e.cnt, o.outw"
        " FROM edges e JOIN outw o USING (src))",
        "nodes AS (SELECT DISTINCT k AS node FROM ev)",
        "st AS (SELECT k AS node, CAST(count(*) AS BIGINT) AS sc FROM ("
        " SELECT user_id, k, row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS rn FROM ev) WHERE rn = 1 GROUP BY k)",
        f"rems AS (SELECT rem FROM (SELECT CAST(src AS INT) AS rem"
        f" FROM outw WHERE src <> {ATTR_TARGET}"
        f" ORDER BY outw DESC, src LIMIT {ATTR_CHANNELS})"
        f" UNION ALL SELECT -1)",
        "erx AS (SELECT r.rem, e.src, e.dst, e.cnt, e.outw"
        " FROM er e CROSS JOIN rems r)",
        "grid AS (SELECT r.rem, n.node FROM nodes n CROSS JOIN rems r)",
        f"g0 AS (SELECT rem, node, CAST(CASE WHEN node = {ATTR_TARGET}"
        f" THEN {ATTR_SCALE} ELSE 0 END AS BIGINT) AS h FROM grid)",
    ]
    for i in range(1, ATTR_ITERS + 1):
        ctes.append(
            f"g{i} AS (SELECT gr.rem, gr.node,"
            f" CAST(CASE WHEN gr.node = {ATTR_TARGET} THEN {ATTR_SCALE}"
            f" WHEN gr.node = gr.rem THEN 0"
            f" ELSE COALESCE(CAST(sum(CAST(p.cnt AS HUGEINT) * p.h)"
            f" // any_value(p.outw) AS BIGINT), 0) END AS BIGINT) AS h"
            f" FROM grid gr LEFT JOIN"
            f" (SELECT ex.rem, ex.src, ex.cnt, ex.outw, hp.h"
            f"  FROM erx ex JOIN g{i - 1} hp"
            f"  ON ex.dst = hp.node AND ex.rem = hp.rem) p"
            f" ON p.src = gr.node AND p.rem = gr.rem"
            f" GROUP BY gr.rem, gr.node)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
conv AS (
  SELECT g.rem, CAST(sum(CAST(s.sc AS HUGEINT) * g.h) AS HUGEINT) AS cv
  FROM g{ATTR_ITERS} g JOIN st s ON s.node = g.node GROUP BY g.rem),
tots AS (SELECT CAST(sum(sc) AS BIGINT) AS t FROM st),
base AS (SELECT cv AS bcv FROM conv WHERE rem = -1)
SELECT c.rem AS channel, o.outw AS out_visits,
       CAST(c.cv // t.t AS BIGINT) AS conv_micro,
       CAST(b.bcv // t.t AS BIGINT) AS base_micro,
       CAST(CASE WHEN b.bcv > 0
                 THEN ((b.bcv - c.cv) * 1000000) // b.bcv
                 ELSE 0 END AS BIGINT) AS removal_effect_ppm
FROM conv c CROSS JOIN base b CROSS JOIN tots t
JOIN outw o ON o.src = c.rem
WHERE c.rem <> -1
"""


@query("events_markov_attribution", oracle=_attribution_oracle())
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: the value of each major page
    (top-{ATTR_CHANNELS} by out-weight) = how much the start-weighted
    probability of reaching the conversion page within {ATTR_ITERS}
    clicks DROPS when walks through that page are killed — the
    data-driven alternative to first/last-touch attribution
    (`events_attribution_first_touch`), built by composing the
    absorption-probability machinery (`events_absorption_probability`)
    with a channel-removal grid.  Removal is absorbing-to-null: h(rem)
    is pinned to 0 every iteration, so any walk entering the removed
    page never converts.

    Engine-exactness: identical to the absorption query — 128-bit
    cnt·h products summed exactly, ONE truncating division per (rem,
    node, iteration); conversion mass start-weights the final h with
    exact integer session-start counts; DuckDB replays the unrolled
    (rem × node) CTE chain bit-identically.  Removal effects are
    non-negative by monotone induction (killing walks can't create
    conversions).

    Scale: the transition graph is MODEL-BOUNDED (|V|² distinct edges),
    so per repo policy (the PageRank/harmonic/eccentricity precedent)
    the (channels+1) × {ATTR_ITERS}-iteration fixed point runs
    DRIVER-side over one collect() of the edge/start relations — the
    distributed-iteration version measured 10.5 s of pure Spark
    job-scheduling constant at sf0.1 for identical results.  The
    corpus-sized work (events scan → windowed transitions → edge/start
    aggregates) stays distributed; Python's arbitrary-precision ints
    subsume the 128-bit products, and `//` on non-negative operands
    matches both engines' truncating division."""
    from iceberg_table_generator_spark.operators.wave10 import nav_events

    ev = nav_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    edges = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    starts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("k").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("sc"))
    )
    edge_rows = edges.collect()  # |V|²-bounded (model, not corpus)
    start_rows = starts.collect()  # |V|-bounded
    nodes = sorted(
        {r["src"] for r in edge_rows}
        | {r["dst"] for r in edge_rows}
        | {r["node"] for r in start_rows}
    )
    outw: dict[int, int] = {}
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in edge_rows:
        outw[r["src"]] = outw.get(r["src"], 0) + r["cnt"]
        adj.setdefault(r["src"], []).append((r["dst"], r["cnt"]))
    sc = {r["node"]: r["sc"] for r in start_rows}
    total_starts = sum(sc.values())
    rems = [
        s
        for s, _ in sorted(
            ((s, o) for s, o in outw.items() if s != ATTR_TARGET),
            key=lambda t: (-t[1], t[0]),
        )[:ATTR_CHANNELS]
    ] + [-1]

    def fixed_point(rem: int) -> dict[int, int]:
        h = {n: (ATTR_SCALE if n == ATTR_TARGET else 0) for n in nodes}
        for _ in range(ATTR_ITERS):
            nh = {}
            for n in nodes:
                if n == ATTR_TARGET:
                    nh[n] = ATTR_SCALE
                elif n == rem:
                    nh[n] = 0
                elif n in adj:
                    nh[n] = sum(c * h[d] for d, c in adj[n]) // outw[n]
                else:
                    nh[n] = 0
            h = nh
        return h

    conv = {}
    for rem in rems:
        h = fixed_point(rem)
        conv[rem] = sum(s * h[n] for n, s in sc.items())
    bcv = conv[-1]
    rows = [
        (
            rem,
            outw[rem],
            conv[rem] // total_starts,
            bcv // total_starts,
            ((bcv - conv[rem]) * 1_000_000) // bcv if bcv > 0 else 0,
        )
        for rem in rems
        if rem != -1
    ]
    return spark.createDataFrame(
        rows,
        "channel int, out_visits bigint, conv_micro bigint, "
        "base_micro bigint, removal_effect_ppm bigint",
    )
