"""Round-12 wave: per-language semantic-dedup attribution and
ranking-quality evaluation (r11 verdict #4 and #5).

Two families:

* **Cross-lingual SemDeDup** — the curation question LAION/CCNet-class
  pipelines actually ask of a semantic dedup pass: which languages
  duplicate, into which clusters, and who shadows whom across language
  boundaries (translated boilerplate is exactly the duplicate class only
  the embedding tier can see).  All three queries COMPOSE the registered
  SemDeDup relations (`_semdedup_relation`, `_semdedup_dropped`, the
  shadow map) with the documents table's `lang` column — no second
  clustering, no second pair join; the synthetic corpus aligns `vec_id`
  with `doc_id` (each embeddings row is the encoder output of the
  same-id document — a production pipeline carries the document id
  through the encoder the same way).

* **Ranking-quality eval** — nDCG@k and MRR as first-class queries,
  extending the recall@k pattern (`similarity_ann_recall_eval`): recall
  says WHETHER the true neighbors were found, nDCG/MRR say whether they
  were found IN THE RIGHT ORDER — the number a retrieval cascade is
  actually tuned on.  Ground truth and evaluated rankings are the
  registered queries themselves (exact cosine vs LSH/IVF; exact BM25 vs
  the tf-only first-pass prefilter every lexical cascade runs), and the
  oracles compose the registered ORACLE TEXTS as CTEs, so the eval can
  never drift from the operators it evaluates.

Exactness policy (repo convention): the only non-integer op in the DCG
chain is the position discount 1/log2(rank+1); each per-position
discounted gain is rounded to a MICRO integer before accumulation (the
wave12 ln-device).  All (gain ≤ 10, rank ≤ 10) term values sit ≥ 3.1e-3
from the nearest rounding boundary (pinned by
tests/test_wave13.py::test_dcg_term_rounding_margin) — ~10 orders above
the engines' ln() last-ulp disagreement — so the rounded terms are
bit-identical and sums/divisions are exact integer arithmetic.

Reference parity note: the reference repo is a table generator with no
retrieval or dedup surface (`IcebergTableGenerator.java` writes rows,
never reads them back); this module extends SURVEY.md §2.8's
LLM-pipeline mandate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

_MICRO = 1_000_000

# --------------------------------------------------------------------------
# SemDeDup k-scaling probe (shared by the property test and SCALING.md)
# --------------------------------------------------------------------------
_KSCALE_DIM = 8


def _synth_emb(spark: SparkSession, n: int) -> DataFrame:
    """(vec_id, vec): deterministic integer-hash vectors in [-0.5, 0.5) —
    no RNG (Date.now/random are banned in harness paths), uniform enough
    that k-means clusters stay near-balanced, so the measured Σ cᵢ²
    reflects the k ∝ √N law rather than fixture skew."""
    comps = [
        (
            (
                (F.col("vec_id") * F.lit(2654435761 + 97 * i) + F.lit(40503 * i))
                % F.lit(100003)
            ).cast("double")
            / 100003.0
            - 0.5
        )
        for i in range(_KSCALE_DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("vec")
    )


def semdedup_k_scaling_probe(
    spark: SparkSession, n: int
) -> tuple[int, int, int]:
    """Fit k = round(√n) clusters on the synthetic fixture, assign, and
    return (k, Σ cᵢ², realized prior-pair count) — the empirical backing
    for the family's "k scales with the corpus ⟹ pair work stays
    sub-quadratic" posture (r11 verdict #3).  Asserted against the
    N^1.5 law in tests/test_semdedup_scaling.py; measured values are
    published in SCALING.md §semdedup-k-scaling."""
    import math

    from iceberg_table_generator_spark.operators.similarity import ivf_fit
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_prior_pairs,
        semdedup_members,
    )

    k = int(round(math.sqrt(n)))
    emb = _synth_emb(spark, n)
    cents = ivf_fit(emb, k=k)
    m = semdedup_members(emb, cents).localCheckpoint(eager=True)
    sizes = [
        r["c"] for r in m.groupBy("cid").agg(F.count("*").alias("c")).collect()
    ]
    assert sum(sizes) == n
    sum_c2 = sum(c * c for c in sizes)
    pairs = _semdedup_prior_pairs(m).count()
    assert pairs == sum(c * (c - 1) // 2 for c in sizes), (pairs, sizes)
    return k, sum_c2, pairs


# --------------------------------------------------------------------------
# Per-language SemDeDup verdict rates
# --------------------------------------------------------------------------


def _lang_of_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, lang): the language of each embedded document — the
    id-aligned documents join (vec_id = doc_id, see module docstring).
    One projected scan; the join downstream is id-co-partitioned."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )


def _semdedup_by_lang_oracle() -> str:
    from iceberg_table_generator_spark.operators.wave11 import (
        _sql_semdedup_ctes,
    )

    return f"""{_sql_semdedup_ctes()},
lm AS (
  SELECT m.vec_id, d.lang,
         CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END AS is_drop
  FROM m
  JOIN documents d ON d.doc_id = m.vec_id
  LEFT JOIN (SELECT DISTINCT vec_id FROM dropped) dr USING (vec_id))
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(is_drop) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(is_drop) AS BIGINT) AS n_kept,
       CAST((sum(is_drop) * {_MICRO}) // count(*) AS BIGINT) AS drop_micro
FROM lm GROUP BY lang
"""


@query("dedup_semdedup_by_lang", oracle=_semdedup_by_lang_oracle())
def dedup_semdedup_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE SemDeDup verdict rates: how much of each language's
    slice the semantic-dedup pass removes (τ rule of
    `dedup_semdedup_verdict`, attributed by the documents table's lang) —
    the first per-language view of the dedup family, and the number a
    multilingual curation run reads before trusting one global τ (a τ
    tuned on English famously over-prunes low-resource languages whose
    embeddings cluster tighter).

    Composes the registered member/dropped relations (same cluster model,
    same pair join — computed once, reused); the only new work is one
    id-co-partitioned join against a two-column documents projection and
    a languages-bounded aggregate.  Output: one row per language."""
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_dropped,
        _semdedup_relation,
    )

    m = _semdedup_relation(spark, sf_dir)
    dropped = _semdedup_dropped(m).select(
        "vec_id", F.lit(1).alias("is_drop")
    )
    lm = (
        m.select("vec_id")
        .join(_lang_of_vec(spark, sf_dir), "vec_id")
        .join(dropped, "vec_id", "left")
        .select("lang", F.coalesce("is_drop", F.lit(0)).alias("is_drop"))
    )
    return lm.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("is_drop").cast("long").alias("n_dropped"),
        (F.count(F.lit(1)) - F.sum("is_drop")).cast("long").alias("n_kept"),
        F.expr(f"(sum(is_drop) * {_MICRO}) div count(*)")
        .cast("long")
        .alias("drop_micro"),
    )


# --------------------------------------------------------------------------
# Language × cluster contamination matrix
# --------------------------------------------------------------------------


def _semdedup_lang_cluster_oracle() -> str:
    from iceberg_table_generator_spark.operators.wave11 import (
        _sql_semdedup_ctes,
    )

    return f"""{_sql_semdedup_ctes()},
lm AS (
  SELECT m.cid, m.vec_id, d.lang,
         CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END AS is_drop
  FROM m
  JOIN documents d ON d.doc_id = m.vec_id
  LEFT JOIN (SELECT DISTINCT vec_id FROM dropped) dr USING (vec_id)),
cs AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_n FROM lm GROUP BY cid)
SELECT lm.lang, lm.cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(lm.is_drop) AS BIGINT) AS n_dropped,
       CAST((count(*) * {_MICRO}) // max(cs.cluster_n) AS BIGINT)
         AS cluster_share_micro
FROM lm JOIN cs USING (cid)
GROUP BY lm.lang, lm.cid
"""


@query(
    "dedup_semdedup_lang_cluster_matrix",
    oracle=_semdedup_lang_cluster_oracle(),
)
def dedup_semdedup_lang_cluster_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language × cluster contamination matrix: which languages land in
    which semantic clusters, each cell with its member count, dropped
    count, and share of the cluster — "which languages duplicate into
    which clusters", the map a curation run reads to find boilerplate
    clusters that swallow many languages at once (navigation chrome,
    cookie banners, machine-translated spam).

    Same composed relations as `dedup_semdedup_by_lang`; the matrix is
    langs × k bounded (the cluster count is a model parameter), so the
    output and every post-join aggregate are trivially small."""
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_dropped,
        _semdedup_relation,
    )

    m = _semdedup_relation(spark, sf_dir)
    dropped = _semdedup_dropped(m).select(
        "vec_id", F.lit(1).alias("is_drop")
    )
    lm = (
        m.select("cid", "vec_id")
        .join(_lang_of_vec(spark, sf_dir), "vec_id")
        .join(dropped, "vec_id", "left")
        .select(
            "cid", "lang", F.coalesce("is_drop", F.lit(0)).alias("is_drop")
        )
    )
    cs = lm.groupBy("cid").agg(F.count(F.lit(1)).cast("long").alias("cluster_n"))
    return (
        lm.groupBy("lang", "cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("is_drop").cast("long").alias("n_dropped"),
        )
        .join(cs, "cid")
        .select(
            "lang",
            "cid",
            "n_members",
            "n_dropped",
            F.expr(f"(n_members * {_MICRO}) div cluster_n")
            .cast("long")
            .alias("cluster_share_micro"),
        )
    )


# --------------------------------------------------------------------------
# Cross-language shadow attribution (who deduplicates whom)
# --------------------------------------------------------------------------


def _semdedup_cross_lang_oracle() -> str:
    from iceberg_table_generator_spark.operators.wave11 import (
        _semdedup_shadow_oracle,
    )

    return f"""
WITH sm AS ({_semdedup_shadow_oracle()}),
att AS (
  SELECT ds.lang AS shadow_lang, dv.lang AS dropped_lang,
         CAST(round(sm.sim * 1000000.0, 0) AS BIGINT) AS sim_micro
  FROM sm
  JOIN documents ds ON ds.doc_id = sm.shadow_id
  JOIN documents dv ON dv.doc_id = sm.vec_id)
SELECT shadow_lang, dropped_lang,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(sim_micro) AS BIGINT) AS sim_micro_sum
FROM att GROUP BY shadow_lang, dropped_lang
"""


@query("dedup_semdedup_cross_lang_shadow", oracle=_semdedup_cross_lang_oracle())
def dedup_semdedup_cross_lang_shadow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-language shadow attribution: for every SemDeDup drop, the
    language of the exemplar that shadowed it × the language of the
    dropped document — the translated-boilerplate detector (off-diagonal
    cells are documents deduplicated by a DIFFERENT-language exemplar:
    same meaning, different language, exactly what only the embedding
    tier can catch).

    Composes the registered `dedup_semdedup_shadow_map` (one exemplar
    per drop — the attribution contract) with two id-keyed joins against
    the lang projection; output is ≤ langs² rows.  The per-pair cosine
    is the shadow map's own 6-decimal-rounded double (identical on both
    engines), micro-scaled per PAIR to BIGINT before the sum, so the
    aggregate is order-free exact."""
    from iceberg_table_generator_spark.operators.wave11 import (
        dedup_semdedup_shadow_map,
    )

    sm = dedup_semdedup_shadow_map(spark, sf_dir)
    lang = _lang_of_vec(spark, sf_dir)
    att = (
        sm.join(
            lang.select(
                F.col("vec_id").alias("shadow_id"),
                F.col("lang").alias("shadow_lang"),
            ),
            "shadow_id",
        )
        .join(
            lang.select("vec_id", F.col("lang").alias("dropped_lang")),
            "vec_id",
        )
        .select(
            "shadow_lang",
            "dropped_lang",
            F.round(F.col("sim") * 1000000.0, 0)
            .cast("long")
            .alias("sim_micro"),
        )
    )
    return att.groupBy("shadow_lang", "dropped_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("sim_micro").cast("long").alias("sim_micro_sum"),
    )


# --------------------------------------------------------------------------
# nDCG@k / MRR: ANN families vs the exact cosine ranking
# --------------------------------------------------------------------------
# Position discount 1/log2(rank+1), graded gain (k − exact_rank + 1):
# the standard nDCG instantiation for ANN eval (the exact top-k IS the
# graded relevance — rank 1 is worth k, rank k is worth 1, absent = 0).


def _dcg_term(gain_col, rank_col):
    """round(gain·MICRO / log2(rank+1)) as BIGINT — the per-position
    discounted gain, micro-rounded BEFORE accumulation (margin pinned by
    test_dcg_term_rounding_margin)."""
    return (
        F.round(
            gain_col.cast("double")
            * float(_MICRO)
            / (F.log(rank_col.cast("double") + 1.0) / F.log(F.lit(2.0))),
            0,
        )
        .cast("long")
    )


_SQL_DCG_TERM = (
    "CAST(round(CAST({g} AS DOUBLE) * 1000000.0"
    " / (ln(CAST({r} AS DOUBLE) + 1.0) / ln(2.0)), 0) AS BIGINT)"
)


def _ranking_quality(
    ann: DataFrame, exact: DataFrame, k: int, keys: list[str]
) -> DataFrame:
    """Shared nDCG@k / MRR evaluator: `ann` carries (keys…, query_id,
    item, s) — the evaluated ranking; `exact` carries (query_id, item,
    r) — the gold ranking.  Output: one row per (keys…, query_id) with
    dcg_micro, ndcg_micro, first_hit_rank, rr_micro."""
    gold = exact.select(
        "query_id", "item", (F.lit(k) - F.col("r") + 1).alias("gain")
    )
    j = ann.join(gold, ["query_id", "item"], "left").select(
        *keys,
        "query_id",
        "s",
        F.coalesce("gain", F.lit(0)).alias("gain"),
    )
    dcg = j.groupBy(*keys, "query_id").agg(
        F.sum(_dcg_term(F.col("gain"), F.col("s"))).cast("long").alias("dcg_micro"),
        F.min(F.when(F.col("gain") > 0, F.col("s"))).alias("fh"),
    )
    idcg = exact.groupBy("query_id").agg(
        F.sum(_dcg_term(F.lit(k) - F.col("r") + 1, F.col("r")))
        .cast("long")
        .alias("idcg_micro")
    )
    return dcg.join(idcg, "query_id").select(
        *keys,
        "query_id",
        "dcg_micro",
        F.expr(f"(dcg_micro * {_MICRO}) div idcg_micro")
        .cast("long")
        .alias("ndcg_micro"),
        F.coalesce("fh", F.lit(0)).cast("int").alias("first_hit_rank"),
        F.coalesce(
            F.expr(f"{_MICRO} div fh"), F.lit(0)
        )
        .cast("long")
        .alias("rr_micro"),
    )


_SQL_RANKING_QUALITY = f"""
j AS (
  SELECT a.method, a.query_id, a.s,
         coalesce({{k}} - g.r + 1, 0) AS gain
  FROM ann a LEFT JOIN gold g
    ON g.query_id = a.query_id AND g.item = a.item),
dcg AS (
  SELECT method, query_id,
         CAST(sum({_SQL_DCG_TERM.format(g="gain", r="s")}) AS BIGINT)
           AS dcg_micro,
         min(CASE WHEN gain > 0 THEN s END) AS fh
  FROM j GROUP BY method, query_id),
idcg AS (
  SELECT query_id,
         CAST(sum({_SQL_DCG_TERM.format(g="{k} - r + 1", r="r")}) AS BIGINT)
           AS idcg_micro
  FROM gold GROUP BY query_id)
SELECT d.method, d.query_id, d.dcg_micro,
       CAST((d.dcg_micro * {_MICRO}) // i.idcg_micro AS BIGINT) AS ndcg_micro,
       CAST(coalesce(d.fh, 0) AS INT) AS first_hit_rank,
       CAST(CASE WHEN d.fh IS NULL THEN 0 ELSE {_MICRO} // d.fh END AS BIGINT)
         AS rr_micro
FROM dcg d JOIN idcg i USING (query_id)
"""


def _ann_ndcg_oracle() -> str:
    from iceberg_table_generator_spark.operators.similarity import (
        _ANN_LSH_ORACLE,
        _COSINE_ORACLE,
        _ivf_oracle,
        TOP_K,
    )

    return f"""
WITH exact_q AS ({_COSINE_ORACLE}),
lsh_q AS ({_ANN_LSH_ORACLE}),
ivf_q AS ({_ivf_oracle()}),
gold AS (SELECT query_id, neighbor_id AS item, rank AS r FROM exact_q),
ann AS (
  SELECT 'lsh' AS method, query_id, neighbor_id AS item, rank AS s FROM lsh_q
  UNION ALL
  SELECT 'ivf' AS method, query_id, neighbor_id AS item, rank AS s FROM ivf_q),
{_SQL_RANKING_QUALITY.format(k=TOP_K)}
"""


@query("similarity_ann_ndcg_eval", oracle=_ann_ndcg_oracle())
def similarity_ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking quality of BOTH ANN families (hyperplane-LSH and IVF)
    against the exact cosine top-k: per (method, query) nDCG@k — graded
    gain k−exact_rank+1, 1/log2(rank+1) discount — plus MRR's reciprocal
    first-hit rank.  Extends `similarity_ann_recall_eval` (set overlap)
    to ORDER quality: an index can score recall 1.0 yet invert every
    rank, and a retrieval cascade is tuned on nDCG, not recall.

    Eval-by-composition (the recall-eval pattern): the three registered
    queries run unchanged and meet on (query, item) — query-set × k
    sized relations, one tiny join each; the oracle composes the same
    three registered ORACLE TEXTS as CTEs, so the eval cannot drift from
    the operators it evaluates.  Integer-exact: see module docstring
    (micro-rounded per-position terms, integer nDCG/RR divisions)."""
    from iceberg_table_generator_spark.operators.similarity import (
        TOP_K,
        cosine_topk_gold_pinned,
        similarity_ann_lsh,
        similarity_ivf_topk,
    )

    # Pinned accessor: _ranking_quality reads the gold in TWO branches
    # (gain join + iDCG denominator) — see cosine_topk_gold_pinned.
    exact = cosine_topk_gold_pinned(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("item"), F.col("rank").alias("r")
    )
    lsh = similarity_ann_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("method"),
        "query_id",
        F.col("neighbor_id").alias("item"),
        F.col("rank").alias("s"),
    )
    ivf = similarity_ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("method"),
        "query_id",
        F.col("neighbor_id").alias("item"),
        F.col("rank").alias("s"),
    )
    return _ranking_quality(
        lsh.unionByName(ivf), exact, TOP_K, keys=["method"]
    )


# --------------------------------------------------------------------------
# nDCG@k / MRR: the tf-only lexical prefilter vs the exact BM25 ranking
# --------------------------------------------------------------------------


def _bm25_ndcg_oracle() -> str:
    from iceberg_table_generator_spark.operators.text import (
        _BM25_ORACLE,
        _BM25_Q_VALUES,
        _BM25_TERM_LIST,
        BM25_TOP_K,
    )

    return f"""
WITH bm25_q AS ({_BM25_ORACLE}),
gold AS (SELECT query_id, doc_id AS item, rank AS r FROM bm25_q),
q(query_id, w) AS (VALUES {_BM25_Q_VALUES}),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tok
  WHERE w IN ({_BM25_TERM_LIST}) GROUP BY doc_id, w),
cagg AS (
  SELECT q.query_id, tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS tfsum
  FROM q JOIN tf USING (w) GROUP BY q.query_id, tf.doc_id),
cr AS (
  SELECT query_id, doc_id, tfsum,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY tfsum DESC, doc_id) AS INT) AS s
  FROM cagg),
ann AS (
  SELECT 'tf' AS method, CAST(query_id AS INT) AS query_id, doc_id AS item, s
  FROM cr WHERE s <= {BM25_TOP_K}),
{_SQL_RANKING_QUALITY.format(k=BM25_TOP_K)}
"""


@query("text_bm25_ndcg_eval", oracle=_bm25_ndcg_oracle())
def text_bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking quality of the TF-ONLY lexical prefilter against the exact
    BM25 ranking, per query: nDCG@k with graded gain from the BM25 rank
    plus MRR — the cascade diagnostic behind every two-stage lexical
    retrieval (a cheap Σtf coordination score fans out candidates at
    scale; BM25 reranks; this query measures what the cheap stage loses
    BEFORE anyone deploys the cascade).

    The gold side is the registered `text_bm25_topk` run unchanged (and
    its oracle text composed verbatim); the candidate side is the tf
    ranking over the SAME query terms — one token pass with the filter
    BEFORE the groupBy (the BM25 plan's own tf stage shape: the term
    shuffle carries matched rows, not the corpus vocabulary), then a
    (queries × matched docs)-bounded window.  Integer-exact end-to-end:
    the tf ranking is pure integer ordering, and the DCG chain is the
    module's micro-rounded device."""
    from iceberg_table_generator_spark.operators.text import (
        _BM25_TERMS,
        BM25_QUERIES,
        BM25_TOP_K,
        text_bm25_topk,
    )

    gold = text_bm25_topk(spark, sf_dir).select(
        "query_id", F.col("doc_id").alias("item"), F.col("rank").alias("r")
    )
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    tf = (
        tok.filter(F.col("w").isin(_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    qdf = spark.createDataFrame(
        [(qid, w) for qid, ws in BM25_QUERIES for w in ws],
        "query_id int, w string",
    )
    cagg = (
        qdf.join(tf, "w")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").cast("long").alias("tfsum"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("tfsum"), F.asc("doc_id")
    )
    cand = (
        cagg.withColumn("s", F.row_number().over(win))
        .filter(F.col("s") <= BM25_TOP_K)
        .select(
            F.lit("tf").alias("method"),
            "query_id",
            F.col("doc_id").alias("item"),
            "s",
        )
    )
    return _ranking_quality(cand, gold, BM25_TOP_K, keys=["method"])
