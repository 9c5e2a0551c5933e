"""Round-9 operator wave: span-level exact substring dedup (the Lee et
al. "Deduplicating Training Data" operation), fact-table-scale Lorenz /
Gini concentration built on the two-phase distributed global order, and
further corpus/stats coverage.

The reference is a table generator with no analytics surface
(`IcebergTableGenerator.java` writes rows; it never reads them back) —
these operators extend SURVEY.md §2.7/§2.8 with the remaining
training-data-pipeline shapes: repeated ≥k-token span detection *within
and across* documents (doc-level Jaccard and chunk fingerprints both
miss a boilerplate paragraph inside otherwise-unique docs), and exact
whole-distribution inequality measures over the largest fact table.

Exactness policy (the repo convention): every cross-row accumulation is
integer or DECIMAL (order-free); doubles appear only in a final
fixed-order chain per row, rounded once.  Span identity is the
engine-independent 60-bit md5 prefix (`dedup._md5_60`) on BOTH engines,
so even a hash collision produces identical output on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.functions.order import (
    ntile_expr,
    with_global_order,
)
from iceberg_table_generator_spark.operators.dedup import _md5_60, _sql_md5_60
from iceberg_table_generator_spark.operators.tpch_ext import SQL_REV_DEC, rev_dec
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

D38 = "decimal(38,0)"

# --------------------------------------------------------------------------
# Span-level exact substring dedup (Lee et al., "Deduplicating Training
# Data Makes Language Models Better"): repeated >= k-token spans, within
# and across documents.
# --------------------------------------------------------------------------
#: Span length in tokens.  Lee et al. use 50 BPE tokens at web scale; the
#: synthetic corpus has 10-99-token documents, so 8 keeps span counts
#: meaningful at every SF while exercising the identical plan shape.
SPAN_K = 8
#: Top-k duplicated spans reported by `dedup_span_exact`.
SPAN_TOP_K = 40
#: Position packing base for the first-seen composite (doc_id * BASE +
#: pos).  Positions are 1-based token offsets, bounded by document token
#: count — 1e6 leaves 43 bits for doc_id.
_POS_BASE = 1_000_000


def _span_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct k-token span: occurrence count, distinct-doc
    count, and the first occurrence (min (doc_id, pos) composite).

    Skew design (the `text_novelty_rate` rule): the ONLY span-keyed
    operation is this groupBy — partial aggregation combines Zipf-hot
    boilerplate spans map-side, so no task ever materializes a hot
    span's posting list, and nothing ever joins on the span.  The
    shuffle carries an 8-byte hash + three small integers per distinct
    span per task, never the text."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    spans = F.expr(
        f"""CASE WHEN size(tk) < {SPAN_K} THEN array()
            ELSE transform(sequence(1, size(tk) - {SPAN_K} + 1),
                           i -> concat_ws(' ', slice(tk, i, {SPAN_K})))
            END"""
    )
    sp = d.select(
        "doc_id", F.posexplode(spans).alias("pos0", "span")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        _md5_60(F.col("span")).alias("h"),
    )
    return sp.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.col("doc_id") * _POS_BASE + F.col("pos")).alias("_first"),
    )


def _sql_span_groups() -> str:
    h = _sql_md5_60(
        f"array_to_string(list_slice(tk, i.i, i.i + {SPAN_K} - 1), ' ')"
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sp AS (
  SELECT doc_id, i.i AS pos, {h} AS h
  FROM t, unnest(generate_series(1, len(tk) - {SPAN_K} + 1)) AS i(i)),
grp AS (
  SELECT h,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         min(doc_id * {_POS_BASE} + pos) AS _first
  FROM sp GROUP BY h)
"""


_SPAN_EXACT_ORACLE = f"""{_sql_span_groups()}
SELECT _first // {_POS_BASE} AS first_doc,
       _first % {_POS_BASE} AS first_pos,
       n_occurrences, n_docs
FROM grp WHERE n_occurrences >= 2
ORDER BY n_occurrences DESC, first_doc, first_pos
LIMIT {SPAN_TOP_K}
"""


@query("dedup_span_exact", oracle=_SPAN_EXACT_ORACLE)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top duplicated exact {SPAN_K}-token spans in the corpus, within
    and across documents — the span-level tier of the dedup family (Lee
    et al.'s substring dedup: `dedup_exact` catches whole-doc copies,
    `pipeline_dup_ngram_ratio` doc-level shingle overlap, chunk
    fingerprints fixed blocks; only a span pass catches a repeated
    boilerplate paragraph inside otherwise-unique documents).  Each
    duplicated span is identified by its FIRST occurrence (min
    (doc_id, position)) — the row a span-removal pass would keep.

    Scale: fixed-length token shingles with positions (one posexplode —
    ~doc_length rows per doc), hashed to the engine-independent 60-bit
    md5 prefix before the one span-keyed groupBy (map-side combine eats
    the Zipf head; the shuffle never carries text).  No span-keyed join
    anywhere; the result is a global top-k (TakeOrderedAndProject).
    The (n_occurrences, first_doc, first_pos) order is total because a
    (doc, pos) pair belongs to exactly one span group."""
    grp = _span_groups(spark, sf_dir)
    return (
        grp.filter(F.col("n_occurrences") >= 2)
        .select(
            F.expr(f"_first div {_POS_BASE}").alias("first_doc"),
            (F.col("_first") % _POS_BASE).alias("first_pos"),
            "n_occurrences",
            "n_docs",
        )
        .orderBy(F.desc("n_occurrences"), "first_doc", "first_pos")
        .limit(SPAN_TOP_K)
    )


_SPAN_STATS_ORACLE = f"""{_sql_span_groups()}
SELECT CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN n_occurrences >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_doc_spans,
       CAST(sum(CASE WHEN n_occurrences >= 2 AND n_docs = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_within_doc_spans,
       CAST(sum(n_occurrences) AS BIGINT) AS total_occurrences,
       CAST(sum(CASE WHEN n_occurrences >= 2 THEN n_occurrences ELSE 0 END)
            AS BIGINT) AS dup_occurrences,
       round(CAST(sum(CASE WHEN n_occurrences >= 2 THEN n_occurrences
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(n_occurrences) AS DOUBLE), 6) AS dup_ratio
FROM grp
"""


@query("dedup_span_stats", oracle=_SPAN_STATS_ORACLE)
def dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level span-duplication profile: how much of the corpus sits
    inside a repeated {SPAN_K}-token span, split within-doc vs cross-doc
    — the number that decides whether a span-removal pass (vs doc-level
    dedup) is worth running, and the denominator for its token savings
    estimate.

    Same single span-keyed aggregate as `dedup_span_exact`; this is the
    one-row rollup of the span-group relation (a second map-combinable
    aggregate over one row per distinct span)."""
    grp = _span_groups(spark, sf_dir)
    dup = F.when(F.col("n_occurrences") >= 2, 1).otherwise(0)
    dup_occ = F.when(
        F.col("n_occurrences") >= 2, F.col("n_occurrences")
    ).otherwise(0)
    return grp.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(dup).alias("n_dup_spans"),
        F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
            "n_cross_doc_spans"
        ),
        F.sum(
            F.when(
                (F.col("n_occurrences") >= 2) & (F.col("n_docs") == 1), 1
            ).otherwise(0)
        ).alias("n_within_doc_spans"),
        F.sum("n_occurrences").alias("total_occurrences"),
        F.sum(dup_occ).alias("dup_occurrences"),
        F.round(
            F.sum(dup_occ).cast("double")
            / F.sum("n_occurrences").cast("double"),
            6,
        ).alias("dup_ratio"),
    )


# --------------------------------------------------------------------------
# Lorenz-curve deciles of per-line discounted revenue: the two-phase
# distributed global order exercised at FULL fact-table scale.
# --------------------------------------------------------------------------
LORENZ_TILES = 10

_LORENZ_ORACLE = f"""
WITH v AS (
  SELECT l_orderkey, l_linenumber,
         CAST({SQL_REV_DEC} AS DECIMAL(18,6)) AS val
  FROM lineitem),
r AS (
  SELECT val,
         ntile({LORENZ_TILES}) OVER w AS decile,
         sum(val) OVER (w ROWS UNBOUNDED PRECEDING) AS cum
  FROM v
  WINDOW w AS (ORDER BY val, l_orderkey, l_linenumber)),
tot AS (SELECT sum(val) AS t FROM v)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(val), 2) AS DOUBLE) AS decile_rev,
       round(CAST(sum(val) AS DOUBLE) / CAST(any_value(t) AS DOUBLE), 6)
         AS rev_share,
       round(CAST(max(cum) AS DOUBLE) / CAST(any_value(t) AS DOUBLE), 6)
         AS cum_share
FROM r CROSS JOIN tot
GROUP BY decile
ORDER BY decile
"""


@query("lineitem_lorenz_deciles", oracle=_LORENZ_ORACLE)
def lineitem_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of per-lineitem discounted revenue in exact deciles:
    each decile's row count, revenue, revenue share, and the cumulative
    share at the decile boundary (the Lorenz ordinate) — revenue
    inequality read directly off the largest fact table (for a training
    corpus: the token-mass concentration curve over shards/sources).

    Scale — this is the two-phase distributed global order
    (`functions/order.py`) at FULL fact-table cardinality, not a
    dimension rollup: a range shuffle on (value, orderkey, linenumber),
    per-partition DECIMAL running sums, a cluster-bounded offset
    broadcast, then the integer `ntile_expr` closed form.  No
    single-partition window anywhere; at 100x the rows the plan is
    unchanged.  The input is deliberately NOT persisted: its lineage is
    a pruned 4-column parquet scan, and at fact-table scale re-scanning
    beats caching the whole table (the two readers are the ranked
    relation and the per-partition offset aggregate).

    Exactness: values stay DECIMAL(18,6) through the running sums (the
    `rev_dec` contract); shares are one double division of exact
    decimals, rounded once."""
    v = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", rev_dec().alias("val")
    )
    order = [F.asc("val"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    t = with_global_order(
        v, order, cums=[(F.col("val"), "cum")], pos="pos"
    )
    n = v.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("val").alias("t_rev"),
    )
    d = t.crossJoin(F.broadcast(n)).select(
        "val",
        "cum",
        "t_rev",
        ntile_expr("pos", "n_total", LORENZ_TILES).alias("decile"),
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("val"), 2).cast("double").alias("decile_rev"),
            F.round(
                F.sum("val").cast("double")
                / F.max("t_rev").cast("double"),
                6,
            ).alias("rev_share"),
            F.round(
                F.max("cum").cast("double") / F.max("t_rev").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Gini coefficient of customer spend (closed form over global positions)
# --------------------------------------------------------------------------
_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS pos
  FROM spend),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(CAST(pos AS HUGEINT) * cents) AS HUGEINT) AS a
  FROM r)
SELECT n AS n_customers, s AS total_cents,
       round(CAST(2 * a AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM mom
"""


@query("customer_gini_spend", oracle=_GINI_ORACLE)
def customer_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer total spend via the closed form
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over ascending-sorted spend — the
    single-number inequality companion to `lineitem_lorenz_deciles`
    (for a corpus: source-contribution inequality; G→0 balanced,
    G→1 winner-take-all).

    Positions come from the two-phase distributed global order (never a
    single-partition window); equal spends permute only within tied
    blocks, where i·x is order-invariant, so the custkey tiebreak is
    deterministic AND value-neutral.  Σ(i·x) accumulates as
    DECIMAL(38,0)×HUGEINT cross-mults (integer cents); the Gini is one
    fixed-order double chain, rounded once."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    r = with_global_order(
        spend, [F.asc("cents"), F.asc("o_custkey")], pos="pos"
    )
    mom = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("pos").cast(D38) * F.col("cents")).alias("a"),
    )
    return mom.select(
        F.col("n").alias("n_customers"),
        F.col("s").alias("total_cents"),
        F.round(
            (F.col("a") * 2).cast("double")
            / (F.col("n").cast("double") * F.col("s").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n").cast("double"),
            6,
        ).alias("gini"),
    )
