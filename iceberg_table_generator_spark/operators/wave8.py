"""Round-8 operator wave: regression trends, skyline, link prediction,
lexical profiling, shard balancing, ABC classes, and a recursive-CTE
forecaster.

The reference is a table generator with no analytics surface
(`IcebergTableGenerator.java` writes rows; it never reads them back) —
these operators extend SURVEY.md §2.7/§2.8 with the query shapes a
training-data/BI consumer of those tables runs: per-group OLS trend
fits, Pareto-optimal (skyline) selection, neighborhood-overlap link
prediction, hapax/vocabulary profiling, deterministic shard-balance
audits for distributed training, and Holt's linear-trend smoothing
executed as the SAME recursive SQL on Spark 4's recursive CTEs and
DuckDB.

Exactness policy (the repo convention): every cross-row accumulation is
integer or DECIMAL (order-free); doubles appear only in a final
fixed-order chain per row, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.operators.dedup import _md5_60, _sql_md5_60
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

D38 = "decimal(38,0)"

# --------------------------------------------------------------------------
# OLS trend per order priority: monthly revenue regressed on month index
# --------------------------------------------------------------------------
_OLS_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority,
         (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS t,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) * 100 AS BIGINT)
           AS y
  FROM orders GROUP BY 1, 2),
mom AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
         CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM monthly GROUP BY 1),
fit AS (
  SELECT o_orderpriority, n,
         CAST(n * sty - CAST(st AS HUGEINT) * sy AS DOUBLE) AS num,
         CAST(n * stt - CAST(st AS HUGEINT) * st AS DOUBLE) AS dent,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS deny,
         CAST(CAST(sy AS HUGEINT) * stt
              - CAST(st AS HUGEINT) * sty AS DOUBLE) AS inum
  FROM mom)
SELECT o_orderpriority, n AS n_months,
       round(num / dent, 6) AS slope_cents,
       round(inum / dent, 6) AS intercept_cents,
       CASE WHEN deny <> 0 THEN round(num * num / (dent * deny), 6)
            END AS r2
FROM fit
"""


@query("orders_ols_trend", oracle=_OLS_ORACLE)
def orders_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority ordinary-least-squares fit of monthly revenue on the
    month index: slope (cents/month), intercept, and R² — the trend-line
    every BI tool draws, computed exactly.  Complements
    `stats_theil_sen_trend` (robust slope) with the classical estimator
    and adds the goodness-of-fit the median-of-slopes can't give.

    Exactness: the month index is an integer, revenue is exact cents, so
    all five regression moments are exact integers; the normal-equation
    numerators/denominators are 128-bit cross-multiplications
    (Spark DECIMAL(38,0) / DuckDB HUGEINT — both exact), and each output
    is ONE double division, rounded once.  Zero-variance revenue ⇒ R²
    NULL on both engines.

    Scale: one calendar-bounded aggregate (months × 5 priorities), then
    a 5-row moment fold — nothing after the first groupBy exceeds the
    time domain."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("t"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(25,6)")) * 100)
        .cast("long")
        .alias("y")
    )
    t, y = F.col("t"), F.col("y")
    mom = monthly.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(t.cast(D38) * t.cast(D38)).cast(D38).alias("stt"),
        F.sum(t.cast(D38) * y.cast(D38)).cast(D38).alias("sty"),
        F.sum(y.cast(D38) * y.cast(D38)).cast(D38).alias("syy"),
    )
    n = F.col("n").cast(D38)
    st, sy = F.col("st").cast(D38), F.col("sy").cast(D38)
    num = (n * F.col("sty") - st * sy).cast("double")
    dent = (n * F.col("stt") - st * st).cast("double")
    deny = (n * F.col("syy") - sy * sy).cast("double")
    inum = (sy * F.col("stt") - st * F.col("sty")).cast("double")
    return mom.select(
        "o_orderpriority",
        F.col("n").alias("n_months"),
        F.round(num / dent, 6).alias("slope_cents"),
        F.round(inum / dent, 6).alias("intercept_cents"),
        F.when(deny != 0, F.round(num * num / (dent * deny), 6)).alias("r2"),
    )


# --------------------------------------------------------------------------
# Skyline (Pareto-optimal) parts per brand: cheapest-for-the-size frontier
# --------------------------------------------------------------------------
_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_brand, p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents,
         p_size
  FROM part)
SELECT p_brand, p_partkey, price_cents, CAST(p_size AS BIGINT) AS p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.p_brand = p.p_brand
    AND q.price_cents <= p.price_cents AND q.p_size >= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))
"""


@query("part_skyline_pareto", oracle=_SKYLINE_ORACLE)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand skyline: parts not dominated on (price low, size high) —
    the Pareto-frontier selection query (BÖRZSÖNYI et al.'s SKYLINE OF
    operator) recast as two partitioned windows instead of the quadratic
    self-join the oracle runs.

    A part is dominated iff a same-brand part is strictly cheaper with
    size ≥ its own (a RANGE window over strictly-lower prices carrying
    max size), or same-priced with strictly larger size (a per-(brand,
    price) max).  Both windows are partitioned by brand — the 2D skyline
    needs ONE sort per brand, not the O(n²) dominance join; at scale the
    per-brand relation is dimension-tier (the fact tables never enter).

    Exactness: prices become exact cents via DECIMAL; everything else is
    integer comparison."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "price_cents")
    d = p.select(
        "*",
        F.max("p_size").over(w_cheaper).alias("_m_cheaper"),
        F.max("p_size").over(w_same).alias("_m_same"),
    )
    return d.filter(
        (F.coalesce(F.col("_m_cheaper"), F.lit(-1)) < F.col("p_size"))
        & (F.col("_m_same") <= F.col("p_size"))
    ).select("p_brand", "p_partkey", "price_cents", "p_size")


# --------------------------------------------------------------------------
# Link prediction: neighborhood overlap on the page-transition graph
# --------------------------------------------------------------------------
LINK_TOP_K = 20

_LINK_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
bi AS (SELECT u AS src, v AS dst FROM und
       UNION ALL SELECT v AS src, u AS dst FROM und),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM bi GROUP BY src),
cn AS (
  SELECT x.dst AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS n_common
  FROM bi x JOIN bi y ON x.src = y.src AND x.dst < y.dst
  GROUP BY 1, 2)
SELECT a, b, n_common,
       da.degree AS deg_a, db.degree AS deg_b,
       CASE WHEN e.u IS NULL THEN 0 ELSE 1 END AS is_edge,
       (1000000 * n_common) // (da.degree + db.degree - n_common)
         AS jaccard_e6
FROM cn
JOIN deg da ON da.node = a
JOIN deg db ON db.node = b
LEFT JOIN und e ON e.u = a AND e.v = b
ORDER BY n_common DESC, a, b
LIMIT {LINK_TOP_K}
"""


@query("events_link_prediction", oracle=_LINK_ORACLE)
def events_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: the top-{K} page pairs by
    common-neighbor count, with degrees, Jaccard overlap of neighbor
    sets (micro-units), and whether the pair is already an edge — the
    classic common-neighbors / Jaccard predictors (Liben-Nowell &
    Kleinberg) that rank which missing edges are most likely.

    Scale: common neighbors come from ONE self-equi-join of the
    |V|²-bounded directed edge relation on the wedge center (the
    `events_two_hop_reach` join shape) — never through the corpus; the
    pair relation is ≤ |V|²/2 rows, degrees are a |V|-row aggregate, and
    the final ranking is a global top-k (TakeOrderedAndProject).  Pure
    integer counts; Jaccard is a single integer division in micro-units
    (the pair (a,b) is unique, so the cross-engine tie-break is total)."""
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
        .transform(persist_tracked)
    )
    bi = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    deg = bi.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    x = bi.select(F.col("src").alias("mid"), F.col("dst").alias("a"))
    y = bi.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    cn = (
        x.join(y, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    edge = und.select(
        F.col("u").alias("a"), F.col("v").alias("b"), F.lit(1).alias("_e")
    )
    out = (
        cn.join(da, "a")
        .join(db, "b")
        .join(edge, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            F.coalesce("_e", F.lit(0)).cast("long").alias("is_edge"),
            F.expr(
                "(1000000 * n_common) div (deg_a + deg_b - n_common)"
            ).alias("jaccard_e6"),
        )
    )
    return out.orderBy(F.desc("n_common"), "a", "b").limit(LINK_TOP_K)


# --------------------------------------------------------------------------
# Hapax legomena profile per source (lexical richness)
# --------------------------------------------------------------------------
_HAPAX_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
wc AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY source, w)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS hapax_ratio
FROM wc GROUP BY source
"""


@query("text_hapax_ratio", oracle=_HAPAX_ORACLE)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax legomena profile: vocabulary size, token count,
    and the share of types occurring exactly once — the lexical-richness
    signal (a source whose hapax ratio collapses is template/boilerplate
    text; one where it explodes is OCR noise or ID spam).  Complements
    `text_vocab_growth` (Heaps curve over time) with the per-source
    cross-section.

    Scale: one (source, token)-keyed count — partial aggregation folds
    Zipf-hot tokens map-side — then a source-keyed fold over the
    vocabulary relation.  Pure integers, one final division."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    wc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return wc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
        hapax.alias("n_hapax"),
        F.round(hapax * 1.0 / F.count(F.lit(1)), 6).alias("hapax_ratio"),
    )


# --------------------------------------------------------------------------
# Training-shard balance audit (deterministic hash sharding)
# --------------------------------------------------------------------------
N_SHARDS = 32

_SHARD_ORACLE = f"""
WITH d AS (
  SELECT {_sql_md5_60("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM d GROUP BY shard),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per)
SELECT shard, n_docs, n_tokens,
       round(n_docs * {N_SHARDS}.0 / total_docs, 6) AS doc_load,
       round(n_tokens * {N_SHARDS}.0 / total_tokens, 6) AS token_load
FROM per CROSS JOIN tot
"""


@query("pipeline_shard_balance", oracle=_SHARD_ORACLE)
def pipeline_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit for deterministic hash sharding into
    {N_SHARDS} training shards: per-shard doc and token counts plus load
    factors (1.0 = perfectly balanced) — the pre-flight check before a
    distributed training run, where one hot shard stalls every data
    loader step (token load matters more than doc load for packed
    batches, hence both).

    The shard key is the engine-independent 60-bit md5 hash of the doc
    id — the same function any loader can recompute, so the audit
    predicts the REAL assignment.  Scale: one narrow projection, one
    {N_SHARDS}-key aggregate, one broadcast scalar total."""
    d = load_table(spark, sf_dir, "documents").select(
        (_md5_60(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    per = d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") * float(N_SHARDS) / F.col("total_docs"), 6)
        .alias("doc_load"),
        F.round(
            F.col("n_tokens") * float(N_SHARDS) / F.col("total_tokens"), 6
        ).alias("token_load"),
    )
