"""Similarity search over embedding columns (SURVEY.md §2.8).

Three paths over the `embeddings` table (`array<float>`, 64-dim):

- exact brute-force cosine top-k: the correctness baseline, DuckDB-checked.
  Query set is broadcast; candidates stream through unshuffled; per-partition
  top-k then a tiny global merge (the REPOSE-style local/global split,
  PAPERS.md).
- LSH-bucketed approximate top-k (random hyperplanes): signature buckets on
  both sides, join per bucket.
- IVF approximate top-k (k-means coarse quantizer + nprobe): inverted lists
  per centroid, queries probe only their nearest lists — the preferred scale
  structure for clustered corpora.

Every ANN path is oracle-paired: hyperplane LSH inlines its deterministic
±1 model as oracle literals (r5), and the k-means family (IVF, PQ) uses the
r6 engine-exact INTEGER k-means so DuckDB refits identical centroids from
the raw parquet and replays the whole pipeline (see the engine-exact
k-means block comment).  Recall is additionally asserted against the exact
path in tests/test_similarity.py.

All vector math is JVM-side (`zip_with`/`aggregate` fold) — no Python in the
hot path — with ONE deliberate exception: `similarity_cosine_topk_vectorized`
demonstrates the Arrow-batched alternative (numpy int64 GEMM inside
mapInPandas), kept oracle-paired by integer exactness rather than float
fold order.  Floats are cast to double BEFORE any arithmetic so Spark and
the oracle compute on identical values in identical order.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from iceberg_table_generator_spark.functions.cache import (
    memo_relation,
    persist_tracked,
)
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table, spread

N_QUERIES = 20  # vec_id < 20 form the query set
TOP_K = 5


def _dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product — same op order as the SQL oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def packed_model_col(data, schema: str) -> Column:
    """Pack model parameters (k×dim floats) into ONE expression node.

    `F.lit`/`F.array` of k×dim scalars builds a k×dim-node expression tree:
    analysis + codegen cost grows linearly with model size and is paid on
    EVERY query build (measured: 11.4s per build at k=256, dim=64 — the
    round-2 cold regression, VERDICT r2 #1).  `from_json` of a single
    string literal is instead constant-folded by Catalyst into one
    ArrayType Literal during optimization: O(1) plan nodes regardless of
    k, zero per-row parse cost, and the JSON round-trip (Python repr →
    Jackson double parse) is bit-exact for IEEE doubles.  Same build cost
    at k=4096 as at k=16 — the production-scale path."""
    return F.from_json(F.lit(json.dumps(data)), schema)


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
    over the same double arrays → bit-identical sims on both engines.

    Memoized per harness evaluation (`memo_relation`, r12 verdict #1):
    this relation is THE shared ground truth of the whole recall family,
    and composite evals (`similarity_compression_frontier` runs eight
    arms, four of which rebuild it internally) otherwise recompute the
    same scan+rank up to five times in one evaluation.  The result is
    (n_queries × k)-bounded and deterministic (ties broken by
    neighbor_id), so reuse is semantics-free.  First-reader-lazy
    (r13 verdict #1): a sole consumer composes the relation inline at
    zero memo cost; the persist+pin only happens at the second hit.
    Consumers that read the gold in MORE THAN ONE branch of their own
    job must call :func:`cosine_topk_gold_pinned` instead."""
    return memo_relation(
        _GOLD_KEY(spark, sf_dir),
        lambda: _cosine_topk_build(spark, sf_dir),
    )


def _GOLD_KEY(spark: SparkSession, sf_dir: str) -> tuple:
    return (spark.sparkContext.applicationId, sf_dir, "similarity_gold")


def cosine_topk_gold_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same memoized gold, persisted+pinned on FIRST hit.

    For consumers whose own plan fans the gold into multiple branches of
    one job (`_ranking_quality` reads it for both the gain join and the
    iDCG denominator): an unpersisted shared subtree would be computed
    once per concurrent branch (the wave14 band-sweep lesson), so these
    callers pay the eager pin that plain `similarity_cosine_topk` now
    skips for sole readers."""
    return memo_relation(
        _GOLD_KEY(spark, sf_dir),
        lambda: _cosine_topk_build(spark, sf_dir),
        eager=True,
    )


def _cosine_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
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
# (~35%); the IVF operator below is the better scale structure when real
# clusters exist.
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


def _plane_matrix(dim: int) -> Column:
    """All N_TABLES × N_PLANES hyperplanes as ONE packed literal
    (array<array<array<double>>>, [table][plane][dim]) — see
    packed_model_col for why this beats per-weight `F.lit` scalars."""
    data = [
        [[float(_plane_weight(t, p, d)) for d in range(dim)] for p in range(N_PLANES)]
        for t in range(N_TABLES)
    ]
    return packed_model_col(data, "array<array<array<double>>>")


def _bucket_array(vec_col: str | Column, dim: int) -> Column:
    """Every table's LSH bucket id for a vector, in one expression: for
    table t, the signature is the sum over planes p of 2^p·[vec·plane_p
    >= 0], offset by t<<16 so buckets from different tables never
    collide.  One fold over the packed plane matrix — expression size is
    O(1) in tables × planes × dim."""
    bits = F.array(*[F.lit(1 << p) for p in range(N_PLANES)])
    return F.transform(
        _plane_matrix(dim),
        lambda tw, t: F.aggregate(
            F.zip_with(
                tw,
                bits,
                lambda plane, bit: F.when(_dot(vec_col, plane) >= 0, bit).otherwise(
                    F.lit(0)
                ),
            ),
            F.lit(0),
            lambda a, b: a + b,
        )
        + F.shiftleft(t, 16),
    )


# The hyperplanes are deterministic ±1 literals (splitmix mix of
# (table, plane, dim)), so the oracle can inline the full plane matrix and
# recompute the identical bucket signatures — DuckDB's list_sum folds dot
# products in the same order as `_dot` (proven by the exact-cosine oracle),
# so even the >=0 sign tests agree bit for bit and the ENTIRE approximate
# pipeline (signatures → bucket join → exact rerank) is oracle-paired.
#
# Version-drift guard (r5 advice): the >=0 sign test has no rounding mask,
# so this pairing assumes DuckDB keeps sequential list_sum folding (true
# of every version probed, incl. the pinned one).  If a future DuckDB
# switched to pairwise summation, only a |dot| within ~2.6e-13 of zero
# could flip; test_lsh_sign_margin_above_reorder_noise pins the corpus
# minimum |dot| > 1e-9 (observed ≥ 1.8e-6 at sf0.1), so any silent margin
# erosion fails loudly before a reorder could ever matter.
_LSH_DIM = 64
_PLANE_ROWS = ", ".join(
    f"({t}, {p}, [{', '.join(str(float(_plane_weight(t, p, d))) for d in range(_LSH_DIM))}])"
    for t in range(N_TABLES)
    for p in range(N_PLANES)
)

_ANN_LSH_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(generate_series(1, len(vec)),
                                      i -> vec[i] * vec[i]))) AS norm
  FROM v),
planes AS (SELECT * FROM (VALUES {_PLANE_ROWS}) t(tbl, p, w)),
sig AS (
  SELECT vec_id, tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, {_LSH_DIM}),
                            i -> vec[i] * w[i])) >= 0
                       THEN (1 << p) ELSE 0 END) + tbl * 65536 AS BIGINT) AS bucket
  FROM n CROSS JOIN planes GROUP BY vec_id, tbl),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
pairs AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(generate_series(1, {_LSH_DIM}),
                                 i -> qn.vec[i] * cn.vec[i])) / (qn.norm * cn.norm) AS sim
  FROM cand
  JOIN n qn ON qn.vec_id = cand.query_id
  JOIN n cn ON cn.vec_id = cand.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM pairs)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@query("similarity_ann_lsh", oracle=_ANN_LSH_ORACLE)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH.

    Each vector gets N_TABLES bucket signatures; query and candidate meet
    only when they share a bucket in some table — at 100 TB this replaces
    the full crossJoin with |bucket|-bounded joins, and the buckets
    co-partition (shuffle on the signature, both sides pruned).  The
    hyperplanes are deterministic literals, so since r5 the whole
    pipeline is DuckDB-oracle-paired (identical buckets, candidates, and
    reranked output); recall vs the exact operator stays asserted in
    tests."""
    dim = 64
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES))
    c_sig = cand.select(
        "vec_id", "vec", "norm",
        F.explode(_bucket_array("vec", dim)).alias("bucket"),
    )
    q_sig = qry.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.explode(_bucket_array("vec", dim)).alias("bucket"),
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


# --------------------------------------------------------------------------
# Approximate: IVF (k-means coarse quantizer + nprobe search)
# --------------------------------------------------------------------------
IVF_CLUSTERS = 16
IVF_ITERS = 4
IVF_NPROBE = 6


def _sq_dist(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, v: s + v
    )


def _let(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate `value` ONCE per row, then
    reference it as a lambda variable inside `body`.

    Why this exists (r6 bench finding): a higher-order function re-evaluates
    every free subexpression of its lambda body on EVERY element iteration —
    and CollapseProject re-inlines single-use column aliases, so hoisting an
    expensive expression into `withColumn` does not protect it.  Embedding a
    64-element DECIMAL(12,6) quantization inside a k-element centroid scan
    therefore costs k×64 BigDecimal casts per row (measured ~4.6 ms/row for
    the PQ encoder at m·k=128).  `transform(array(v), x -> body(x))[0]`
    evaluates `v` exactly once as the HOF *argument* and binds it to a
    lambda variable, which is a plain slot lookup on every use — the
    expression-level equivalent of `let x = v in body`."""
    return F.transform(F.array(value), body)[0]


Centroids = list[tuple[int, list[float]]]


def _centroid_structs(cents: Centroids) -> Column:
    """array<struct<cluster_id, centroid>> from Python model state — the
    Spark equivalent of broadcasting k-means parameters, packed into one
    literal node (packed_model_col) so plan size and codegen stay O(1) in
    k×dim instead of one expression node per float (VERDICT r2 #1)."""
    data = [
        {"cluster_id": int(cid), "centroid": [float(x) for x in vec]}
        for cid, vec in cents
    ]
    return packed_model_col(data, "array<struct<cluster_id:int,centroid:array<double>>>")


def _d2_structs(vec_col: str | Column, cents: Centroids) -> Column:
    """Per-row array<struct<d2, cluster_id>> — squared distance to every
    centroid, computed inside one expression (no join, no shuffle).  The
    field order (d2 first) is load-bearing: array_min/array_sort compare
    structs lexicographically, so min = nearest centroid, ties broken by
    the smaller cluster_id.  The vector is let-bound so a non-attribute
    `vec_col` (e.g. an inlined quantization) evaluates once, not once per
    centroid (see `_let`)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _let(
        vec,
        lambda v: F.transform(
            _centroid_structs(cents),
            lambda c: F.struct(
                _sq_dist(v, c["centroid"]).alias("d2"),
                c["cluster_id"].alias("cluster_id"),
            ),
        ),
    )


IVF_TRAIN_CAP = 4096  # vectors collected for coarse-quantizer training (k×256)

# --------------------------------------------------------------------------
# Engine-exact integer k-means (r6): a fit DuckDB can replay bit-for-bit
# --------------------------------------------------------------------------
# The r4/r5 fits were numpy float64 Lloyd's — correct, but impossible to
# oracle-pair: float means depend on summation order, so no other engine
# could reproduce the centroids and the IVF/PQ queries stayed rows-only.
# The r6 fit removes EVERY float from the model path:
#   * coordinates quantize to scale-6 integers — CAST(x AS DECIMAL(12,6))
#     (probed bit-identical between Spark and DuckDB, incl. the 2.675
#     boundary; exact decimal ties are unrepresentable in binary doubles,
#     so the two engines' rounding modes can never disagree) then ×10^6;
#   * squared distances are int64 sums (testdata |x| ≤ 0.58 → per-dim
#     diff ≤ 1.2e6 scaled, d2 ≤ 64·(1.2e6)² ≈ 9e13 ≪ 2^63 — and even
#     unit-norm-ish vectors at |x| ≤ 100 stay below 2^63);
#   * centroid means round half-away-from-zero via the pure-integer
#     formula (2|s| + n) DIV 2n — no double cast, no round(), and the
#     integer member sums are associative, so no execution order can
#     perturb them;
#   * the training set is the IVF_TRAIN_CAP vectors with the smallest
#     engine-independent md5-60 hash (the r5 hash-parity primitive,
#     test_engine_hash_parity.py), init = first k of those in hash order.
# Both engines walk the identical integer state, so the DuckDB oracle
# replays the fit as an unrolled CTE chain (one block per Lloyd
# iteration) and lands on the same centroids to the last scaled unit.
# Model quality is untouched at 1e-6 resolution; recall tests
# (test_similarity.py) still pass against the exact path.

KM_SCALE = 1_000_000  # DECIMAL(12,6) coordinates as scale-6 integers

IntCentroids = list[tuple[int, list[int]]]  # [(cluster_id, scale-6 coords)]


def _qint(vec_col: str | Column) -> Column:
    """array<double> → array<bigint>: scale-6 integer coordinates via the
    cross-engine-exact DECIMAL(12,6) cast (DuckDB twin:
    ``CAST(CAST(x AS DECIMAL(12,6)) * 1000000 AS BIGINT)``)."""
    return F.transform(
        vec_col, lambda x: (x.cast("decimal(12,6)") * F.lit(KM_SCALE)).cast("long")
    )


def _sq_dist_int(a: str | Column, b: str | Column) -> Column:
    """Exact int64 squared distance between scale-6 integer vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def _centroid_structs_int(cents: IntCentroids) -> Column:
    data = [
        {"cluster_id": int(cid), "centroid": [int(x) for x in vec]}
        for cid, vec in cents
    ]
    return packed_model_col(
        data, "array<struct<cluster_id:int,centroid:array<bigint>>>"
    )


def _d2_structs_int(vec_col: str | Column, cents: IntCentroids) -> Column:
    """Per-row array<struct<d2:bigint, cluster_id:int>> against integer
    centroids — same lexicographic argmin/sort contract as `_d2_structs`,
    but every comparison is exact integer math shared with the oracle.
    The (typically `_qint`-derived) vector is let-bound so its 64
    DECIMAL(12,6) casts run once per row, not once per centroid
    (see `_let`)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _let(
        vec,
        lambda v: F.transform(
            _centroid_structs_int(cents),
            lambda c: F.struct(
                _sq_dist_int(v, c["centroid"]).alias("d2"),
                c["cluster_id"].alias("cluster_id"),
            ),
        ),
    )


def _round_half_away(s: int, n: int) -> int:
    """round(s/n) half away from zero in pure integer math — the exact
    formula the oracle uses (``(2|s| + n) // (2n)`` with the sign put
    back), so Spark-side and DuckDB-side centroids agree even on ties."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((-2 * s + n) // (2 * n))


def _km_train_rows(emb: DataFrame, cap: int = IVF_TRAIN_CAP) -> list[list[int]]:
    """The deterministic training set, in model order: the `cap` vectors
    with the smallest (md5-60(vec_id), vec_id), as scale-6 integers.

    ONE Spark job (TakeOrderedAndProject — parallel local top-k then a
    bounded merge, a few MB regardless of corpus size).  Hash order makes
    the sample uniform; vec_id breaks hash collisions."""
    from iceberg_table_generator_spark.operators.dedup import _md5_60

    rows = (
        emb.select(
            _md5_60(F.col("vec_id").cast("string")).alias("h"),
            "vec_id",
            _qint("vec").alias("qv"),
        )
        .orderBy("h", "vec_id")
        .limit(cap)
        .collect()
    )
    return [list(r.qv) for r in rows]


def _km_fit_int(
    train: list[list[int]], k: int, iters: int, keep_empty: bool
) -> IntCentroids:
    """Integer-exact Lloyd's, driver-side over the bounded training set
    (numpy int64 — EXACT, order-free, microseconds at cap=4096; the same
    arithmetic the oracle's CTE chain replays).  init = first k training
    rows; argmin ties break toward the smaller cluster_id; empty clusters
    drop (IVF — the model shrinks) or keep their previous centroid (PQ —
    codes index the codebook and must stay dense 0..k-1)."""
    import numpy as np

    X = np.asarray(train, dtype=np.int64)
    C = X[: min(k, len(X))].copy()
    ids = list(range(len(C)))
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties → first = smallest cid (ids sorted)
        new_ids: list[int] = []
        new_rows: list[list[int]] = []
        for j, cid in enumerate(ids):
            members = X[assign == j]
            if len(members):
                s = members.sum(axis=0)
                new_ids.append(cid)
                new_rows.append(
                    [_round_half_away(int(v), len(members)) for v in s]
                )
            elif keep_empty:
                new_ids.append(cid)
                new_rows.append([int(v) for v in C[j]])
        ids, C = new_ids, np.asarray(new_rows, dtype=np.int64)
    return [(cid, [int(v) for v in row]) for cid, row in zip(ids, C)]


def ivf_fit(emb: DataFrame, k: int = IVF_CLUSTERS, iters: int = IVF_ITERS) -> IntCentroids:
    """Engine-exact IVF coarse quantizer: integer k-means on the bounded
    md5-ordered sample (see the block comment above).  Returns scale-6
    integer centroids; `centroids_to_float` derives the double view."""
    return _km_fit_int(_km_train_rows(emb), k=k, iters=iters, keep_empty=False)


def centroids_to_float(cents: IntCentroids) -> Centroids:
    """Double view of integer centroids: exact int→double conversion
    (|c| ≪ 2^53) then one correctly-rounded division — both engines land
    on the identical double (DuckDB twin: ``CAST(c AS DOUBLE) / 1000000.0``)."""
    return [(cid, [v / 1e6 for v in vec]) for cid, vec in cents]


# One IVF index per (corpus, k, iters): queries over the same scale-factor
# directory share the fitted centroids, exactly as a real vector store
# builds its index once and serves many searches from it.  The cache holds
# only model state (k×dim ints per entry).
_IVF_INDEX_CACHE: dict[tuple[str, int, int], IntCentroids] = {}


def ivf_index(emb: DataFrame, cache_key: str, k: int = IVF_CLUSTERS,
              iters: int = IVF_ITERS) -> IntCentroids:
    """Fit-or-fetch the IVF coarse quantizer for a corpus.

    Fits on the deterministic IVF_TRAIN_CAP-vector md5-order sample
    (k-means quality needs only a representative sample; at 100 TB the
    sampled fraction shrinks while assignment stays one full narrow
    pass)."""
    key = (cache_key, k, iters)
    if key not in _IVF_INDEX_CACHE:
        _IVF_INDEX_CACHE[key] = ivf_fit(emb, k=k, iters=iters)
    return _IVF_INDEX_CACHE[key]


def _assign(emb: DataFrame, cents: Centroids) -> DataFrame:
    """Nearest-centroid assignment: fold-based argmin over broadcast
    centroid literals — one narrow projection, zero shuffle.

    (The previous crossJoin + Window.partitionBy(vec_id) form shuffled and
    sorted corpus×k rows per call — a full-corpus shuffle on a unique key,
    once per k-means iteration.  array_min over the per-centroid distance
    structs computes the same argmin inside whole-stage codegen.)"""
    best = F.array_min(_d2_structs("vec", cents))
    return emb.select("vec_id", "vec", best["cluster_id"].alias("cluster_id"))


_VEC_DIM = 64  # embeddings table vector width (TESTDATA.md)


def _sql_d2_int(a: str, b: str, dim: int) -> str:
    """DuckDB twin of `_sq_dist_int`: exact integer squared distance."""
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"
    )


def _sql_km_setup() -> str:
    """Shared oracle preamble: corpus as doubles + scale-6 ints + md5-60
    hash, and the deterministic training set (mirrors `_km_train_rows`)."""
    from iceberg_table_generator_spark.operators.dedup import _sql_md5_60

    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q0 AS (
  SELECT vec_id, vec,
         list_transform(vec, x ->
             CAST(CAST(x AS DECIMAL(12,6)) * {KM_SCALE} AS BIGINT)) AS qv,
         {_sql_md5_60('CAST(vec_id AS VARCHAR)')} AS h
  FROM v),
train AS (SELECT vec_id, qv, h FROM q0 ORDER BY h, vec_id LIMIT {IVF_TRAIN_CAP})"""


# The integer half-away-from-zero mean: round(s/n) with no float anywhere —
# the oracle-side twin of `_round_half_away`.
_SQL_MEAN = (
    "CAST(CASE WHEN sum(x) >= 0 THEN (2*sum(x) + count(*)) // (2*count(*)) "
    "ELSE -((-2*sum(x) + count(*)) // (2*count(*))) END AS BIGINT)"
)


def _sql_ivf_fit_ctes(k: int, iters: int, dim: int) -> str:
    """Unrolled Lloyd's iterations as CTE blocks — DuckDB replays the
    integer fit exactly (see the engine-exact k-means block comment):
    a{n} = assignment (argmin by exact int d2, ties → smaller cid),
    u{n} = winner rows unnested per dimension,
    c{n} = new centroids via the integer half-away mean; empty clusters
    simply vanish from the GROUP BY, matching keep_empty=False."""
    blocks = [f""",
c0 AS (
  SELECT cid, qv AS cv FROM (
    SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) - 1 AS cid, qv
    FROM train) WHERE cid < {k})"""]
    for n in range(1, iters + 1):
        p = n - 1
        blocks.append(f""",
a{n} AS (
  SELECT t.vec_id, t.qv, c.cid,
         row_number() OVER (PARTITION BY t.vec_id
             ORDER BY {_sql_d2_int('t.qv', 'c.cv', dim)}, c.cid) AS rn
  FROM train t CROSS JOIN c{p} c),
u{n} AS (
  SELECT cid, g.i, qv[g.i] AS x
  FROM a{n}, generate_series(1, {dim}) g(i) WHERE rn = 1),
c{n} AS (
  SELECT cid, list(cx ORDER BY i) AS cv FROM (
    SELECT cid, i, {_SQL_MEAN} AS cx
    FROM u{n} GROUP BY cid, i) GROUP BY cid)""")
    return "".join(blocks)


def _ivf_oracle() -> str:
    k, iters, dim = IVF_CLUSTERS, IVF_ITERS, _VEC_DIM
    cf = f"c{iters}"
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        "i -> p.qvec[i]*cand.vec[i]))"
    )
    return f"""{_sql_km_setup()}{_sql_ivf_fit_ctes(k, iters, dim)},
assignq AS (
  SELECT q0.vec_id, q0.vec, q0.qv, c.cid,
         row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_sql_d2_int('q0.qv', 'c.cv', dim)}, c.cid) AS rn
  FROM q0 CROSS JOIN {cf} c),
lists AS (
  SELECT vec_id, vec, qv, cid,
         sqrt(list_sum(list_transform(generate_series(1, {dim}),
                                      i -> vec[i]*vec[i]))) AS norm
  FROM assignq WHERE rn = 1),
probes AS (
  SELECT query_id, qvec, qnorm, cid FROM (
    SELECT q.vec_id AS query_id, q.vec AS qvec, q.norm AS qnorm, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {_sql_d2_int('q.qv', 'c.cv', dim)}, c.cid) AS rn
    FROM (SELECT * FROM lists WHERE vec_id < {N_QUERIES}) q
    CROSS JOIN {cf} c) WHERE rn <= {IVF_NPROBE}),
pairs AS (
  SELECT p.query_id, cand.vec_id AS neighbor_id,
         {dot} / (p.qnorm * cand.norm) AS sim
  FROM probes p JOIN lists cand
    ON cand.cid = p.cid AND cand.vec_id <> p.query_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM pairs)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@query("similarity_ivf_topk", oracle=_ivf_oracle())
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: k-means partitions the corpus into inverted lists; each
    query probes only its IVF_NPROBE nearest lists.

    Oracle-paired since r6: the coarse quantizer is the engine-exact
    integer k-means (block comment above), so DuckDB refits the identical
    centroids from the raw parquet and replays assignment, probing, and
    scoring end-to-end — the full ANN pipeline is hash-checked, not just
    row-counted.  Cosine scoring stays in doubles (same sequential fold
    both engines, the similarity_cosine_topk precedent).

    At 100 TB: fit on a bounded sample, assignment is one narrow pass,
    and the search join hits nprobe/k of the corpus — the candidate join
    co-partitions both sides on cluster_id.  Better than hyperplane LSH
    when the corpus is genuinely clustered (this testdata has 10 labeled
    clusters)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    centroids = ivf_index(emb, cache_key=sf_dir)
    qemb = emb.withColumn("qv", _qint("vec"))
    best = F.array_min(_d2_structs_int("qv", centroids))
    lists = qemb.select("vec_id", "vec", "qv", best["cluster_id"].alias("cluster_id"))
    cand = with_norm(lists)
    qry = cand.filter(F.col("vec_id") < N_QUERIES)
    # nprobe nearest clusters per query: sort the per-centroid distance
    # structs in-row and take the first nprobe — no crossJoin, no window.
    probes = (
        qry.withColumn(
            "probe",
            F.explode(
                F.slice(F.array_sort(_d2_structs_int("qv", centroids)), 1, IVF_NPROBE)
            ),
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.col("probe.cluster_id").alias("cluster_id"),
        )
    )
    pairs = (
        cand.join(F.broadcast(probes), "cluster_id")
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
# Scalar quantization (int8) — the storage tier of a vector index
# --------------------------------------------------------------------------
_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
s AS (
  SELECT vec_id, vec,
         greatest(list_max(list_transform(vec, x -> abs(x))), 1e-12) / 127.0
           AS scale
  FROM v),
q AS (
  SELECT vec_id, vec, scale,
         list_transform(vec, x -> round(x / scale)) AS qv
  FROM s)
SELECT vec_id,
       scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_max,
       sqrt(list_sum(list_transform(
           generate_series(1, len(vec)),
           i -> (vec[i] - qv[i] * scale) * (vec[i] - qv[i] * scale))))
         AS l2_error
FROM q
"""


@query("similarity_quantize_int8", oracle=_QUANT_ORACLE)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the compression
    step that shrinks a vector index 4x before ANN search: scale =
    max|x|/127, q_i = round(x_i/scale), plus the reconstruction L2 error
    that decides whether int8 is acceptable for a corpus.  Pure per-row
    folds (zero shuffle).  scale and l2_error are emitted as RAW doubles:
    both engines run the identical IEEE op sequence on identical inputs,
    so the bits match exactly — whereas round(x, 9) itself diverges
    between engines (BigDecimal string rounding vs multiply-round-divide)
    and was observed flipping the 9th digit."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    scale = (
        F.greatest(
            F.array_max(F.transform("vec", lambda x: F.abs(x))), F.lit(1e-12)
        )
        / 127.0
    )
    s = emb.withColumn("scale", scale)
    q = s.withColumn("qv", F.transform("vec", lambda x: F.round(x / F.col("scale"))))
    err2 = F.aggregate(
        F.zip_with("vec", "qv", lambda x, qi: (x - qi * F.col("scale")) * (x - qi * F.col("scale"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return q.select(
        "vec_id",
        "scale",
        F.aggregate("qv", F.lit(0.0), lambda a, x: a + x).cast("long").alias("q_sum"),
        F.array_max(F.transform("qv", lambda x: F.abs(x))).cast("long").alias("q_max"),
        F.sqrt(err2).alias("l2_error"),
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


# --------------------------------------------------------------------------
# Product quantization (PQ codes + asymmetric-distance shortlist + rerank)
# --------------------------------------------------------------------------
PQ_M = 8  # subspaces (64-dim -> 8 sub-vectors of 8 dims)
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_ITERS = 4
PQ_SHORTLIST = 50  # ADC candidates per query before exact rerank

Codebooks = list[list[list[float]]]  # [m][k][sub_dim] doubles (ADC view)
IntCodebooks = list[list[list[int]]]  # [m][k][sub_dim] scale-6 integers
_PQ_CACHE: dict[tuple[str, int, int], IntCodebooks] = {}


def pq_fit(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
           iters: int = PQ_ITERS) -> IntCodebooks:
    """Train per-subspace codebooks on the same deterministic md5-order
    sample as `ivf_fit`, with the engine-exact INTEGER k-means (one Spark
    job; integer Lloyd's per subspace — see the engine-exact k-means block
    comment).  Empty clusters keep their previous centroid so code ids
    stay dense 0..k-1 — a PQ code is an INDEX into the codebook and must
    never shift; the oracle mirrors this with a COALESCE left join per
    iteration."""
    train = _km_train_rows(emb)
    dim = len(train[0]) if train else _VEC_DIM
    assert dim % m == 0, f"dim {dim} not divisible by {m} subspaces"
    d = dim // m
    books: IntCodebooks = []
    for j in range(m):
        sub = [row[j * d : (j + 1) * d] for row in train]
        fitted = _km_fit_int(sub, k=k, iters=iters, keep_empty=True)
        books.append([vec for _cid, vec in fitted])  # dense cid order
    return books


def codebooks_to_float(books: IntCodebooks) -> Codebooks:
    """Double view for ADC scoring — same exact conversion contract as
    `centroids_to_float`."""
    return [[[v / 1e6 for v in c] for c in b] for b in books]


def pq_index(emb: DataFrame, cache_key: str, m: int = PQ_M, k: int = PQ_K) -> IntCodebooks:
    key = (cache_key, m, k)
    if key not in _PQ_CACHE:
        _PQ_CACHE[key] = pq_fit(emb, m=m, k=k)
    return _PQ_CACHE[key]


def _pq_codes(vec_col: str | Column, books: IntCodebooks) -> Column:
    """Encode a vector as its per-subspace nearest-centroid indices — the
    4-byte-per-vector representation that makes a billion-vector index
    RAM-resident.  One packed-literal fold, zero shuffle, O(1) plan size
    in m×k×dim (packed_model_col).  Encoding is exact integer math over
    the scale-6 quantized vector, so the oracle reproduces every code.

    Evaluation strategy (r6 bench fix): the quantized vector and its m
    subspace slices are let-bound (`_let`), so the 64 DECIMAL(12,6) casts
    run once per row instead of once per (subspace, codeword) pair —
    the inlined form cost m·k·dim ≈ 4096 BigDecimal casts/row, measured
    ~4.6 ms/row at sf0.1."""
    m, sub_dim = len(books), len(books[0][0])
    cb = packed_model_col(books, "array<array<array<bigint>>>")
    subs_of = lambda qv: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(qv, j * sub_dim + 1, sub_dim),
    )
    return _let(
        _let(_qint(vec_col), subs_of),
        lambda subs: F.transform(
            cb,
            lambda mcb, mi: F.array_min(
                F.transform(
                    mcb,
                    lambda c, i: F.struct(
                        _sq_dist_int(F.element_at(subs, mi + 1), c).alias("d2"),
                        i.alias("code"),
                    ),
                )
            )["code"],
        ),
    )


def _pq_query_table(vec_col: str | Column, books: Codebooks) -> Column:
    """ADC lookup table for a query: squared distance from each query
    sub-vector to every codebook centroid ([m][k] doubles) — computed
    once per query, then each candidate costs m array lookups instead of
    a full d-dim dot product."""
    sub_dim = len(books[0][0])
    cb = packed_model_col(books, "array<array<array<double>>>")
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _let(
        vec,
        lambda v: F.transform(
            cb,
            lambda mcb, m: F.transform(
                mcb, lambda c: _sq_dist(F.slice(v, m * sub_dim + 1, sub_dim), c)
            ),
        ),
    )


def _sql_pq_fit_ctes(m: int, k: int, iters: int, sd: int, prefix: str = "") -> str:
    """PQ per-subspace integer codebook fit as a CTE chain (ts, c0..c{iters})
    — shared by the PQ top-k oracle and the distortion audit.  `prefix`
    renames every CTE (ts → {prefix}ts, c{n} → {prefix}c{n}, …) so the
    chain can coexist with the IVF fit chain (which owns the unprefixed
    a{n}/u{n}/c{n} names) in one composed oracle
    (wave16.similarity_ivfpq_recall)."""
    x = prefix
    parts = [f""",
{x}ts AS (
  SELECT t.vec_id, t.h, g.j,
         list_transform(generate_series(1, {sd}), i -> t.qv[g.j*{sd}+i]) AS sv
  FROM train t, generate_series(0, {m - 1}) g(j)),
{x}c0 AS (
  SELECT j, cid, sv AS cv FROM (
    SELECT j, CAST(row_number() OVER (PARTITION BY j ORDER BY h, vec_id)
                   AS INT) - 1 AS cid, sv
    FROM {x}ts) WHERE cid < {k})"""]
    for n in range(1, iters + 1):
        p = n - 1
        parts.append(f""",
{x}a{n} AS (
  SELECT ts.vec_id, ts.j, ts.sv, c.cid,
         row_number() OVER (PARTITION BY ts.vec_id, ts.j
             ORDER BY {_sql_d2_int('ts.sv', 'c.cv', sd)}, c.cid) AS rn
  FROM {x}ts ts JOIN {x}c{p} c ON c.j = ts.j),
{x}u{n} AS (
  SELECT j, cid, g.i, sv[g.i] AS x
  FROM {x}a{n}, generate_series(1, {sd}) g(i) WHERE rn = 1),
{x}nc{n} AS (
  SELECT j, cid, list(cx ORDER BY i) AS cv FROM (
    SELECT j, cid, i, {_SQL_MEAN} AS cx
    FROM {x}u{n} GROUP BY j, cid, i) GROUP BY j, cid),
{x}c{n} AS (
  SELECT p.j, p.cid, COALESCE(w.cv, p.cv) AS cv
  FROM {x}c{p} p LEFT JOIN {x}nc{n} w ON w.j = p.j AND w.cid = p.cid)""")
    return "".join(parts)


def _pq_oracle() -> str:
    """DuckDB twin of the full PQ pipeline: refit the per-subspace integer
    codebooks (one CTE chain handles all m subspaces via a subspace column
    j), re-encode every candidate, rebuild each query's ADC table, and
    replay shortlist + exact rerank.  The ADC doubles match because both
    engines run identical folds over identical doubles (the float
    codebook view is the same exact int→double conversion on both
    sides)."""
    m, k, iters = PQ_M, PQ_K, PQ_ITERS
    sd, dim = _VEC_DIM // PQ_M, _VEC_DIM
    parts = [_sql_km_setup(), _sql_pq_fit_ctes(m, k, iters, sd)]
    cf = f"c{iters}"
    cvd = f"CAST(c.cv[i] AS DOUBLE)/{KM_SCALE}.0"
    parts.append(f""",
cs AS (
  SELECT q0.vec_id, g.j,
         list_transform(generate_series(1, {sd}), i -> q0.qv[g.j*{sd}+i]) AS sv
  FROM q0, generate_series(0, {m - 1}) g(j)),
codes AS (
  SELECT vec_id, j, cid AS code FROM (
    SELECT cs.vec_id, cs.j, c.cid,
           row_number() OVER (PARTITION BY cs.vec_id, cs.j
               ORDER BY {_sql_d2_int('cs.sv', 'c.cv', sd)}, c.cid) AS rn
    FROM cs JOIN {cf} c ON c.j = cs.j) WHERE rn = 1),
cl AS (SELECT vec_id, list(code ORDER BY j) AS codes FROM codes GROUP BY vec_id),
nrm AS (
  SELECT vec_id, vec,
         sqrt(list_sum(list_transform(generate_series(1, {dim}),
                                      i -> vec[i]*vec[i]))) AS norm
  FROM v),
qn AS (SELECT * FROM nrm WHERE vec_id < {N_QUERIES}),
qtab AS (
  SELECT q.vec_id AS query_id, c.j, c.cid,
         list_sum(list_transform(generate_series(1, {sd}),
           i -> (q.vec[c.j*{sd}+i] - {cvd})
              * (q.vec[c.j*{sd}+i] - {cvd}))) AS d2
  FROM qn q CROSS JOIN {cf} c),
qtl AS (SELECT query_id, j, list(d2 ORDER BY cid) AS tr
        FROM qtab GROUP BY query_id, j),
qt2 AS (SELECT query_id, list(tr ORDER BY j) AS tab FROM qtl GROUP BY query_id),
adc AS (
  SELECT q.vec_id AS query_id, cand.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, {m}),
                  j -> t.tab[j][cl.codes[j] + 1])) AS adc_d2
  FROM qn q
  JOIN qt2 t ON t.query_id = q.vec_id
  CROSS JOIN nrm cand
  JOIN cl ON cl.vec_id = cand.vec_id
  WHERE cand.vec_id <> q.vec_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d2, neighbor_id) AS rn
    FROM adc) WHERE rn <= {PQ_SHORTLIST}),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         list_sum(list_transform(generate_series(1, {dim}),
                  i -> q.vec[i]*c.vec[i])) / (q.norm * c.norm) AS sim
  FROM short s
  JOIN nrm q ON q.vec_id = s.query_id
  JOIN nrm c ON c.vec_id = s.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM rer)
SELECT query_id, neighbor_id, round(sim, 6) AS sim, rank
FROM ranked WHERE rank <= {TOP_K}
""")
    return "".join(parts)


@query("similarity_pq_topk", oracle=_pq_oracle())
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ + ADC + exact rerank — the memory-bound tier of a vector index
    (IVF prunes WHICH vectors to score; PQ compresses HOW each is scored):
    candidates are scored by summing m table lookups over their 4-bit
    codes (asymmetric distance), the per-query shortlist is reranked with
    exact cosine, and only shortlist-sized data ever shuffles.

    Oracle-paired since r6: codebook fitting and candidate encoding are
    exact integer math (engine-exact k-means block comment), and the ADC
    doubles are identical folds on both engines, so DuckDB replays fit →
    encode → ADC shortlist → rerank end-to-end from the raw parquet.

    At 100 TB the candidate scan reads codes (4 bytes/vector), not
    vectors (256 bytes/vector) — a 64x scan reduction; the rerank
    fetches full vectors for PQ_SHORTLIST rows per query only."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    books = pq_index(emb, cache_key=sf_dir)
    cand = with_norm(emb).withColumn("codes", _pq_codes("vec", books))
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        _pq_query_table("vec", codebooks_to_float(books)).alias("qtab"),
    )
    adc = (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qvec",
            "qnorm",
            F.col("vec_id").alias("neighbor_id"),
            "vec",
            "norm",
            F.aggregate(
                F.zip_with(
                    "codes", "qtab", lambda code, row: F.element_at(row, code + 1)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("neighbor_id"))
    shortlist = adc.withColumn("adc_rank", F.row_number().over(w)).filter(
        F.col("adc_rank") <= PQ_SHORTLIST
    )
    sim = (_dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))).alias("sim")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        shortlist.select("query_id", "neighbor_id", sim)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


# --------------------------------------------------------------------------
# Random sign projection (Achlioptas): 64-d -> 16-d, oracle-paired
# --------------------------------------------------------------------------
RPROJ_OUT_DIM = 16
RPROJ_IN_DIM = 64

_RPROJ_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
dims AS (SELECT unnest(generate_series(1, {RPROJ_OUT_DIM})) AS out_dim)
SELECT vec_id, CAST(out_dim AS INT) AS out_dim,
       list_sum(list_transform(generate_series(1, {RPROJ_IN_DIM}),
         j -> vec[j] * CAST(((out_dim * 31 + j * 17) % 2) * 2 - 1 AS DOUBLE)))
         AS val
FROM v CROSS JOIN dims
"""


@query("similarity_random_projection", oracle=_RPROJ_ORACLE)
def similarity_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection: embed 64-d vectors into 16-d
    with a DETERMINISTIC ±1 matrix computed from (out_dim, in_dim) index
    arithmetic — no stored weights, no broadcast, no randomness (the
    xxhash64-not-rand policy of datagen/values.py applied to projections).
    Output exploded to (vec_id, out_dim, val) scalar rows.

    Scale posture: pure per-row fold over the vector — zero shuffle, zero
    model state, codegen size O(1) in corpus (the lambda is one expression
    regardless of k×dim, the fix the literal-codegen ANN paths needed).
    Both engines fold j ascending over the same doubles → bit-exact vals,
    emitted raw per the no-rounding policy."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    return emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(RPROJ_OUT_DIM))).alias("out_dim"),
        "vec",
    ).select(
        "vec_id",
        F.col("out_dim").cast("int").alias("out_dim"),
        F.expr(
            f"aggregate(sequence(1, {RPROJ_IN_DIM}), cast(0.0 as double), "
            "(acc, j) -> acc + vec[j-1] * "
            "cast(((out_dim * 31 + j * 17) % 2) * 2 - 1 as double))"
        ).alias("val"),
    )


# --------------------------------------------------------------------------
# Exact cosine top-k, Arrow-vectorized (integer GEMM inside mapInPandas)
# --------------------------------------------------------------------------
# The other implementation strategy for the brute-force scorer: instead of
# a JVM expression fold per pair, ship Arrow batches of quantized vectors
# into numpy and score a whole batch against the whole query set with ONE
# int64 matrix multiply.  Oracle-pairable precisely BECAUSE the dot is
# integer: int64 GEMM is exact and order-free, so DuckDB's sequential
# integer list_sum lands on the identical dot product, and the only float
# ops (sqrt of an exact int, one multiply, one divide) are correctly
# rounded IEEE ops on identical inputs on both engines.  A float GEMM
# could NOT be paired — numpy's pairwise summation orders differently
# than any SQL fold (the same reason the LSH sign test pins sequential
# list_sum, see the version-drift guard above).
_VCOS_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q0 AS (
  SELECT vec_id,
         list_transform(vec,
             x -> CAST(CAST(x AS DECIMAL(12,6)) * 1000000 AS BIGINT)) AS qv
  FROM v),
n AS (
  SELECT vec_id, qv,
         sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
  FROM q0),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, {_VEC_DIM}),
                                      i -> q.qv[i] * c.qv[i])) AS DOUBLE)
           / (q.nrm * c.nrm) AS sim
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


@query("similarity_cosine_topk_vectorized", oracle=_VCOS_ORACLE)
def similarity_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine via Arrow-batched integer GEMM (mapInPandas).

    Same contract as `similarity_cosine_topk` but over DECIMAL(12,6)-
    quantized vectors (sims differ from the raw-double variant only at
    ~1e-6): each Arrow batch of candidate vectors is scored against the
    whole query set with one numpy int64 matmul — exact, order-free —
    and only the per-batch top-k per query leaves Python (k rows per
    query per batch).  The query set is bounded (vec_id < N_QUERIES) and
    collected once, the established model-parameter premise of the
    similarity family; at 100 TB the candidate scan is embarrassingly
    parallel and the final rank is the (n_queries × k·batches)-bounded
    window.  This is the plumbing pattern for every "score the corpus
    against a small model" stage where the kernel wants BLAS, with the
    cross-engine exactness coming from integer arithmetic rather than
    from hoping two engines order float sums identically."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", _qint("vec").alias("qv"))
        .orderBy("vec_id")
        .collect()  # bounded by N_QUERIES — model-parameter-sized
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Q = np.array([list(r.qv) for r in q_rows], dtype=np.int64)
    qn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
    k = TOP_K

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            B = np.array(pdf["qv"].tolist(), dtype=np.int64)
            # exact int64 GEMM: |dot| <= dim * (1.2e6)^2 ~ 9e13 << 2^63
            S = B @ Q.T
            bn = np.sqrt((B * B).sum(axis=1).astype(np.float64))
            # operation order matches the oracle: double(dot) / (qn * bn)
            sims = S.astype(np.float64) / (qn[None, :] * bn[:, None])
            outq, outn, outs = [], [], []
            for j in range(len(q_ids)):
                col = sims[:, j]
                mask = ids != q_ids[j]
                cids, csims = ids[mask], col[mask]
                # local top-k, ties broken by ascending neighbor_id
                order = np.lexsort((cids, -csims))[:k]
                outq.extend([q_ids[j]] * len(order))
                outn.extend(cids[order])
                outs.extend(csims[order])
            yield pd.DataFrame(
                {"query_id": outq, "neighbor_id": outn, "sim": outs}
            )

    cand = spread(emb.select("vec_id", _qint("vec").alias("qv")))
    local = cand.mapInPandas(score, "query_id long, neighbor_id long, sim double")
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


# --------------------------------------------------------------------------
# kNN label prediction (weak-supervision labeling via neighbor vote)
# --------------------------------------------------------------------------
KNN_K = 10  # neighbors per probe
KNN_SEED = 200  # vec_id < 200 form the labeled seed set
KNN_QMOD, KNN_QREM = 50, 7  # vec_id % 50 == 7 plays the unlabeled corpus

_KNN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (
  SELECT vec_id, label, vec,
         sqrt(list_sum(list_transform(generate_series(1, len(vec)),
                                      i -> vec[i] * vec[i]))) AS norm
  FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.label AS n_label, c.vec_id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(q.vec)),
                  i -> q.vec[i] * c.vec[i])) / (q.norm * c.norm) AS sim
  FROM n q JOIN n c ON c.vec_id < {KNN_SEED} AND c.vec_id <> q.vec_id
  WHERE q.vec_id % {KNN_QMOD} = {KNN_QREM}),
topk AS (
  SELECT query_id, true_label, n_label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs),
votes AS (
  SELECT query_id, true_label, n_label, CAST(count(*) AS INT) AS votes
  FROM topk WHERE rank <= {KNN_K}
  GROUP BY query_id, true_label, n_label),
best AS (
  SELECT query_id, true_label, n_label AS pred_label, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, n_label) AS vr
  FROM votes)
SELECT query_id, true_label, pred_label, votes,
       CAST(pred_label = true_label AS BOOLEAN) AS correct
FROM best WHERE vr = 1
"""


@query("similarity_knn_label", oracle=_KNN_ORACLE)
def similarity_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-majority label prediction: each "unlabeled" corpus vector
    (vec_id % KNN_QMOD == KNN_QREM — a corpus FRACTION, streamed) votes
    the label of its KNN_K exact cosine neighbors among the bounded
    labeled seed set (vec_id < KNN_SEED) — semi-supervised label
    propagation, the weak-supervision pass that stretches a small
    hand-labeled set over a web-scale corpus; run on rows whose true
    label is known, `correct` is the per-probe embedding-quality eval
    bit.

    Scale posture — note the asymmetry, opposite of
    `similarity_cosine_topk`: the SEED side broadcasts (id-bounded by
    construction; it is the hand-labeled set, fixed-size in production)
    and the corpus side streams, so the unbounded relation is never
    broadcast, never shuffled whole.  The rank window partitions by
    probe — each partition is the probe's ≤KNN_SEED candidate rows, so
    the window state is seed-bounded no matter the corpus size (the
    bounded-broadcast invariant test pins this shape).  Ties are
    deterministic on both engines: neighbor cut by (sim DESC, vec_id),
    vote winner by (votes DESC, label ASC); sims reuse the sequential
    fold that is bit-identical to DuckDB's list_sum."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    seed = with_norm(emb.filter(F.col("vec_id") < KNN_SEED)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("vec").alias("svec"),
        F.col("norm").alias("snorm"),
    )
    probes = with_norm(
        emb.filter(F.pmod("vec_id", F.lit(KNN_QMOD)) == KNN_QREM)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        probes.crossJoin(F.broadcast(seed))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "n_label",
            "neighbor_id",
            (_dot("qvec", "svec") / (F.col("qnorm") * F.col("snorm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    votes = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .groupBy("query_id", "true_label", "n_label")
        .agg(F.count(F.lit(1)).cast("int").alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("n_label"))
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("n_label").alias("pred_label"),
            "votes",
            (F.col("n_label") == F.col("true_label")).alias("correct"),
        )
    )


# --------------------------------------------------------------------------
# Nearest-centroid classification (parametric twin of the kNN vote)
# --------------------------------------------------------------------------
# Track the single fixture-width constant (r7 advice): the oracle iterates
# dims 1.._NC_DIM while the Spark side uses the actual array length, so a
# divergent literal would silently desynchronize them.
_NC_DIM = _VEC_DIM

_NC_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
ex AS (
  SELECT label, i, vec[i] AS x
  FROM v, unnest(generate_series(1, {_NC_DIM})) AS t(i)),
cent AS (
  SELECT label, i,
         CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS c
  FROM ex GROUP BY label, i),
carr AS (
  SELECT label AS c_label, list(c ORDER BY i) AS cvec
  FROM cent GROUP BY label),
probes AS (
  SELECT vec_id, label AS true_label, vec FROM v
  WHERE vec_id % {KNN_QMOD} = {KNN_QREM}),
dists AS (
  SELECT p.vec_id, p.true_label, c.c_label,
         list_sum(list_transform(generate_series(1, {_NC_DIM}),
                  i -> (p.vec[i] - c.cvec[i]) * (p.vec[i] - c.cvec[i]))) AS d2
  FROM probes p CROSS JOIN carr c),
best AS (
  SELECT vec_id, true_label, c_label AS pred_label, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn
  FROM dists)
SELECT vec_id, true_label, pred_label, round(d2, 6) AS d2,
       CAST(pred_label = true_label AS BOOLEAN) AS correct
FROM best WHERE rn = 1
"""


@query("similarity_centroid_classifier", oracle=_NC_ORACLE)
def similarity_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification: fit one centroid per
    label over the full labeled corpus, assign each probe to the closest
    — the parametric counterpart of `similarity_knn_label` (model size =
    labels × dim regardless of corpus size, which is why prototype
    classifiers are the cheap first pass before kNN at scale).

    Fit is aggregation, not collection: explode to (label, dim) cells,
    decimal-sum (order-free), ONE shuffle keyed by labels×dim — the
    model stays a DataFrame end to end, no driver round-trip.  Scoring
    joins each probe against the labels-sized centroid relation (no
    broadcast hint — it is model-sized but not provably bounded, AQE
    broadcasts at runtime) and folds the squared distance sequentially
    in-row, the same fold order as DuckDB's list_sum, so distances are
    bit-identical and the argmin (tiebreak: label asc) agrees exactly."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    ex = emb.select(
        "label", F.posexplode("vec").alias("i0", "x")
    ).select("label", (F.col("i0") + 1).alias("i"), "x")
    cent = ex.groupBy("label", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    carr = (
        cent.groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("i", "c"))
                ),
                lambda s: s["c"],
            ).alias("cvec")
        )
    )
    probes = emb.filter(F.pmod("vec_id", F.lit(KNN_QMOD)) == KNN_QREM).select(
        "vec_id", F.col("label").alias("true_label"), "vec"
    )
    d2 = F.aggregate(
        F.zip_with("vec", "cvec", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dists = probes.crossJoin(carr).select(
        "vec_id", "true_label", "c_label", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_label"))
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "true_label",
            F.col("c_label").alias("pred_label"),
            F.round("d2", 6).alias("d2"),
            (F.col("c_label") == F.col("true_label")).alias("correct"),
        )
    )


# --------------------------------------------------------------------------
# MMR diversified top-k (maximal marginal relevance re-ranking)
# --------------------------------------------------------------------------
MMR_M = 10  # relevance-ranked candidate pool per query
MMR_K = 5  # diversified selections per query
MMR_LAM = 0.7  # relevance weight; (1-λ) penalizes similarity to selected


def _mmr_oracle() -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(c.uvec)),"
        " i -> c.uvec[i] * s.uvec[i]))"
    )
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec"
        " FROM embeddings)",
        "n AS (SELECT vec_id, vec,"
        " sqrt(list_sum(list_transform(generate_series(1, len(vec)),"
        " i -> vec[i] * vec[i]))) AS norm FROM v)",
        "u AS (SELECT vec_id, list_transform(vec, x -> x / norm) AS uvec"
        " FROM n)",
        f"""pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cid, c.uvec,
         list_sum(list_transform(generate_series(1, len(q.uvec)),
                  i -> q.uvec[i] * c.uvec[i])) AS rel
  FROM u q JOIN u c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES})""",
        f"""cand AS (
  SELECT query_id, cid, uvec, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cid) AS rn
    FROM pairs) WHERE rn <= {MMR_M})""",
        """sel1 AS (
  SELECT query_id, cid, uvec, rel, 1 AS pick FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cid) AS rn
    FROM cand) WHERE rn = 1)""",
    ]
    prev = "sel1"
    for r in range(2, MMR_K + 1):
        ctes.append(
            f"""pen{r} AS (
  SELECT c.query_id, c.cid, c.uvec, c.rel, max({dot}) AS maxsim
  FROM cand c JOIN {prev} s ON s.query_id = c.query_id
  WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                    WHERE x.query_id = c.query_id AND x.cid = c.cid)
  GROUP BY c.query_id, c.cid, c.uvec, c.rel),
pick{r} AS (
  SELECT query_id, cid, uvec, rel, {r} AS pick FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY {MMR_LAM} * rel - {1 - MMR_LAM} * maxsim DESC, cid) AS rn
    FROM pen{r}) WHERE rn = 1),
sel{r} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{r})"""
        )
        prev = f"sel{r}"
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT query_id, CAST(pick AS INT) AS rank, cid,"
        f" round(rel, 6) AS rel FROM {prev}"
    )


@query("similarity_mmr_topk", oracle=_mmr_oracle())
def similarity_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: from each query's top-MMR_M
    cosine candidates, greedily select MMR_K results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-selected — the
    diversity pass a RAG retriever runs so five results aren't five
    near-duplicates (the un-diversified twin is `similarity_cosine_topk`;
    combined with the dedup family this is retrieve → diversify).

    Two-stage by design: the CORPUS-scale stage (exact top-MMR_M
    relevance per query) is fully distributed; the greedy re-rank then
    runs driver-side over the collected pool, which is model-OUTPUT-sized
    (N_QUERIES × MMR_M rows — the same bounded-collect class as the
    audited k-means-sample and z-order-bounds collects) and inherently
    sequential in k, so distributing it bought k job rounds and k chained
    cached plans for ~200 rows of work (the pre-r7 form).  Determinism:
    unit vectors divide by the same norm on both engines, every dot is
    the same sequential IEEE fold (JVM aggregate = Python left fold =
    DuckDB list_sum), the score is one fixed λ-chain, and every argmax
    tiebreaks on candidate id — so the oracle's unrolled CTE chain picks
    the identical set in the identical order."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    nu = with_norm(emb).select(
        "vec_id",
        F.transform("vec", lambda x: x / F.col("norm")).alias("uvec"),
    )
    qry = nu.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("uvec").alias("quvec")
    )
    pairs = (
        nu.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cid"),
            "uvec",
            _dot("quvec", "uvec").alias("rel"),
        )
    )
    wrel = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cid"))
    cand = (
        pairs.withColumn("rn", F.row_number().over(wrel))
        .filter(F.col("rn") <= MMR_M)
        .drop("rn")
    )
    # Collect the pool and run the greedy driver-side.  The pool is
    # MODEL-OUTPUT-sized — N_QUERIES × MMR_M rows (200 here), the same
    # bounded-collect class as the audited k-means-sample / z-order-bounds
    # collects — and the greedy is inherently sequential in k: expressing
    # it as k relational rounds (the pre-r7 form) chained k persisted
    # frames whose nested cached plans blew up plan inspection
    # quadratically and paid k job rounds for ~200 rows of work.  The
    # corpus-scale stage (top-M per query) stays fully distributed above.
    # Float parity with the oracle's unrolled CTEs is preserved because
    # `rel` and the unit vectors are computed BEFORE the collect (same JVM
    # folds as always), and the driver-side dot is the identical
    # sequential IEEE fold (x*y accumulated left-to-right = `_dot` =
    # DuckDB list_sum); the score chain uses the same Python double
    # constants Spark's F.lit would embed.
    pool: dict[int, list] = {}
    for row in cand.collect():
        pool.setdefault(row.query_id, []).append(
            (row.cid, row.rel, list(row.uvec))
        )

    def ddot(u: list, v: list) -> float:
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    out_rows = []
    lam, one_m_lam = MMR_LAM, 1 - MMR_LAM
    for qid in sorted(pool):
        cands = sorted(pool[qid])  # by cid — the tiebreak order
        selected: list[tuple[int, float, list]] = []
        first = max(cands, key=lambda c: (c[1], -c[0]))
        selected.append(first)
        out_rows.append((qid, 1, first[0], first[1]))
        for r in range(2, MMR_K + 1):
            remaining = [c for c in cands if all(c[0] != s[0] for s in selected)]
            if not remaining:
                break
            best = max(
                remaining,
                key=lambda c: (
                    lam * c[1]
                    - one_m_lam * max(ddot(c[2], s[2]) for s in selected),
                    -c[0],
                ),
            )
            selected.append(best)
            out_rows.append((qid, r, best[0], best[1]))
    res = spark.createDataFrame(
        out_rows, "query_id long, rank int, cid long, rel double"
    )
    return res.select("query_id", "rank", "cid", F.round("rel", 6).alias("rel"))


# --------------------------------------------------------------------------
# ANN recall evaluation (LSH vs exact ground truth, as a first-class query)
# --------------------------------------------------------------------------
_RECALL_ORACLE = f"""
WITH exact AS ({_COSINE_ORACLE}),
ann AS ({_ANN_LSH_ORACLE})
SELECT e.query_id,
       CAST(count(a.neighbor_id) AS INT) AS hits,
       round(CAST(count(a.neighbor_id) AS DOUBLE) / {TOP_K}, 6) AS recall
FROM exact e
LEFT JOIN ann a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@query("similarity_ann_recall_eval", oracle=_RECALL_ORACLE)
def similarity_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} of the hyperplane-LSH ANN against exact cosine ground
    truth, per query — the ANN quality dashboard as a first-class QUERY
    (the pytest suite pins an aggregate recall floor; this emits the
    per-query numbers an index operator actually monitors, and is itself
    oracle-paired because BOTH sides are).

    Built by COMPOSITION: the registered exact and ANN queries run
    unchanged and join on (query, neighbor) — queries-× -k-sized inputs,
    so the eval adds two bounded relations and one tiny join to whatever
    the underlying operators cost.  The oracle composes the same two
    registered oracle texts as CTEs, so eval can never drift from the
    operators it evaluates."""
    exact = similarity_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = similarity_ann_lsh(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ann_id")
    )
    return (
        exact.join(
            ann,
            (exact.query_id == ann.query_id)
            & (exact.neighbor_id == ann.ann_id),
            "left",
        )
        .drop(ann.query_id)
        .groupBy("query_id")
        .agg(
            F.count("ann_id").cast("int").alias("hits"),
            F.round(F.count("ann_id").cast("double") / TOP_K, 6).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# Range search (all neighbors above a similarity threshold — no k)
# --------------------------------------------------------------------------
RANGE_SIM_T = 0.3

_RANGE_ORACLE = f"""
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
  WHERE q.vec_id < {N_QUERIES})
SELECT query_id, neighbor_id, round(sim, 6) AS sim
FROM pairs WHERE sim >= {RANGE_SIM_T}
"""


@query("similarity_range_search", oracle=_RANGE_ORACLE)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: EVERY neighbor with cosine ≥ {RANGE_SIM_T} per query —
    the other first-class vector-index contract next to top-k (FAISS
    `range_search` / Milvus radius query): dedup and recall-sensitive
    retrieval want "all sufficiently similar", not "the best k", and the
    result size is data-dependent by design.

    Plan: identical broadcast-query-set scan as `similarity_cosine_topk`
    but with NO window at all — the threshold is a plain filter inside the
    scan's codegen, so range search is strictly cheaper than top-k (no
    rank shuffle; the output is the only thing that grows).  At scale the
    LSH/IVF candidate generators compose in front of this filter exactly
    as they do for top-k.  Same sequential-fold dots → bit-identical
    sims."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    sim = _dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))
    return (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("sim_raw"),
        )
        .filter(F.col("sim_raw") >= RANGE_SIM_T)
        .select("query_id", "neighbor_id", F.round("sim_raw", 6).alias("sim"))
    )


# --------------------------------------------------------------------------
# Cluster diagnostics over the shared IVF index
# --------------------------------------------------------------------------
def _cluster_stats_oracle() -> str:
    k, iters, dim = IVF_CLUSTERS, IVF_ITERS, _VEC_DIM
    cf = f"c{iters}"
    return f"""{_sql_km_setup()}{_sql_ivf_fit_ctes(k, iters, dim)},
assignq AS (
  SELECT q0.vec_id, c.cid,
         {_sql_d2_int('q0.qv', 'c.cv', dim)} AS d2,
         row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_sql_d2_int('q0.qv', 'c.cv', dim)}, c.cid) AS rn
  FROM q0 CROSS JOIN {cf} c),
a AS (SELECT vec_id, cid, d2 FROM assignq WHERE rn = 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM a)
SELECT a.cid AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(a.d2) AS BIGINT) AS inertia,
       CAST(min(a.d2) AS BIGINT) AS min_d2,
       CAST(max(a.d2) AS BIGINT) AS max_d2,
       CAST((count(*) * 1000000) // t.n_total AS BIGINT) AS share_micro
FROM a CROSS JOIN tot t
GROUP BY a.cid, t.n_total
"""


@query("similarity_cluster_stats", oracle=_cluster_stats_oracle())
def similarity_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-health diagnostics for the shared IVF coarse quantizer:
    per-cluster population, exact integer inertia (sum of scale-6 squared
    distances to the assigned centroid), distance extrema, and corpus
    share — the balance report consulted before trusting nprobe recall
    (one mega-cluster means probing is near-exhaustive; empty lists mean
    wasted k).

    Reuses the engine-exact integer k-means (`ivf_index`, same cache the
    search queries hit) and the same argmin tie rule (smaller cid), so
    DuckDB refits identical centroids and replays assignment — the whole
    report is hash-checked.  Scale: one narrow assignment pass (zero
    shuffle — centroids are a broadcast literal), then a k-row rollup
    with map-side combine; the scalar total joins back as a 1-row
    broadcast."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    centroids = ivf_index(emb, cache_key=sf_dir)
    best = F.array_min(_d2_structs_int(_qint("vec"), centroids))
    a = emb.select(
        best["cluster_id"].alias("cluster_id"), best["d2"].alias("d2")
    )
    tot = a.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        a.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("d2").alias("inertia"),
            F.min("d2").alias("min_d2"),
            F.max("d2").alias("max_d2"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_id",
            "n_vectors",
            "inertia",
            "min_d2",
            "max_d2",
            F.expr("(n_vectors * 1000000) div n_total").alias("share_micro"),
        )
    )


# --------------------------------------------------------------------------
# Cluster separation (Dunn-flavor index over the IVF index)
# --------------------------------------------------------------------------
def _cluster_sep_oracle() -> str:
    k, iters, dim = IVF_CLUSTERS, IVF_ITERS, _VEC_DIM
    cf = f"c{iters}"
    return f"""{_sql_km_setup()}{_sql_ivf_fit_ctes(k, iters, dim)},
assignq AS (
  SELECT q0.vec_id, c.cid,
         {_sql_d2_int('q0.qv', 'c.cv', dim)} AS d2,
         row_number() OVER (PARTITION BY q0.vec_id
             ORDER BY {_sql_d2_int('q0.qv', 'c.cv', dim)}, c.cid) AS rn
  FROM q0 CROSS JOIN {cf} c),
a AS (SELECT vec_id, cid, d2 FROM assignq WHERE rn = 1),
intra AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(d2) AS BIGINT) AS inertia
  FROM a GROUP BY cid),
inter AS (
  SELECT p.cid, CAST(min({_sql_d2_int('p.cv', 'q.cv', dim)}) AS BIGINT)
           AS min_inter_centroid_d2
  FROM {cf} p JOIN {cf} q ON p.cid <> q.cid GROUP BY p.cid)
SELECT i.cid AS cluster_id, i.n_vectors,
       CAST(i.inertia // i.n_vectors AS BIGINT) AS avg_intra_d2,
       e.min_inter_centroid_d2,
       CAST((e.min_inter_centroid_d2 * 1000000)
            // greatest(i.inertia // i.n_vectors, 1) AS BIGINT)
         AS separation_micro
FROM intra i JOIN inter e ON e.cid = i.cid
"""


@query("similarity_cluster_separation", oracle=_cluster_sep_oracle())
def similarity_cluster_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn-flavor separation index per IVF cluster: nearest other
    centroid distance over mean within-cluster distance (both in exact
    scale-6 integer d² units) — separation ≫ 1e6 means tight, distant
    clusters (nprobe=1 would already recall well); separation ≲ 1e6
    means overlapping lists, so raise nprobe.  The tuning companion to
    `similarity_cluster_stats`' balance report and
    `similarity_ann_recall_eval`'s measured recall.

    The k² centroid-pair minima are model-sized and computed driver-side
    from the shared integer centroids, attached as a literal map — the
    corpus-side work is the same single narrow assignment pass as the
    other IVF queries, one k-row rollup, zero extra shuffles.  All
    arithmetic is integer (micro-unit ratio via one `div`), so DuckDB
    refits and replays bit-exactly."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    centroids = ivf_index(emb, cache_key=sf_dir)
    min_inter = {
        cid: min(
            sum((x - y) * (x - y) for x, y in zip(vec, ovec))
            for ocid, ovec in centroids
            if ocid != cid
        )
        for cid, vec in centroids
    }
    best = F.array_min(_d2_structs_int(_qint("vec"), centroids))
    a = emb.select(
        best["cluster_id"].alias("cluster_id"), best["d2"].alias("d2")
    )
    intra = a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("d2").alias("inertia"),
    )
    inter_map = F.create_map(
        *[
            F.lit(x)
            for cid in sorted(min_inter)
            for x in (cid, min_inter[cid])
        ]
    )
    return intra.select(
        "cluster_id",
        "n_vectors",
        F.expr("inertia div n_vectors").alias("avg_intra_d2"),
        inter_map[F.col("cluster_id")].cast("long").alias(
            "min_inter_centroid_d2"
        ),
    ).select(
        "cluster_id",
        "n_vectors",
        "avg_intra_d2",
        "min_inter_centroid_d2",
        F.expr(
            "(min_inter_centroid_d2 * 1000000) div greatest(avg_intra_d2, 1)"
        ).alias("separation_micro"),
    )


# --------------------------------------------------------------------------
# Triplet mining: hardest positive / hardest negative per anchor
# --------------------------------------------------------------------------
_TRIPLET_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (
  SELECT vec_id, label, vec,
         sqrt(list_sum(list_transform(generate_series(1, len(vec)),
                                      i -> vec[i] * vec[i]))) AS norm
  FROM v),
pairs AS (
  SELECT q.vec_id AS anchor_id, q.label AS label,
         c.vec_id AS cand_id, c.label AS cand_label,
         list_sum(list_transform(generate_series(1, len(q.vec)),
                                 i -> q.vec[i] * c.vec[i]))
           / (q.norm * c.norm) AS sim
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
pos AS (
  SELECT anchor_id, label, cand_id AS pos_id, sim AS pos_sim
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY sim ASC, cand_id) AS rn
        FROM pairs WHERE cand_label = label) t
  WHERE rn = 1),
neg AS (
  SELECT anchor_id, cand_id AS neg_id, sim AS neg_sim
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY sim DESC, cand_id) AS rn
        FROM pairs WHERE cand_label <> label) t
  WHERE rn = 1),
semihard AS (
  SELECT p.anchor_id,
         CAST(sum(CASE WHEN pr.sim > p.pos_sim THEN 1 ELSE 0 END)
              AS BIGINT) AS semi_hard_negs
  FROM pos p JOIN pairs pr
    ON pr.anchor_id = p.anchor_id AND pr.cand_label <> p.label
  GROUP BY p.anchor_id)
SELECT p.anchor_id, p.label,
       p.pos_id, round(p.pos_sim, 6) AS pos_sim,
       g.neg_id, round(g.neg_sim, 6) AS neg_sim,
       round(g.neg_sim - p.pos_sim, 6) AS margin,
       s.semi_hard_negs
FROM pos p
JOIN neg g ON g.anchor_id = p.anchor_id
JOIN semihard s ON s.anchor_id = p.anchor_id
"""


@query("similarity_triplet_mining", oracle=_TRIPLET_ORACLE)
def similarity_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining for metric learning: for each anchor (the
    bounded vec_id < {N_QUERIES} set), the HARDEST POSITIVE (same label,
    lowest cosine — the pair the embedding currently gets most wrong),
    the HARDEST NEGATIVE (different label, highest cosine — the most
    confusable impostor), the triplet margin neg − pos (> 0 means the
    anchor violates the metric), and the count of "semi-hard" negatives
    scoring above the hardest positive (the FaceNet mining statistic
    that sizes the useful training signal).  The training-data twin of
    `similarity_knn_label` (which evaluates; this one MINES).

    Plan: identical scale posture to `similarity_cosine_topk` — the
    bounded anchor set broadcasts against the corpus stream (premise:
    anchors are a model-parameter-sized probe set), per-anchor selection
    is a window over the anchor-partitioned score stream with
    deterministic (sim, id) tie-breaks, and the semi-hard count is one
    conditional aggregate against the broadcast 20-row hardest-positive
    relation.  Sims fold sequentially over the same double arrays on
    both engines → bit-identical before the single rounding."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    cand = with_norm(emb)
    qry = with_norm(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("a_label").alias("label"),
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            (_dot("qvec", "vec") / (F.col("qnorm") * F.col("norm"))).alias("sim"),
        )
        .transform(persist_tracked)
    )
    wpos = Window.partitionBy("anchor_id").orderBy(F.asc("sim"), F.asc("cand_id"))
    pos = (
        pairs.filter(F.col("cand_label") == F.col("label"))
        .withColumn("rn", F.row_number().over(wpos))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "label",
            F.col("cand_id").alias("pos_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    wneg = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    neg = (
        pairs.filter(F.col("cand_label") != F.col("label"))
        .withColumn("rn", F.row_number().over(wneg))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("neg_id"),
            F.col("sim").alias("neg_sim"),
        )
    )
    semi = (
        pairs.filter(F.col("cand_label") != F.col("label"))
        .join(
            F.broadcast(pos.select("anchor_id", "pos_sim")),
            "anchor_id",
        )
        .groupBy("anchor_id")
        .agg(
            F.sum(F.when(F.col("sim") > F.col("pos_sim"), 1).otherwise(0))
            .cast("long")
            .alias("semi_hard_negs")
        )
    )
    return (
        pos.join(neg, "anchor_id")
        .join(semi, "anchor_id")
        .select(
            "anchor_id",
            "label",
            "pos_id",
            F.round("pos_sim", 6).alias("pos_sim"),
            "neg_id",
            F.round("neg_sim", 6).alias("neg_sim"),
            F.round(F.col("neg_sim") - F.col("pos_sim"), 6).alias("margin"),
            "semi_hard_negs",
        )
    )


# --------------------------------------------------------------------------
# Centroid drift: per-label embedding distribution shift between halves
# --------------------------------------------------------------------------
_DRIFT_ORACLE = """
WITH v AS (
  SELECT vec_id, label, vec_id % 2 AS half,
         CAST(embedding AS DOUBLE[]) AS vec
  FROM embeddings),
dims AS (
  SELECT label, half, t.i AS dim,
         CAST(sum(CAST(round(vec[t.i] * 1000000, 0) AS BIGINT)) AS BIGINT)
           AS s_micro
  FROM v, unnest(generate_series(1, len(vec))) AS t(i)
  GROUP BY label, half, t.i),
counts AS (
  SELECT label,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM v GROUP BY label),
paired AS (
  SELECT a.label,
         CAST(sum(CAST(a.s_micro AS HUGEINT) * b.s_micro) AS HUGEINT) AS dot,
         CAST(sum(CAST(a.s_micro AS HUGEINT) * a.s_micro) AS HUGEINT) AS na2,
         CAST(sum(CAST(b.s_micro AS HUGEINT) * b.s_micro) AS HUGEINT) AS nb2
  FROM dims a JOIN dims b
    ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
  GROUP BY a.label)
SELECT p.label, c.n_a, c.n_b,
       round(CAST(p.dot AS DOUBLE)
             / (sqrt(CAST(p.na2 AS DOUBLE)) * sqrt(CAST(p.nb2 AS DOUBLE))),
             6) AS centroid_cosine
FROM paired p JOIN counts c ON c.label = p.label
"""


@query("similarity_centroid_drift", oracle=_DRIFT_ORACLE)
def similarity_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the cosine between
    the class centroid computed from the even-id half and the odd-id half
    of the corpus — cosine ≈ 1 means the two halves agree on where the
    class lives; a low value flags dataset shift / bad shards before a
    model trains on them.  The embedding-space twin of
    `pipeline_drift_monitor`.

    Exactness: cosine is SCALE-INVARIANT, so centroids are never divided
    by n — the per-dim decimal sums quantize once to integer micro-units
    and all three inner products accumulate in 128-bit integer space
    (integer addition commutes → order-free), with one double chain at
    the end.  Scale: one posexplode pass folds (label, half, dim) partial
    sums map-side (|labels|·2·64 groups); everything after is
    model-dimension-sized."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    dims = (
        emb.select("label", "half", F.posexplode("vec").alias("dim", "val"))
        .groupBy("label", "half", "dim")
        .agg(
            F.sum(F.round(F.col("val") * 1000000, 0).cast("long"))
            .cast("long")
            .alias("s_micro")
        )
    )
    counts = emb.groupBy("label").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    D38 = "decimal(38,0)"
    a = dims.filter(F.col("half") == 0).select(
        "label", "dim", F.col("s_micro").alias("sa")
    )
    b = dims.filter(F.col("half") == 1).select(
        "label", "dim", F.col("s_micro").alias("sb")
    )
    paired = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa").cast(D38) * F.col("sb").cast(D38)).cast(D38).alias("dot"),
            F.sum(F.col("sa").cast(D38) * F.col("sa").cast(D38)).cast(D38).alias("na2"),
            F.sum(F.col("sb").cast(D38) * F.col("sb").cast(D38)).cast(D38).alias("nb2"),
        )
    )
    return paired.join(counts, "label").select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
            6,
        ).alias("centroid_cosine"),
    )
