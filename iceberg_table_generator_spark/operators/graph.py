"""Graph analytics over the event stream (SURVEY.md §2.8 extension).

The reference generates tables and has no graph surface at all
(`Main.java:475-603` is row generation); large-scale training pipelines,
however, routinely rank a domain/link graph (e.g. quality-weighting crawl
sources by PageRank, as in Common Crawl curation) — an ITERATIVE
fixed-point computation, the one plan shape the rest of the repo's
single-pass queries don't cover.

Engine-exactness: like the integer k-means that oracle-paired IVF/PQ,
PageRank here runs in pure 64-bit integer arithmetic — ranks live in
micro-units (SCALE = 1e12 per node of initial mass) and every iteration
uses only multiplication and integer division in a fixed, fully
parenthesized order, so Spark and DuckDB produce bit-identical ranks and
the oracle can replay the loop as an unrolled CTE chain.  No floats, no
transcendentals, no sum-order sensitivity (integer addition commutes
exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from iceberg_table_generator_spark.functions.cache import persist_tracked
from iceberg_table_generator_spark.functions.json import props_k
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table

PR_SCALE = 1_000_000_000_000  # 1e12 micro-units of rank mass per node
PR_ITERS = 5  # fixed iteration count (recomputable by the oracle)
PR_BASE = 15 * PR_SCALE // 100  # (1 - damping) * SCALE, damping = 0.85

#: Loud bound for the model-sized driver folds (r15, ADVICE #1): the
#: datagen page domain `props.k` is ~100 ids at EVERY scale factor — a
#: model constant, never corpus-correlated.  Every fold that collects the
#: |V|²-bounded edge relation guards |V| itself and raises instead of
#: silently folding a corpus-sized graph on the driver.  4096 is ~40× the
#: model bound: far above datagen drift, far below driver danger (the
#: collected relation is ≤ |V|² + |V| ≈ 17M narrow rows at the bound,
#: well inside the 24g driver heap).
GRAPH_FOLD_MAX_NODES = 4096


def guard_model_nodes(n_nodes: int, query: str) -> None:
    """Raise loudly when the driver-fold premise (a model-sized node
    domain) is violated.  A graph whose |V| exceeds the bound needs the
    distributed fixed-point back — see each fold's docstring — not a
    bigger driver; the guard turns a silent corpus-sized fold into an
    immediate, named error."""
    if n_nodes > GRAPH_FOLD_MAX_NODES:
        raise ValueError(
            f"{query}: |V|={n_nodes} exceeds GRAPH_FOLD_MAX_NODES="
            f"{GRAPH_FOLD_MAX_NODES} — the model-sized driver-fold premise "
            "is violated; restore the distributed iteration for this "
            "operator instead of raising the bound."
        )


def collect_transition_model(
    spark: SparkSession, sf_dir: str, query: str
) -> tuple[list[tuple], list]:
    """ONE distributed pass collecting the transition-graph model:
    events scan → per-user LEAD window → ``groupBy(src, dst)`` count with
    the NULL-dst groups KEPT.  Returns ``(trans, node_list)`` where
    ``trans`` is the weighted transition list ``[(src, dst, cnt), ...]``
    (dst IS NOT NULL rows only) and ``node_list`` is the distinct page
    domain.

    The node domain comes for FREE from the same aggregation: every event
    row contributes its own ``k`` as ``src`` (the last event per user has
    a NULL dst but still emits a row), so ``distinct src`` over the
    unfiltered window output ≡ ``distinct k`` over events.  The r14 shape
    ran a SECOND corpus pass (scan + distinct) just for the node set —
    measured 0.57 s of each fold query's ~1.4 s at sf0.1.

    |V| is loud-guarded immediately after materialization, before any
    fold work.  The collected relation itself is ≤ |V|² + |V| rows by the
    aggregation, so the guard bound also caps what the collect can pull;
    a pre-collect node-count job would reintroduce the second corpus pass
    this helper exists to remove."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    rows = (
        seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    node_set = {r.src for r in rows}
    guard_model_nodes(len(node_set), query)
    trans = [(r.src, r.dst, r.cnt) for r in rows if r.dst is not None]
    node_list = sorted(node_set, key=lambda n: (n is None, n))
    return trans, node_list


def _round6_half_up(x: float) -> float:
    """Replay Spark's `round(double, 6)` exactly: BigDecimal.valueOf uses
    the double's shortest decimal representation (Python `repr` produces
    the same digits), then HALF_UP at scale 6."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _pagerank_oracle() -> str:
    """Unrolled DuckDB twin of the Spark iteration (identical integer ops)."""
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
        f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"r{i} AS (SELECT n.node, CAST({PR_BASE} + COALESCE(CAST(sum("
            f"(((85 * p.r) // 100) * p.cnt) // p.outw) AS BIGINT), 0)"
            f" AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN"
            f" (SELECT er.dst, er.cnt, er.outw, rp.r"
            f"  FROM er JOIN r{i - 1} rp ON er.src = rp.node) p"
            f" ON p.dst = n.node GROUP BY n.node)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.node, COALESCE(o.outw, 0) AS out_visits, r.r AS rank_micro
FROM nodes n
JOIN r{PR_ITERS} r ON r.node = n.node
LEFT JOIN outw o ON o.src = n.node
"""


@query("events_pagerank", oracle=_pagerank_oracle())
def events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {PR_ITERS} fixed iterations) over the
    per-user transition graph: nodes are the ~100 `props.k` page ids,
    edges are consecutive (by ts) visits within one user's stream,
    weighted by transition count.  Dangling nodes (no out-edges) simply
    retain only the teleport term — their damped mass is dropped, the
    same deterministic convention both engines apply.

    Scale design: edge extraction is a per-user window (partitioned by
    user_id — millions of parallel partitions) followed by ONE
    aggregation down to the edge relation, which is |V|²-bounded and
    *visit-count*-independent: at 100 TB of events the edge list for the
    ~100-page domain graph is a model constant, never corpus-sized.  The
    fixed-point itself folds driver-side over that collected model (the
    events_katz_centrality policy) — on a 10M-node DOMAIN graph the
    distributed join+aggregate iteration comes back; here it was ~100
    scheduler stages over ≤100-row relations at any SF.  The iteration
    count is fixed rather than convergence-tested so the oracle can
    replay it; the CC operator (`dedup.py`) shows the loud-guard
    convergence alternative."""
    # r14 model-sized driver fold (the events_katz_centrality policy); r15
    # fuses the two model collects into ONE distributed pass
    # (`collect_transition_model`: the node domain is derivable from the
    # same (src, dst) aggregation when the NULL-dst groups are kept) and
    # loud-guards |V| before folding.  The {PR_ITERS}-step fixed-point
    # folds driver-side over the collected ≤|V|² model (|V| ≤ 100 page
    # ids at every SF).  The r13/early-r14 shape ran the fold as chained
    # join+aggregate rounds — ~109 Exchange of scheduler overhead on
    # ≤100-row relations at ANY scale factor.  The oracle's `er` CTE
    # drops NULL-src rows via the outw equi-join and NULL-dst rows via
    # the WHERE — both replicated below; outw is the exact integer sum of
    # each src's transition counts, identical to the dropped Spark-side
    # groupBy+join.
    trans, node_list = collect_transition_model(
        spark, sf_dir, "events_pagerank"
    )
    outw_map: dict[int, int] = {}
    for s, _t, c in trans:
        if s is not None:
            outw_map[s] = outw_map.get(s, 0) + c
    er = [
        (s, t, c, outw_map[s]) for s, t, c in trans if s is not None
    ]
    # Overflow loud-guard (r7 advice): Python ints are exact, but the
    # declared BIGINT output and the oracle's unrolled CTE chain are
    # int64 — keep the identical loud bound so a divergence between the
    # engines can never hide behind a silent wrap.  r is bounded by the
    # conserved total mass |V|*PR_SCALE.
    n_nodes, max_cnt = len(node_list), max((c for _s, _t, c, _o in er), default=0)
    if (85 * n_nodes * PR_SCALE // 100) * max_cnt >= 2**63:
        raise OverflowError(
            f"events_pagerank: int64 overflow risk — |V|={n_nodes}, "
            f"max transition count={max_cnt}; raise PR_SCALE granularity "
            "down or pre-normalize cnt/outw before scaling up."
        )
    # The exact oracle arithmetic, replayed on Python ints (`div` and `//`
    # agree on the non-negative domain): r0 = SCALE everywhere; each round
    # r_i(n) = BASE + Σ_{(s,n)∈E} ((85·r_{i-1}(s)) // 100 · cnt) // outw.
    r = {n: PR_SCALE for n in node_list}
    for _ in range(PR_ITERS):
        inc: dict[int, int] = {}
        for s, t, cnt, ow in er:
            inc[t] = inc.get(t, 0) + ((85 * r[s]) // 100 * cnt) // ow
        r = {n: PR_BASE + inc.get(n, 0) for n in node_list}
    out_visits: dict[int, int] = {}
    for s, _t, cnt, _ow in er:
        out_visits[s] = out_visits.get(s, 0) + cnt
    # The oracle's final INNER join on node drops a NULL node (missing
    # props.k) on both engines — replicate by skipping None.
    rows = [
        (n, out_visits.get(n, 0), r[n]) for n in node_list if n is not None
    ]
    return spark.createDataFrame(
        rows, schema="node int, out_visits bigint, rank_micro bigint"
    )


# --------------------------------------------------------------------------
# Triangle counting over the transition graph (degree-ordered)
# --------------------------------------------------------------------------
_TRIANGLE_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
dir AS (
  -- orient every edge from the lower-(degree, id) endpoint to the higher
  SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS a,
         CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS b
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM dir e1
  JOIN dir e2 ON e2.a = e1.b
  JOIN dir e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT n.node, COALESCE(d.degree, 0) AS degree,
       COALESCE(p.n_triangles, 0) AS n_triangles
FROM (SELECT DISTINCT k AS node FROM ev) n
LEFT JOIN deg d ON d.node = n.node
LEFT JOIN per_node p ON p.node = n.node
"""


@query("events_triangle_count", oracle=_TRIANGLE_ORACLE)
def events_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected page-transition graph —
    the clustering/cohesion motif metric (community density, spam-farm
    detection) that complements PageRank's centrality on the same graph.

    The corpus-sized work (window pass + distinct) reduces to the
    |V|²-bounded undirected edge relation distributed; the triangle
    enumeration itself folds driver-side over that collected ≤100-node
    model (r14 — see the in-body note).  At a TRUE large-graph scale the
    distributed answer is degree-ordered counting (orient each edge
    low→high (degree, id), 3-way self-join — out-degrees bound by
    O(sqrt|E|) so hot vertices never fan out), which is what the r13
    implementation exercised; on the fixed ≤100-page domain those 3
    joins are pure scheduler overhead.  Pure integer counts — bit-exact
    on both engines."""
    # r14: triangle enumeration folds DRIVER-SIDE over the collected
    # ≤ C(100,2) edge model (the established model-sized-fold policy, see
    # events_katz_centrality).  The triangle SET is algorithm-independent,
    # so per-node counts are identical to the r13 degree-ordered join's;
    # each triangle u<v<w is found exactly once from its (u,v) edge with
    # the common neighbor w constrained to w > v.  r15: the two model
    # collects (distinct undirected edges + distinct nodes) fuse into ONE
    # distributed pass (`collect_transition_model`), with the undirected
    # edge set derived in-driver — `least/greatest` + distinct over the
    # dst-non-null, src≠dst transitions is exactly the min/max pair set
    # (a NULL src fails `src != dst` on both engines and is dropped), and
    # |V| is loud-guarded before folding.
    trans, node_list = collect_transition_model(
        spark, sf_dir, "events_triangle_count"
    )
    edges = sorted(
        {
            (min(s, t), max(s, t))
            for s, t, _c in trans
            if s is not None and s != t
        }
    )
    deg: dict[int, int] = {}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri: dict[int, int] = {}
    for u, v in edges:
        for z in adj[u] & adj[v]:
            if z > v:  # u < v < z: each triangle counted exactly once
                for m in (u, v, z):
                    tri[m] = tri.get(m, 0) + 1
    rows = [(n, deg.get(n, 0), tri.get(n, 0)) for n in node_list]
    return spark.createDataFrame(
        rows, schema="node int, degree bigint, n_triangles bigint"
    )


# --------------------------------------------------------------------------
# Degree distribution of the undirected transition graph
# --------------------------------------------------------------------------
_DEGREE_ORACLE = """
WITH ev AS (SELECT user_id, ts, event_id,
                   CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (SELECT k AS src, lead(k) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM seq WHERE dst IS NOT NULL AND src <> dst),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
          SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        GROUP BY node)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


@query("events_degree_distribution", oracle=_DEGREE_ORACLE)
def events_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the undirected page-transition graph — the
    first diagnostic read on any graph (power-law vs uniform decides
    whether the degree-ordered triangle join and the k-core peel have
    skew to worry about), over the SAME edge relation as
    `events_triangle_count` / `events_pagerank`.

    One distinct-edge aggregation (|V|²-bounded, visit-count-independent),
    one degree count, one histogram rollup — all integer, all
    map-side-combinable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# --------------------------------------------------------------------------
# K-core decomposition (iterative peel, fixed unrolled rounds)
# --------------------------------------------------------------------------
KCORE_K = 3
KCORE_ROUNDS = 6  # fixed unroll; the Spark side loud-guards convergence


def _kcore_oracle() -> str:
    """Unrolled peel: alive{i} keeps nodes with ≥ K neighbors inside
    alive{i-1}.  Pure integer set logic — bit-exact on both engines."""
    ctes = [
        "ev AS (SELECT user_id, ts, event_id,"
        " CAST(props->>'$.k' AS INT) AS k FROM events)",
        "seq AS (SELECT k AS src, lead(k) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev)",
        "und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v"
        " FROM seq WHERE dst IS NOT NULL AND src <> dst)",
        "adj AS (SELECT u AS node, v AS nbr FROM und"
        " UNION ALL SELECT v, u FROM und)",
        "alive0 AS (SELECT DISTINCT node FROM adj)",
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"alive{i} AS (SELECT a.node FROM adj a"
            f" JOIN alive{p} s ON s.node = a.node"
            f" JOIN alive{p} t ON t.node = a.nbr"
            f" GROUP BY a.node HAVING count(*) >= {KCORE_K})"
        )
    body = ",\n".join(ctes)
    last = f"alive{KCORE_ROUNDS}"
    return f"""
WITH {body}
SELECT a.node, CAST(count(*) AS BIGINT) AS core_degree
FROM adj a
JOIN {last} s ON s.node = a.node
JOIN {last} t ON t.node = a.nbr
GROUP BY a.node
"""


@query("events_kcore_membership", oracle=_kcore_oracle())
def events_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-core of the transition graph: nodes surviving iterative
    removal of everything with fewer than K neighbors among survivors —
    the standard cohesion filter (spam/periphery pruning before
    PageRank-style quality weighting; the dense nucleus is what remains).
    Second iterative fixed-point in the graph family (PageRank's peel-off
    twin: PageRank iterates VALUES to a fixpoint, k-core iterates the
    VERTEX SET).

    The edge EXTRACTION is distributed (the same one-pass LEAD +
    distinct as the rest of the family); the peel itself runs
    DRIVER-side over the collected distinct-edge relation — the MMR
    precedent: the relation is |V|²-bounded and visit-count-independent
    (a model-sized set, NOT corpus-sized), and running the bounded
    sequential fixpoint in plain Python costs one Spark job instead of
    3 shuffle stages × KCORE_ROUNDS (measured 13.5 s -> ~2 s at
    sf0.001 for identical output).  Runs exactly KCORE_ROUNDS rounds
    (matching the oracle's unrolled CTEs) and LOUD-GUARDS convergence:
    if round R+1 would still remove nodes, raise rather than return a
    non-fixpoint — the `dedup_connected_components` contract."""
    from collections import defaultdict

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    edges = [(r.u, r.v) for r in und.collect()]  # |V|²-bounded model relation
    nbrs: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    guard_model_nodes(len(nbrs), "events_kcore_membership")
    alive = set(nbrs)
    for _ in range(KCORE_ROUNDS):
        alive = {
            n for n in alive if len(nbrs[n] & alive) >= KCORE_K
        }
    converged = {n for n in alive if len(nbrs[n] & alive) >= KCORE_K}
    if converged != alive:
        raise RuntimeError(
            f"k-core did not converge in {KCORE_ROUNDS} rounds "
            f"({len(alive)} -> {len(converged)}); raise KCORE_ROUNDS "
            f"(oracle unrolls the same count)"
        )
    rows = sorted(
        (n, len(nbrs[n] & alive)) for n in alive
    )
    return spark.createDataFrame(
        [(int(n), int(d)) for n, d in rows], "node int, core_degree bigint"
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (fixed unrolled iterations, integer micro-units)
# --------------------------------------------------------------------------
HITS_SCALE = 1_000_000_000_000  # 1e12 micro-units of total score mass
HITS_ITERS = 4  # fixed unroll; the oracle replays the same count


def _hits_oracle() -> str:
    """Unrolled DuckDB twin of the driver-side integer HITS loop.

    Each half-iteration is one weighted-edge join + aggregate followed by
    a sum-normalization:  x' = x // greatest(1, S // SCALE)  where S is
    the pre-normalization total — the same truncating-div form the Python
    loop uses (both floor on non-negatives), so scores are bit-identical.
    """
    ctes = [
        "ev AS (SELECT user_id, ts, event_id,"
        " CAST(props->>'$.k' AS INT) AS k FROM events)",
        "seq AS (SELECT k AS src, lead(k) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev)",
        "edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt"
        " FROM seq WHERE dst IS NOT NULL GROUP BY src, dst)",
        "nodes AS (SELECT DISTINCT k AS node FROM ev)",
        f"h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, HITS_ITERS + 1):
        p = i - 1
        ctes.append(
            f"a{i}_raw AS (SELECT n.node,"
            f" COALESCE(CAST(sum(p.cnt * p.h) AS BIGINT), 0) AS a"
            f" FROM nodes n LEFT JOIN"
            f" (SELECT e.dst, e.cnt, hp.h"
            f"  FROM edges e JOIN h{p} hp ON e.src = hp.node) p"
            f" ON p.dst = n.node GROUP BY n.node)"
        )
        ctes.append(
            # window total (one CTE reference) — a scalar subquery would
            # reference a{i}_raw twice and DuckDB's CTE inlining would
            # duplicate the whole upstream chain per iteration (2^N blowup)
            f"a{i} AS (SELECT node, a // greatest(1,"
            f" CAST(sum(a) OVER () AS BIGINT)"
            f" // {HITS_SCALE}) AS a FROM a{i}_raw)"
        )
        ctes.append(
            f"h{i}_raw AS (SELECT n.node,"
            f" COALESCE(CAST(sum(p.cnt * p.a) AS BIGINT), 0) AS h"
            f" FROM nodes n LEFT JOIN"
            f" (SELECT e.src, e.cnt, ap.a"
            f"  FROM edges e JOIN a{i} ap ON e.dst = ap.node) p"
            f" ON p.src = n.node GROUP BY n.node)"
        )
        ctes.append(
            f"h{i} AS (SELECT node, h // greatest(1,"
            f" CAST(sum(h) OVER () AS BIGINT)"
            f" // {HITS_SCALE}) AS h FROM h{i}_raw)"
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.node, h.h AS hub_micro, a.a AS auth_micro
FROM nodes n
JOIN h{HITS_ITERS} h ON h.node = n.node
JOIN a{HITS_ITERS} a ON a.node = n.node
"""


@query("events_hits_scores", oracle=_hits_oracle())
def events_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg'99) hub/authority scores over the same weighted
    page-transition graph as `events_pagerank` — the mutual-reinforcement
    twin of PageRank's random walk: a page is a good AUTHORITY if good
    hubs transition into it, a good HUB if it transitions into good
    authorities.  Curation use: hub score flags portal/index pages whose
    outlinks are quality signals; authority flags destination content.

    Arithmetic: pure 64-bit integers.  Scores live in micro-units
    (SCALE=1e12 of total mass); each half-iteration aggregates
    h·cnt over in-edges (resp. a·cnt over out-edges) and re-normalizes
    with ONE truncating division  x // max(1, S // SCALE)  so both
    engines floor identically and the oracle replays the loop as an
    unrolled CTE chain (the `events_pagerank` precedent).  L2
    normalization (the textbook form) would need a square root — the
    sum-normalization variant has the same fixpoint direction and stays
    in integers.

    Execution: the edge relation is |V|²-bounded and visit-count-
    independent, so after the ONE distributed aggregation pass the
    iteration runs DRIVER-side over the collected edges — the
    `events_kcore_membership` precedent (a model-sized relation; 8
    sequential |E|-sized sweeps in Python beat 16 shuffle stages).  A
    loud overflow guard pins the bound the oracle's BIGINT cast needs:
    sum-of-(h·cnt) <= SCALE · total_visits < 2^63."""
    # r15: both model collects (weighted edges + distinct nodes incl.
    # isolated ones) fuse into ONE distributed pass — see
    # `collect_transition_model` — with |V| loud-guarded before folding.
    erows, all_nodes = collect_transition_model(
        spark, sf_dir, "events_hits_scores"
    )
    total_cnt = sum(c for _, _, c in erows)
    if HITS_SCALE * total_cnt >= 2**63:
        raise OverflowError(
            f"events_hits_scores: int64 overflow risk — total transition "
            f"count {total_cnt}; lower HITS_SCALE or pre-aggregate counts."
        )
    h = {n: HITS_SCALE for n in all_nodes}
    a: dict[int, int] = {}
    for _ in range(HITS_ITERS):
        a = {n: 0 for n in all_nodes}
        for s, d, c in erows:
            a[d] += c * h[s]
        sa = sum(a.values())
        den = max(1, sa // HITS_SCALE)
        a = {n: v // den for n, v in a.items()}
        h = {n: 0 for n in all_nodes}
        for s, d, c in erows:
            h[s] += c * a[d]
        sh_ = sum(h.values())
        den = max(1, sh_ // HITS_SCALE)
        h = {n: v // den for n, v in h.items()}
    rows = [(int(n), int(h[n]), int(a[n])) for n in all_nodes]
    return spark.createDataFrame(
        rows, "node int, hub_micro bigint, auth_micro bigint"
    )


# --------------------------------------------------------------------------
# Directed-graph reciprocity / density summary
# --------------------------------------------------------------------------
_RECIPROCITY_ORACLE = """
WITH ev AS (SELECT user_id, ts, event_id,
                   CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (SELECT k AS src, lead(k) OVER
          (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
tr AS (SELECT src, dst FROM seq WHERE dst IS NOT NULL),
d AS (SELECT DISTINCT src, dst FROM tr WHERE src <> dst),
stats AS (
  SELECT CAST((SELECT count(DISTINCT k) FROM ev) AS BIGINT) AS n_nodes,
         CAST(count(*) AS BIGINT) AS n_dir_edges,
         CAST(count(CASE WHEN EXISTS (
             SELECT 1 FROM d r WHERE r.src = d.dst AND r.dst = d.src)
           THEN 1 END) AS BIGINT) AS n_reciprocal,
         CAST((SELECT count(*) FROM tr WHERE src = dst) AS BIGINT)
           AS n_self_loops
  FROM d)
SELECT n_nodes, n_dir_edges, n_self_loops, n_reciprocal,
       (10000 * n_reciprocal) // n_dir_edges AS recip_bp,
       (10000 * n_dir_edges) // (n_nodes * (n_nodes - 1)) AS density_bp
FROM stats
"""


@query("events_reciprocity", oracle=_RECIPROCITY_ORACLE)
def events_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row shape summary of the directed transition graph:
    reciprocity (fraction of distinct directed edges whose reverse also
    exists — navigation back-and-forth vs one-way funnels), self-loop
    volume (repeated same-page events), and edge density.  The first
    scalar diagnostic on any directed graph, complementing the
    per-node family (`events_pagerank`/`events_hits_scores`) and the
    undirected family (`events_triangle_count`).

    Scale: everything derives from the |V|²-bounded weighted transition
    relation (r15: ONE fused distributed pass, `collect_transition_model`,
    |V| loud-guarded) — the r14 shape persisted the corpus-sized
    transition stream twice and ran four separate count jobs (reversed
    semi-join, distinct-edge count, self-loop count, node count) whose
    answers are all exact-integer folds over the collected model.
    Ratios are integer basis points (one truncating div, both engines
    floor)."""
    trans, node_list = collect_transition_model(
        spark, sf_dir, "events_reciprocity"
    )
    # Distinct directed edges: dst non-null (already) and src <> dst —
    # a NULL src fails the inequality on both engines.
    pairs = {(s, t) for s, t, _c in trans if s is not None and s != t}
    n_recip = sum(1 for s, t in pairs if (t, s) in pairs)
    n_dir = len(pairs)
    n_self = sum(c for s, t, c in trans if s == t)
    # count(DISTINCT k) excludes NULL on both engines.
    n_nodes = sum(1 for n in node_list if n is not None)
    row = [
        (
            n_nodes,
            n_dir,
            n_self,
            n_recip,
            (10000 * n_recip) // n_dir if n_dir else 0,
            (10000 * n_dir) // (n_nodes * (n_nodes - 1)) if n_nodes > 1 else 0,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_nodes bigint, n_dir_edges bigint, n_self_loops bigint,"
        " n_reciprocal bigint, recip_bp bigint, density_bp bigint",
    )


# --------------------------------------------------------------------------
# Local clustering coefficient (per node, degree-ordered triangle counts)
# --------------------------------------------------------------------------
_CLUSTERING_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
dir AS (
  SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.u ELSE e.v END AS a,
         CASE WHEN (du.degree, e.u) < (dv.degree, e.v) THEN e.v ELSE e.u END AS b
  FROM und e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM dir e1
  JOIN dir e2 ON e2.a = e1.b
  JOIN dir e3 ON e3.a = e1.a AND e3.b = e2.b),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT d.node, d.degree,
       COALESCE(p.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         round(CAST(2 * COALESCE(p.n_triangles, 0) AS DOUBLE)
               / (d.degree * (d.degree - 1)), 6)
       END AS local_cc
FROM deg d
LEFT JOIN per_node p ON p.node = d.node
"""


@query("events_clustering_coefficient", oracle=_CLUSTERING_ORACLE)
def events_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — 2·T(v) / (deg(v)·(deg(v)−1)),
    the per-vertex community-density metric (how close a page's neighborhood
    is to a clique) that turns `events_triangle_count`'s raw motif counts
    into the comparable [0,1] ratio every graph-shape analysis reports.
    No reference counterpart (`Main.java` is a generator); mandated by the
    SURVEY.md §2.8 extension surface.

    Scale: identical posture to `events_triangle_count` (r14 model-sized
    driver fold over the collected |V|²-bounded edge relation); the
    coefficient is a single integer-input division rounded once (both
    engines correctly round an exact-integer quotient, so the doubles
    agree bit-for-bit)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und_df = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    # r14 model-sized driver fold (see events_triangle_count): output rows
    # are the nodes with degree ≥ 1 (the r13 deg relation), the ratio is
    # one exact-integer-input division rounded once — `_round6_half_up`
    # replays Spark's round() (BigDecimal-on-shortest-repr, HALF_UP)
    # bit-for-bit.
    edges = [(r.u, r.v) for r in und_df.collect()]
    deg: dict[int, int] = {}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    guard_model_nodes(len(adj), "events_clustering_coefficient")
    tri: dict[int, int] = {}
    for u, v in edges:
        for z in adj[u] & adj[v]:
            if z > v:
                for m in (u, v, z):
                    tri[m] = tri.get(m, 0) + 1
    rows = [
        (
            n,
            d,
            tri.get(n, 0),
            (
                _round6_half_up(2 * tri.get(n, 0) / (d * (d - 1)))
                if d >= 2
                else None
            ),
        )
        for n, d in deg.items()
    ]
    return spark.createDataFrame(
        rows,
        schema="node int, degree bigint, n_triangles bigint, local_cc double",
    )


# --------------------------------------------------------------------------
# Landmark BFS: hop distance from the hub page (truncated breadth-first)
# --------------------------------------------------------------------------
BFS_MAX_HOPS = 8


def _bfs_oracle() -> str:
    return f"""
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
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
root AS (SELECT node FROM deg ORDER BY degree DESC, node ASC LIMIT 1),
walk(node, hop) AS (
  SELECT node, 0 FROM root
  UNION
  SELECT b.dst, w.hop + 1
  FROM walk w JOIN bi b ON b.src = w.node
  WHERE w.hop < {BFS_MAX_HOPS}),
hops AS (SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM walk GROUP BY node)
SELECT n.node, h.hop
FROM (SELECT DISTINCT k AS node FROM ev) n
LEFT JOIN hops h ON h.node = n.node
"""


@query("events_bfs_hops", oracle=_bfs_oracle())
def events_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark BFS: shortest-path hop distance from the hub page (highest
    degree, min-id tiebreak) to every page of the undirected transition
    graph, truncated at {BFS_MAX_HOPS} hops — the reachability/eccentricity
    probe (how far is everything from the home page?) behind site-structure
    audits.  Unreached pages keep a NULL hop.

    Scale + exactness: the transition graph is MODEL-BOUNDED (|V|² distinct
    edges, visit-count-independent — the PageRank/k-core premise,
    `graph.py:35-68`), so per repo policy for bounded iterative relations
    the frontier loop runs DRIVER-side over one collect() of the edge set;
    the corpus-sized work (events scan → distinct edges) stays distributed.
    Hops are pure integers; the oracle replays BFS as a DuckDB recursive
    CTE (iterative working-table execution — no CTE re-inlining blowup)
    whose UNION dedups (node, hop) pairs, then takes min(hop)."""
    # r15: both model collects (undirected distinct edges + distinct
    # nodes) fuse into ONE distributed pass (`collect_transition_model`);
    # the undirected pair set is the min/max of the dst-non-null,
    # src≠dst transitions (a NULL src fails `src != dst` on both
    # engines), and |V| is loud-guarded before folding.
    trans, nodes = collect_transition_model(spark, sf_dir, "events_bfs_hops")
    edge_rows = sorted(
        {
            (min(s, t), max(s, t))
            for s, t, _c in trans
            if s is not None and s != t
        }
    )
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    degree: dict[int, int] = {n: 0 for n in nodes}
    for u, v in edge_rows:
        adj[u].add(v)
        adj[v].add(u)
        degree[u] += 1
        degree[v] += 1
    root = min(nodes, key=lambda n: (-degree[n], n))
    hop: dict[int, int] = {root: 0}
    frontier = [root]
    for h in range(1, BFS_MAX_HOPS + 1):
        nxt = [
            m
            for f in frontier
            for m in adj[f]
            if m not in hop
        ]
        frontier = sorted(set(nxt))
        for m in frontier:
            hop[m] = h
        if not frontier:
            break
    rows = [(n, hop.get(n)) for n in nodes]
    return spark.createDataFrame(rows, "node int, hop bigint")


# --------------------------------------------------------------------------
# Modularity of the site-section partition (pages grouped by k div 10)
# --------------------------------------------------------------------------
_SECTION_DIV = 10

_MODULARITY_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
sect_nodes AS (
  SELECT node // {_SECTION_DIV} AS section,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(degree) AS BIGINT) AS d_total
  FROM deg GROUP BY 1),
sect_edges AS (
  SELECT u // {_SECTION_DIV} AS section, CAST(count(*) AS BIGINT) AS e_within
  FROM und WHERE u // {_SECTION_DIV} = v // {_SECTION_DIV} GROUP BY 1)
SELECT s.section, s.n_nodes, s.d_total,
       COALESCE(e.e_within, CAST(0 AS BIGINT)) AS e_within,
       CAST(4 * m.m * COALESCE(e.e_within, 0) - s.d_total * s.d_total
            AS BIGINT) AS q_scaled,
       round(CAST(4 * m.m * COALESCE(e.e_within, 0)
                  - s.d_total * s.d_total AS DOUBLE)
             / CAST(4 * m.m * m.m AS BIGINT), 6) AS q_contrib
FROM sect_nodes s
LEFT JOIN sect_edges e ON e.section = s.section
CROSS JOIN m
"""


@query("events_modularity", oracle=_MODULARITY_ORACLE)
def events_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the site-section partition (pages grouped into
    sections of {_SECTION_DIV} consecutive ids) on the undirected transition
    graph: per-section contribution Q_c = e_c/m − (d_c/2m)², answering "do
    site sections form natural navigation communities?".  Complements the
    motif (`events_triangle_count`) and centrality (`events_pagerank`)
    views with the partition-quality view.

    Exactness: the contribution is emitted BOTH as the exact integer
    q_scaled = 4m·e_c − d_c² (Q_c times the constant 4m², bit-identical
    across engines) and as one integer-input division rounded once.
    Scale: everything after the distinct-edge projection is |V|²-bounded;
    the graph total m attaches as a provably-one-row scalar broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .transform(persist_tracked)
    )
    m = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    sect_nodes = deg.groupBy(
        F.expr(f"node div {_SECTION_DIV}").alias("section")
    ).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("degree").cast("long").alias("d_total"),
    )
    sect_edges = (
        und.filter(
            F.expr(f"u div {_SECTION_DIV}") == F.expr(f"v div {_SECTION_DIV}")
        )
        .groupBy(F.expr(f"u div {_SECTION_DIV}").alias("section"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    q_scaled = (
        4 * F.col("m") * F.coalesce("e_within", F.lit(0))
        - F.col("d_total") * F.col("d_total")
    ).cast("long")
    return (
        sect_nodes.join(sect_edges, "section", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "section",
            "n_nodes",
            "d_total",
            F.coalesce("e_within", F.lit(0).cast("long")).alias("e_within"),
            q_scaled.alias("q_scaled"),
            F.round(
                q_scaled.cast("double")
                / (4 * F.col("m") * F.col("m")).cast("long"),
                6,
            ).alias("q_contrib"),
        )
    )


# --------------------------------------------------------------------------
# Degree assortativity (degree-degree Pearson over edge endpoints)
# --------------------------------------------------------------------------
_ASSORTATIVITY_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(props->>'$.k' AS INT) AS k FROM events),
seq AS (
  SELECT k AS src, lead(k) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM seq WHERE dst IS NOT NULL AND src <> dst),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
ends AS (
  -- both orientations: the standard symmetrized endpoint-pair sample
  SELECT du.degree AS x, dv.degree AS y
  FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
  UNION ALL
  SELECT dv.degree AS x, du.degree AS y
  FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM ends)
SELECT n // 2 AS n_edges,
       CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0
              OR n * syy - CAST(sy AS HUGEINT) * sy = 0 THEN NULL
            ELSE round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
                 6)
       END AS assortativity
FROM mom
"""


@query("events_degree_assortativity", oracle=_ASSORTATIVITY_ORACLE)
def events_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected transition graph: the
    Pearson correlation between the degrees at the two ends of every edge
    (both orientations — Newman 2002's symmetrized form).  Positive ⇒
    hubs link to hubs (social-network shape); negative ⇒ hub-and-spoke
    (typical web/navigation shape).  One scalar that, with the clustering
    coefficient and degree distribution, completes the standard
    graph-shape triptych.

    Exactness: degrees are integers, the five moments are exact (Python
    arbitrary-precision integers ≡ the oracle's HUGEINT sums and the r14
    DECIMAL(38,0) chain), r is one fixed correctly-rounded double chain
    rounded once — int→double conversion, sqrt, multiply and divide are
    all IEEE correctly-rounded in both engines, and `_round6_half_up`
    replays Spark's round() bit-for-bit.  Scale (r15): everything after
    the window pass derives from the |V|²-bounded transition model
    (ONE fused distributed pass, `collect_transition_model`, |V|
    loud-guarded) — the r14 shape persisted the edge relation and a
    3-way degree join just to aggregate five moments of a model-sized
    relation."""
    trans, _node_list = collect_transition_model(
        spark, sf_dir, "events_degree_assortativity"
    )
    und = sorted(
        {
            (min(s, t), max(s, t))
            for s, t, _c in trans
            if s is not None and s != t
        }
    )
    deg: dict[int, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    # Symmetrized endpoint-degree sample: both orientations of each edge.
    n = 2 * len(und)
    sx = sy = sxy = sxx = syy = 0
    for u, v in und:
        x, y = deg[u], deg[v]
        sx += x + y
        sy += x + y
        sxy += 2 * x * y
        sxx += x * x + y * y
        syy += x * x + y * y
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    # Zero-variance guard (a regular/complete graph has constant degree —
    # observed live at sf0.1): both engines emit NULL instead of 0/0.
    import math

    r = (
        _round6_half_up(
            float(num) / (math.sqrt(float(den_x)) * math.sqrt(float(den_y)))
        )
        if den_x != 0 and den_y != 0
        else None
    )
    return spark.createDataFrame(
        [(n // 2, r)], "n_edges bigint, assortativity double"
    )


# --------------------------------------------------------------------------
# Two-hop reach: friend-of-friend neighborhood sizes
# --------------------------------------------------------------------------
_TWO_HOP_ORACLE = """
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
two AS (
  SELECT DISTINCT a.src AS node, b.dst AS reach
  FROM bi a JOIN bi b ON b.src = a.dst
  WHERE b.dst <> a.src),
n1 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS n_1hop
       FROM bi GROUP BY src),
n2 AS (
  SELECT t.node, CAST(count(*) AS BIGINT) AS n_2hop_new
  FROM two t
  LEFT JOIN bi d ON d.src = t.node AND d.dst = t.reach
  WHERE d.dst IS NULL
  GROUP BY t.node)
SELECT n1.node, n1.n_1hop, COALESCE(n2.n_2hop_new, 0) AS n_2hop_new
FROM n1 LEFT JOIN n2 ON n2.node = n1.node
"""


@query("events_two_hop_reach", oracle=_TWO_HOP_ORACLE)
def events_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach per node: direct neighbors and the count of NEW
    nodes first reachable at exactly two hops (friend-of-friend reach —
    the growth-potential / influence-radius metric; `events_bfs_hops`
    gives the single-landmark view, this gives it for every node).

    Scale: one self-equi-join of the |V|²-bounded directed edge relation
    (hop-2 candidates), deduped, then an anti-join against the direct
    edges to keep only genuinely-new reach — every join is an equi-join
    on node keys; nothing is corpus-sized after the distinct-edge
    projection.  Pure integer counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        props_k().alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(F.col("k").alias("src"), F.lead("k").over(w).alias("dst"))
    und = (
        seq.filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    bi = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .transform(persist_tracked)
    )
    a = bi.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    b = bi.select(F.col("src").alias("mid"), F.col("dst").alias("reach"))
    two = (
        a.join(b, "mid")
        .filter(F.col("reach") != F.col("node"))
        .select("node", "reach")
        .distinct()
    )
    direct = bi.select(F.col("src").alias("node"), F.col("dst").alias("reach"))
    n1 = bi.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("n_1hop")
    )
    n2 = (
        two.join(direct, ["node", "reach"], "left_anti")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_2hop_new"))
    )
    return n1.join(n2, "node", "left").select(
        "node",
        "n_1hop",
        F.coalesce("n_2hop_new", F.lit(0)).cast("long").alias("n_2hop_new"),
    )
