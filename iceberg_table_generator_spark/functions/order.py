"""Distributed global order statistics: the scale-correct replacement for
unpartitioned windows.

`Window.orderBy(...)` with no `partitionBy` moves EVERY input row to a
single partition (Spark warns `WindowExec: No Partition Defined`).  Over a
bounded post-aggregation relation (months, count distributions, limit-k)
that is fine and the repo's window-invariant suite
(`tests/test_window_invariant.py`) classifies it as such; over a
dimension-cardinality relation (per-part revenue at SF100k ≈ 20B rows,
per-customer RFM, a 100 TB corpus vocabulary) it is the single-partition
scale-killer class.

This module implements the classic two-phase distributed prefix scan as a
composition of DataFrame ops, bit-exactly equal to the global window:

1. **Deterministic range bucketing** (the r10 redesign): explicit bucket
   boundaries are computed ONCE at call time — a seeded sample of the
   LEADING sort column collected to the driver (≤ ``n_buckets × 32``
   scalars; the same bounded-driver-literal class as the repo's centroid
   broadcasts) — and embedded in the plan as LITERALS inside a
   binary-search CASE expression.  The bucket count adapts to the
   relation (``ceil(count / 4096)``, capped at the configured shuffle
   parallelism, floored at 2), so dimension-sized inputs get trivial
   expressions and fact-sized inputs get full parallelism.  Every row's
   bucket is a pure function of its own values, so ANY re-execution
   (executor loss, evicted cache block, a second action on the returned
   frame) reproduces the identical partitioning.
   This replaces ``repartitionByRange``, whose sampler is nondeterministic
   across executions: the r9 persist fix pinned one sampling per query but
   left correctness resting on cache residency — lineage recompute through
   a fresh sampler could silently de-synchronize the rank and offset
   branches on a real cluster (r9 VERDICT lead item).  Boundaries-as-
   literals remove the sampler from the correctness path entirely.
2. per-bucket `row_number` / running `sum` under
   `Window.partitionBy("_bkt")` — one hash shuffle on the bucket id,
   deterministic, skew-balanced by the quantile boundaries;
3. per-bucket totals (≤ n_buckets rows — bounded by configuration, not
   data size; map-side partial aggregation makes this shuffle tiny),
   prefix-summed over that bounded relation and broadcast back as offsets.

The bucket count follows ``spark.sql.shuffle.partitions`` (what every
other shuffle in the engine obeys — `defaultParallelism` would equal
total cores on a real cluster and put ~10 GB per bucket at 100 TB), with
a small floor so the offset relation stays non-trivial on tiny local
sessions.  The input is persisted MEMORY_AND_DISK as a PURE PERFORMANCE
measure (both the window branch and the totals branch read it, as do most
callers' separate scalar aggregates); unlike the r9 design, losing the
cache can no longer change the answer.

The reference has no ordering surface at all (its only sort is the
deterministic file-path sort, `IcebergTableGenerator.java:451-464`); this
primitive exists for SURVEY.md §2.8's 100 TB mandate.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.storagelevel import StorageLevel

from iceberg_table_generator_spark.functions.cache import persist_tracked

#: Floor for the bucket count: keeps the offset relation (and therefore
#: the plan shape under test) non-trivial on tiny local sessions.
_MIN_PARTS = 8

#: Sample rows collected per bucket when estimating boundaries.  32 per
#: bucket bounds the driver collect at n_buckets*32 tuples (1,024 for the
#: local 32-partition session) while keeping bucket sizes within ~2x of
#: balanced with high probability — and balance only affects SPEED, never
#: correctness: any boundary set yields exact global positions.
_SAMPLE_PER_BUCKET = 32

#: Seed for the boundary sample.  Determinism across separate executions
#: of the SAME query run is what matters for reproducibility hygiene;
#: correctness does not depend on it (boundaries are collected once and
#: embedded as literals before the main job runs).
_BOUNDARY_SEED = 1031

OrderSpec = Sequence[tuple[str, bool]]


def sort_cols(order: OrderSpec) -> list[Column]:
    """Materialize an ``(name, ascending)`` order spec as sort Columns
    (Spark defaults: ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST — the same
    convention the boundary comparator below implements)."""
    return [F.asc(c) if asc else F.desc(c) for c, asc in order]


#: Minimum rows per bucket before another bucket is worth opening.  A
#: relation with fewer than 2×4096 rows gets ONE bucket (the work is
#: trivial either way); the bucket count only reaches the configured
#: shuffle parallelism once the relation is large enough that per-bucket
#: work dominates — which keeps the boundary CASE expression TINY for the
#: dimension-sized relations most callers pass (measured r10: Catalyst
#: ANALYSIS of a 31-boundary multi-column tree cost ~0.6 s driver-side
#: per call; a 3-boundary single-column tree is noise).
_MIN_ROWS_PER_BUCKET = 4096


def _cmp_lead(asc: bool, a, b) -> int:
    """Driver-side comparator for LEADING-column boundary values, matching
    Spark's sort order (asc ⇒ nulls first, desc ⇒ nulls last).  Only
    boundary QUALITY (bucket balance) depends on this; correctness does
    not."""
    if a is None and b is None:
        return 0
    if a is None:
        return -1 if asc else 1
    if b is None:
        return 1 if asc else -1
    if a == b:
        return 0
    if a < b:
        return -1 if asc else 1
    return 1 if asc else -1


def _strictly_after(name: str, asc: bool, v) -> Column:
    """Expression: the row's LEADING sort column sorts STRICTLY AFTER the
    literal boundary value.  Null semantics match Spark's (asc nulls
    first, desc nulls last).  A NULL comparison result can only arise
    where "not after" is the correct answer (asc row-null vs non-null
    boundary), and `F.when` treats NULL conditions as false, so the
    bucket search below stays exact."""
    c = F.col(name)
    if v is None:
        return c.isNotNull() if asc else F.lit(False)
    lit = F.lit(v)
    return (c > lit) if asc else ((c < lit) | c.isNull())


def _bucket_expr(order: OrderSpec, bounds: list) -> Column:
    """Binary-search CASE tree assigning each row its bucket id in
    ``[0, len(bounds)]``: O(log n_buckets) comparisons evaluated per row
    over literal boundary values of the LEADING sort column —
    deterministic by construction (a pure function of the row), which is
    the whole point of the r10 redesign.

    Leading-column-only boundaries keep the expression O(n_buckets)
    simple comparisons (no per-node lexicographic chains): bucketing only
    needs MONOTONICITY along the order, not total-order precision — rows
    tied on the leading column land in one bucket and the within-bucket
    window finishes the job.  The trade is skew: a single leading value
    carrying a large fraction of the relation concentrates in one bucket
    (still strictly better than the single-partition window this
    primitive replaces, which concentrates 100%)."""
    if not bounds:
        return F.lit(0)
    name, asc = order[0]

    def rec(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            _strictly_after(name, asc, bounds[mid]), rec(mid + 1, hi)
        ).otherwise(rec(lo, mid))

    return rec(0, len(bounds))


def range_boundaries(df: DataFrame, order: OrderSpec, n_buckets: int) -> list:
    """Compute sorted, deduplicated boundary values of the LEADING sort
    column from a seeded sample of ``df`` — collected ONCE to the driver
    (bounded: ~``n_buckets × _SAMPLE_PER_BUCKET`` scalars), then embedded
    as plan literals by the caller.  ``df.count()`` sizes both the sample
    fraction and the EFFECTIVE bucket count (``ceil(cnt / 4096)`` capped
    at ``n_buckets``): tiny relations get one bucket and a trivial plan,
    and the bucket count only reaches the configured parallelism when
    the data actually needs it.  Callers persist ``df`` first so both
    jobs read cache."""
    cnt = df.count()
    if cnt <= 1:
        return []
    # Floor at 2: with at least one boundary the bucket column stays a
    # ROW-DEPENDENT expression — a constant bucket would be folded by
    # Catalyst, degenerating the main window to an unpartitioned one and
    # changing the plan shape the invariant suites pin.
    eff = max(2, min(n_buckets, -(-cnt // _MIN_ROWS_PER_BUCKET)))
    lead, asc = order[0]
    target = eff * _SAMPLE_PER_BUCKET
    frac = min(1.0, target / cnt)
    vals = [
        r[0]
        for r in df.select(F.col(lead))
        .sample(False, frac, seed=_BOUNDARY_SEED)
        .collect()
    ]
    if not vals:
        return []
    vals.sort(key=functools.cmp_to_key(lambda a, b: _cmp_lead(asc, a, b)))
    s = len(vals)
    bounds: list = []
    for i in range(1, eff):
        b = vals[(i * s) // eff]
        if not bounds or _cmp_lead(asc, b, bounds[-1]) > 0:
            bounds.append(b)
    return bounds


def with_global_order(
    df: DataFrame,
    order: OrderSpec,
    cums: Sequence[tuple[Column, str]] = (),
    pos: str | None = "pos",
) -> DataFrame:
    """Add a global position (``row_number`` equivalent, 1-based LONG) and
    running totals (``sum(...) ROWS UNBOUNDED PRECEDING`` equivalents)
    under the TOTAL order ``order`` — without a single-partition window.

    ``order`` is a sequence of ``(column_name, ascending)`` pairs and must
    be a total order (include a unique tiebreak column, as every caller's
    window already does); under a total order ``rank`` and ``dense_rank``
    equal ``row_number``, so ``pos`` serves for all three.  ``cums`` is a
    list of ``(value_column, output_name)``; value types are preserved
    (DECIMAL stays exact — the cross-partition offset add is null-guarded
    rather than coalesced with an int literal, so no type coercion
    happens).

    Determinism contract (r10): the bucket id is a pure expression over
    literal boundaries, so EVERY re-execution — executor loss, cache
    eviction, `release_tracked()` followed by a second action — produces
    the identical partitioning for the rank and offset branches.  The
    internal persist is performance-only.
    """
    spark = df.sparkSession
    n_buckets = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        _MIN_PARTS,
    )
    # Perf-only persist: the boundary jobs (count + sample), the window
    # branch, the totals branch, and most callers' separate scalar
    # aggregates all read this relation; one materialization serves all.
    base = persist_tracked(df, StorageLevel.MEMORY_AND_DISK)
    bounds = range_boundaries(base, order, n_buckets)
    d = base.withColumn("_bkt", _bucket_expr(order, bounds).cast("int"))

    sc = sort_cols(order)
    w = Window.partitionBy("_bkt").orderBy(*sc)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn("_lpos", F.row_number().over(w).cast("long"))
    for col, name in cums:
        d = d.withColumn(f"_lc_{name}", F.sum(col).over(run))

    # Per-bucket totals: ≤ n_buckets rows by construction, so the global
    # prefix window over THEM is configuration-bounded, and the offset
    # relation broadcasts safely.  The value totals re-sum the RAW column
    # (a running-sum max would only equal the total for non-negative
    # values).  Bucket ids increase along the sort order, so the prior-
    # bucket prefix IS the global offset.
    tot = d.groupBy("_bkt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(col).alias(f"_t_{name}") for col, name in cums],
    )
    prior = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).alias("_off_pos"),
        *[
            F.sum(f"_t_{name}").over(prior).alias(f"_off_{name}")
            for _, name in cums
        ],
    )
    d = d.join(F.broadcast(off), "_bkt")
    if pos is not None:
        d = d.withColumn(pos, F.col("_lpos") + F.col("_off_pos"))
    for _, name in cums:
        # Null-symmetric combine, matching the window form exactly: SUM
        # ignores nulls, so an all-null local prefix (_lc NULL) with a
        # non-null cross-partition offset must yield the offset — and
        # only both-NULL yields NULL.  `_lc + o` alone would poison the
        # offset whenever the bucket's leading values are all null.
        o = F.col(f"_off_{name}")
        lc = F.col(f"_lc_{name}")
        d = d.withColumn(
            name,
            F.when(o.isNull(), lc).when(lc.isNull(), o).otherwise(lc + o),
        )
    drop = ["_bkt", "_lpos", "_off_pos"]
    drop += [f"_lc_{name}" for _, name in cums]
    drop += [f"_off_{name}" for _, name in cums]
    return d.drop(*drop)


def ntile_expr(pos: str, n_total: str, k: int) -> Column:
    """SQL ``NTILE(k)`` from a global 1-based position column and a total
    row-count column (both referenced BY NAME), as a narrow per-row
    expression — the standard semantics both Spark and DuckDB implement:
    the first ``n mod k`` tiles get ``n div k + 1`` rows, the rest
    ``n div k``.

    Integer `div` end to end (the repo's exactness rule: float division
    plus cast flips exact multiples), so tile boundaries are engine-exact.
    With :func:`with_global_order` producing ``pos``, NTILE never needs a
    single-partition window.
    """
    nd = f"({n_total} div {k})"
    rem = f"({n_total} % {k})"
    fat = f"({nd} + 1)"
    big = f"({rem} * {fat})"
    return F.expr(
        f"CASE WHEN {pos} <= {big} THEN ({pos} + {fat} - 1) div {fat} "
        f"ELSE {rem} + (({pos} - {big}) + {nd} - 1) div {nd} END"
    ).cast("int")
