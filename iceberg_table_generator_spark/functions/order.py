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

1. `repartitionByRange(n, *order)` — range shuffle on the sort key, so
   partition i holds keys strictly before partition i+1's (skew-balanced
   by Spark's range sampler);
2. per-partition `row_number` / running `sum` under
   `Window.partitionBy(spark_partition_id())` — parallel, no data motion;
3. per-partition totals (≤ n_partitions rows — bounded by CLUSTER size,
   not data size), prefix-summed over that bounded relation and broadcast
   back as offsets.

AQE partition coalescing only ever merges ADJACENT shuffle partitions,
which preserves the range-ordering invariant, and the offsets are computed
from the ACTUAL per-partition totals, so correctness never depends on
WHERE the sampled range boundaries fall — but it DOES depend on both plan
branches seeing the SAME boundaries: Spark's range sampler is not
deterministic across executions and ReuseExchange does not dedupe the
exchange, so the shuffled relation is persisted inside the primitive (the
r9 correctness fix; see the inline comment).

The reference has no ordering surface at all (its only sort is the
deterministic file-path sort, `IcebergTableGenerator.java:451-464`); this
primitive exists for SURVEY.md §2.8's 100 TB mandate.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.storagelevel import StorageLevel

from iceberg_table_generator_spark.functions.cache import persist_tracked

#: Floor for the range-shuffle partition count: keeps the offset relation
#: (and therefore the plan shape under test) non-trivial on tiny local
#: sessions; real sessions take the cluster's default parallelism.
_MIN_PARTS = 8


def with_global_order(
    df: DataFrame,
    order: Sequence[Column],
    cums: Sequence[tuple[Column, str]] = (),
    pos: str | None = "pos",
) -> DataFrame:
    """Add a global position (``row_number`` equivalent, 1-based LONG) and
    running totals (``sum(...) ROWS UNBOUNDED PRECEDING`` equivalents)
    under the TOTAL order ``order`` — without a single-partition window.

    ``order`` must be a total order (include a unique tiebreak column, as
    every caller's window already does); under a total order ``rank`` and
    ``dense_rank`` equal ``row_number``, so ``pos`` serves for all three.
    ``cums`` is a list of ``(value_column, output_name)``; value types are
    preserved (DECIMAL stays exact — the cross-partition offset add is
    null-guarded rather than coalesced with an int literal, so no type
    coercion happens).
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, _MIN_PARTS)
    d = df.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # CORRECTNESS-REQUIRED persist (r9 finding, caught by the sf0.1
    # sweep): the local-rank branch and the offset-totals branch below
    # both consume `d`, ReuseExchange does NOT dedupe the range
    # exchange, and Spark's range SAMPLER is not deterministic across
    # executions — two independent runs of the same repartitionByRange
    # were measured placing rows in different partitions.  Without this
    # persist the offsets can be computed against a DIFFERENT
    # partitioning than the ranks (observed: rfm_segments 71-row vs the
    # window form's 63-row result at sf0.1).  Persisting materializes
    # ONE partitioning that both branches read; it also makes each call
    # read its input lineage exactly once.  (Executor-loss recompute
    # would reintroduce the ambiguity on a real cluster — jobs needing
    # that guarantee should checkpoint; see test_global_order.py's
    # branch-consistency test.)
    d = persist_tracked(d, StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("_pid").orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn("_lpos", F.row_number().over(w).cast("long"))
    for col, name in cums:
        d = d.withColumn(f"_lc_{name}", F.sum(col).over(run))

    # Per-partition totals: ≤ n_parts rows by construction (grouped on
    # spark_partition_id), so the global prefix window over THEM is
    # cluster-bounded, and the offset relation broadcasts safely.  The
    # value totals re-sum the RAW column (a running-sum max would only
    # equal the total for non-negative values).
    tot = d.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[F.sum(col).alias(f"_t_{name}") for col, name in cums],
    )
    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).alias("_off_pos"),
        *[
            F.sum(f"_t_{name}").over(prior).alias(f"_off_{name}")
            for _, name in cums
        ],
    )
    d = d.join(F.broadcast(off), "_pid")
    if pos is not None:
        d = d.withColumn(pos, F.col("_lpos") + F.col("_off_pos"))
    for _, name in cums:
        # Null-symmetric combine, matching the window form exactly: SUM
        # ignores nulls, so an all-null local prefix (_lc NULL) with a
        # non-null cross-partition offset must yield the offset — and
        # only both-NULL yields NULL.  `_lc + o` alone would poison the
        # offset whenever the partition's leading values are all null.
        o = F.col(f"_off_{name}")
        lc = F.col(f"_lc_{name}")
        d = d.withColumn(
            name,
            F.when(o.isNull(), lc).when(lc.isNull(), o).otherwise(lc + o),
        )
    drop = ["_pid", "_lpos", "_off_pos"]
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
