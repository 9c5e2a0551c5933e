"""Explicit skew handling: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB: (a) a single
hot key too large for any one task even after AQE splits its partition's
OTHER keys away, and (b) pre-AQE engines / streaming joins where runtime
re-planning is unavailable.  The salting identity:

    L ⋈ R on k  ≡  (L + salt ∈ [0,S)) ⋈ (R × replicate S) on (k, salt)

The hot side gets a random-ish (here: deterministic hash) salt; the other
side is replicated S ways, splitting each hot key across S tasks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salt_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated.

    `on` must name the key column present in both sides.  Output columns =
    the plain join's columns.  The salt is xxhash64 of the skewed side's
    whole-row-stable id surrogate (monotonically unique within the join) —
    any per-row value works; it only needs to spread rows uniformly."""
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    replicated_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_l.join(replicated_r, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for hot-key counting: count per (key, salt)
    first (spreads one hot key over S reducers), then sum per key.  With
    map-side partial aggregation Spark usually does this implicitly; the
    explicit form documents the pattern and covers distinct-style plans
    that lose the combine step."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("c"))
    return partial.groupBy(key).agg(F.sum("c").alias("n"))
