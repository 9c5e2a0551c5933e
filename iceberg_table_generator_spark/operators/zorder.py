"""Z-order (Morton) clustering for multi-dimensional file skipping.

A file layout sorted on ONE column gives tight footer min/max bounds on
that column only — a predicate on any other column prunes nothing.
Z-ordering interleaves the bits of several columns' bucket ranks so that
rows close in EVERY dimension land in the same files: each file then has
tight bounds on ALL clustered columns, and the manifest-style pruning in
`ParquetSnapshotTable.read(where=)` skips files for predicates on any of
them.  This is Iceberg's `rewrite_data_files(strategy => 'sort',
sort_order => 'zorder(a, b)')` re-expressed as DataFrame ops.

Everything is JVM-side integer arithmetic (width_bucket + shifts) inside
whole-stage codegen — `bits` × `len(cols)` terms, constant in data size.
The only driver-side step is one min/max aggregate per clustered column
(model-parameter-sized, same class as the IVF centroid fit).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

Z_COL = "__z"


def zorder_expr(
    cols: list[str], bounds: dict[str, tuple[float, float]], bits: int = 8
) -> Column:
    """Morton code: per column, an equi-width bucket rank in [0, 2^bits)
    against the given [min, max] bounds, then bit-interleaved across
    columns (column c contributes bit j at position j*C + c)."""
    n = 1 << bits
    ranks = []
    for c in cols:
        lo, hi = bounds[c]
        if hi <= lo:  # constant column: rank 0 everywhere
            ranks.append(F.lit(0).cast("long"))
            continue
        # width_bucket is 1-based and puts x == max in bucket n+1; clamp
        # into [0, n-1]
        b = F.width_bucket(F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)) - 1
        ranks.append(F.least(F.greatest(b, F.lit(0)), F.lit(n - 1)).cast("long"))
    z = F.lit(0).cast("long")
    C = len(cols)
    for j in range(bits):
        for ci, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * C + ci)
    return z


def with_zorder(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Attach the Morton code as `__z`.  Bounds come from one tiny
    aggregate (2 doubles per column collected to the driver — clustering
    model state, not data)."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    return df.withColumn(Z_COL, zorder_expr(cols, bounds, bits))


__all__ = ["Z_COL", "zorder_expr", "with_zorder"]


# --------------------------------------------------------------------------
# Oracle-paired Morton codes (integer-exact cross-engine check)
# --------------------------------------------------------------------------
# The lifecycle z-order test proves file pruning; this query proves the
# INTERLEAVE ARITHMETIC itself against DuckDB, on pure integer inputs
# (8-bit lanes of o_orderkey / o_custkey) where both engines' bit ops are
# exact.  Explicit bit-shift sum, no width_bucket: float bucket boundaries
# are engine-sensitive, integer shifts are not.

_MORTON_BITS = 8

_morton_sql_terms = " + ".join(
    f"(((a >> {j}) & 1) << {2 * j}) + (((b >> {j}) & 1) << {2 * j + 1})"
    for j in range(_MORTON_BITS)
)

_MORTON_ORACLE = f"""
WITH lanes AS (
  SELECT o_orderkey,
         o_orderkey % 256 AS a,
         o_custkey % 256 AS b
  FROM orders)
SELECT o_orderkey, CAST(a AS INT) AS a, CAST(b AS INT) AS b,
       CAST({_morton_sql_terms} AS BIGINT) AS z
FROM lanes
"""


def _register_morton_query():
    from iceberg_table_generator_spark.registry import query
    from iceberg_table_generator_spark.sources.tables import load_table

    @query("zorder_morton_codes", oracle=_MORTON_ORACLE)
    def zorder_morton_codes(spark, sf_dir):
        """Morton interleave of two 8-bit key lanes per order row — the
        same bit algebra `rewrite_zorder` clusters files by, checked
        value-exactly against DuckDB's integer shift semantics.  Pure
        narrow per-row integer ops: zero shuffle, full codegen."""
        orders = load_table(spark, sf_dir, "orders")
        lanes = orders.select(
            "o_orderkey",
            (F.col("o_orderkey") % 256).cast("int").alias("a"),
            (F.col("o_custkey") % 256).cast("int").alias("b"),
        )
        z = F.lit(0).cast("long")
        for j in range(_MORTON_BITS):
            z = z + F.shiftleft(F.shiftright(F.col("a"), j).bitwiseAND(F.lit(1)), 2 * j)
            z = z + F.shiftleft(
                F.shiftright(F.col("b"), j).bitwiseAND(F.lit(1)), 2 * j + 1
            )
        return lanes.withColumn("z", z.cast("bigint"))

    return zorder_morton_codes


zorder_morton_codes = _register_morton_query()
