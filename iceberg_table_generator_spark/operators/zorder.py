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


# --------------------------------------------------------------------------
# Hilbert-curve codes (locality-preserving alternative to Morton)
# --------------------------------------------------------------------------
# The Hilbert curve never makes the long diagonal jumps Morton makes at
# power-of-two boundaries, so consecutive codes are ALWAYS grid-adjacent —
# measurably tighter per-file bounding boxes when files are range-sliced
# from the sorted order (the reason Delta/Databricks moved their clustering
# default from Z-order to Hilbert).  The xy→d transform is the classic
# flip-and-swap recursion unrolled to a FIXED 8-step chain of integer CASE
# arithmetic — the same expression text runs on Spark and DuckDB, and the
# xor-free identity (3·rx + ry − 2·rx·ry) keeps every op portable.

_HILBERT_BITS = 8
_HILBERT_N = 1 << _HILBERT_BITS


def _hilbert_step_exprs(s: int, n: int) -> list[str]:
    """One unrolled xy2d step at scale `s`: emits (d, x, y) update
    expressions over columns named d, x, y — identical SQL text for both
    engines (only CASE WHEN, &, +, -, * — no engine-specific ops)."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    d_new = f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})"
    x_new = (
        f"CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {n - 1} - y ELSE y END)"
        f" ELSE x END"
    )
    y_new = (
        f"CASE WHEN {ry} = 0 THEN"
        f" (CASE WHEN {rx} = 1 THEN {n - 1} - x ELSE x END)"
        f" ELSE y END"
    )
    return [f"({d_new}) AS d", f"({x_new}) AS x", f"({y_new}) AS y"]


def _hilbert_oracle() -> str:
    steps = []
    prev = "lanes"
    for i, s in enumerate(
        1 << b for b in range(_HILBERT_BITS - 1, -1, -1)
    ):
        exprs = _hilbert_step_exprs(s, _HILBERT_N)
        steps.append(
            f"s{i} AS (SELECT o_orderkey, a, b, {', '.join(exprs)} FROM {prev})"
        )
        prev = f"s{i}"
    chain = ",\n".join(steps)
    return f"""
WITH lanes AS (
  SELECT o_orderkey,
         o_orderkey % {_HILBERT_N} AS a,
         o_custkey % {_HILBERT_N} AS b,
         CAST(0 AS BIGINT) AS d,
         o_orderkey % {_HILBERT_N} AS x,
         o_custkey % {_HILBERT_N} AS y
  FROM orders),
{chain}
SELECT o_orderkey, CAST(a AS INT) AS a, CAST(b AS INT) AS b,
       CAST(d AS BIGINT) AS h
FROM {prev}
"""


def _register_hilbert_query():
    from pyspark.sql import SparkSession

    from iceberg_table_generator_spark.registry import query
    from iceberg_table_generator_spark.sources.tables import load_table

    @query("zorder_hilbert_codes", oracle=_hilbert_oracle())
    def zorder_hilbert_codes(spark: SparkSession, sf_dir: str):
        """Hilbert-curve clustering codes on 8-bit lanes of
        (o_orderkey, o_custkey) — the locality-preserving alternative to
        `zorder_morton_codes` (consecutive Hilbert codes are always
        grid-adjacent; Morton jumps diagonals at power-of-two seams, so
        range-sliced files get looser bounding boxes).  Swap the code
        expression in `with_zorder` to switch a table's clustering.

        The transform is the classic flip-and-swap recursion unrolled to
        8 integer CASE steps; Spark executes the SAME generated SQL text
        as the DuckDB oracle (selectExpr per step), every op integer and
        engine-portable (the xor in the classic formula is replaced by
        the polynomial identity 3rx + ry − 2·rx·ry).  Narrow per-row
        arithmetic inside whole-stage codegen — no shuffle, no joins; at
        100 TB this is a free column on the write path, exactly like the
        Morton code."""
        o = load_table(spark, sf_dir, "orders")
        df = o.selectExpr(
            "o_orderkey",
            f"o_orderkey % {_HILBERT_N} AS a",
            f"o_custkey % {_HILBERT_N} AS b",
            "CAST(0 AS BIGINT) AS d",
            f"o_orderkey % {_HILBERT_N} AS x",
            f"o_custkey % {_HILBERT_N} AS y",
        )
        for s in (1 << b for b in range(_HILBERT_BITS - 1, -1, -1)):
            df = df.selectExpr(
                "o_orderkey", "a", "b", *_hilbert_step_exprs(s, _HILBERT_N)
            )
        return df.selectExpr(
            "o_orderkey",
            "CAST(a AS INT) AS a",
            "CAST(b AS INT) AS b",
            "CAST(d AS BIGINT) AS h",
        )

    return zorder_hilbert_codes


_register_hilbert_query()


# --------------------------------------------------------------------------
# Locality audit: Morton vs Hilbert bounding boxes over code-range slices
# --------------------------------------------------------------------------
_LOCALITY_BUCKETS = 16
_CODE_SPACE = _HILBERT_N * _HILBERT_N  # 16-bit codes for both schemes


def _locality_oracle() -> str:
    hilbert_chain = _hilbert_oracle()
    # reuse the hilbert CTE text up to its final SELECT, then join morton
    hilbert_body = hilbert_chain[hilbert_chain.index("WITH") : hilbert_chain.rindex("SELECT")]
    return f"""
{hilbert_body.rstrip()},
codes AS (
  SELECT o_orderkey, a, b, d AS hilbert,
         CAST({_morton_sql_terms} AS BIGINT) AS morton
  FROM s{_HILBERT_BITS - 1}),
stacked AS (
  SELECT 'hilbert' AS scheme, a, b,
         hilbert // {_CODE_SPACE // _LOCALITY_BUCKETS} AS bucket FROM codes
  UNION ALL
  SELECT 'morton' AS scheme, a, b,
         morton // {_CODE_SPACE // _LOCALITY_BUCKETS} AS bucket FROM codes),
boxes AS (
  SELECT scheme, CAST(bucket AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST((max(a) - min(a)) + (max(b) - min(b)) AS BIGINT)
           AS bbox_halfperim
  FROM stacked GROUP BY scheme, bucket)
SELECT scheme, bucket, n_rows, bbox_halfperim FROM boxes
"""


def _register_locality_query():
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as FF

    from iceberg_table_generator_spark.registry import query
    from iceberg_table_generator_spark.sources.tables import load_table

    @query("zorder_locality_audit", oracle=_locality_oracle())
    def zorder_locality_audit(spark: SparkSession, sf_dir: str):
        """Locality audit comparing the two clustering curves on the SAME
        data: slice the 16-bit code space into {_LOCALITY_BUCKETS}
        equal-width ranges (a file-slicing proxy that needs no global
        rank) and report each slice's bounding-box half-perimeter in
        (a, b) space, per scheme.  Hilbert slices stay square-ish while
        Morton slices straddle power-of-two seams — the measured reason
        to prefer Hilbert for multi-dimensional file skipping, pinned as
        an invariant in tests (Hilbert's total half-perimeter ≤
        Morton's).

        Pure integer bit arithmetic end to end; the corpus is scanned
        once and folded onto a 2×{_LOCALITY_BUCKETS}-row domain."""
        o = load_table(spark, sf_dir, "orders")
        df = o.selectExpr(
            "o_orderkey",
            f"o_orderkey % {_HILBERT_N} AS a",
            f"o_custkey % {_HILBERT_N} AS b",
            "CAST(0 AS BIGINT) AS d",
            f"o_orderkey % {_HILBERT_N} AS x",
            f"o_custkey % {_HILBERT_N} AS y",
        )
        for s in (1 << bb for bb in range(_HILBERT_BITS - 1, -1, -1)):
            df = df.selectExpr(
                "o_orderkey", "a", "b", *_hilbert_step_exprs(s, _HILBERT_N)
            )
        codes = df.selectExpr(
            "a",
            "b",
            "d AS hilbert",
            f"CAST({_morton_sql_terms} AS BIGINT) AS morton",
        )
        w = _CODE_SPACE // _LOCALITY_BUCKETS
        stacked = codes.selectExpr(
            "a",
            "b",
            f"stack(2, 'hilbert', hilbert div {w}, 'morton', morton div {w})"
            " AS (scheme, bucket)",
        )
        return (
            stacked.groupBy("scheme", FF.col("bucket").cast("int").alias("bucket"))
            .agg(
                FF.count(FF.lit(1)).alias("n_rows"),
                (
                    (FF.max("a") - FF.min("a")) + (FF.max("b") - FF.min("b"))
                )
                .cast("long")
                .alias("bbox_halfperim"),
            )
        )

    return zorder_locality_audit


_register_locality_query()
