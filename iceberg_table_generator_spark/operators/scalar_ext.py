"""Scalar-surface extensions: string pack, null semantics, approx sketches.

Rounds out SURVEY.md §2.7's "scalar function library" replacement with the
string-manipulation and null-handling shapes the reference's generators
imply (`Main.java:525-531` templating) plus the mergeable sketch aggregates
(HLL, t-digest) that replace exact distinct/percentile at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0')        AS padded_key,
           reverse(p_brand)                                 AS rev_brand,
           repeat('*', CAST(p_size % 5 AS INT))             AS stars,
           split_part(p_name, ' ', 1)                       AS first_word,
           replace(p_type, ' ', '_')                        AS type_snake,
           CAST(length(p_name) AS INT)                      AS name_len,
           CAST(position('Brand' IN p_brand) AS INT)        AS brand_pos,
           left(p_name, 5)                                  AS name_prefix,
           trim(concat('  ', p_brand, '  '))                AS trimmed
    FROM part
    WHERE p_partkey % 20 = 0
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: pad/reverse/repeat/split_part/replace/
    length/position/substring/trim — all whole-stage-codegen expressions."""
    p = load_table(spark, sf_dir, "part").filter(F.pmod("p_partkey", F.lit(20)) == 0)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat(F.lit("*"), F.pmod("p_size", F.lit(5)).cast("int")).alias("stars"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.length("p_name").cast("int").alias("name_len"),
        F.instr("p_brand", "Brand").cast("int").alias("brand_pos"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
    )


@query(
    "null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P')      AS status_or_null,
             CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price
      FROM orders WHERE o_orderkey % 50 = 0)
    SELECT coalesce(status_or_null, 'PENDING')               AS status_filled,
           count(*)                                          AS n,
           count(big_price)                                  AS n_big,
           count(*) - count(big_price)                       AS n_null_big,
           CAST(count(DISTINCT status_or_null) AS BIGINT)    AS n_distinct_status,
           count(CASE WHEN status_or_null IS NOT DISTINCT FROM NULL THEN 1 END)
               AS n_null_status
    FROM t
    GROUP BY coalesce(status_or_null, 'PENDING')
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics pack: nullif/coalesce, count vs count(col) null
    skipping, distinct-over-nulls, null-safe comparison (<=> ≡ IS NOT
    DISTINCT FROM)."""
    o = load_table(spark, sf_dir, "orders").filter(F.pmod("o_orderkey", F.lit(50)) == 0)
    t = o.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_or_null"),
        F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).alias("big_price"),
    )
    return t.groupBy(
        F.coalesce("status_or_null", F.lit("PENDING")).alias("status_filled")
    ).agg(
        F.count("*").alias("n"),
        F.count("big_price").alias("n_big"),
        (F.count("*") - F.count("big_price")).alias("n_null_big"),
        F.countDistinct("status_or_null").alias("n_distinct_status"),
        F.count(F.when(F.col("status_or_null").eqNullSafe(F.lit(None)), 1)).alias(
            "n_null_status"
        ),
    )


@query(
    "profile_table",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT)   AS d_status,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS d_priority,
             CAST(count(DISTINCT o_custkey) AS BIGINT)       AS d_custkey,
             round(min(o_totalprice), 2)                     AS min_price,
             round(max(o_totalprice), 2)                     AS max_price,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6)
                 AS mean_price,
             CAST(min(o_orderdate) AS VARCHAR)               AS min_date,
             CAST(max(o_orderdate) AS VARCHAR)               AS max_date
      FROM orders)
    SELECT * FROM s
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (the ANALYZE TABLE shape): row count, distinct
    cardinalities, numeric range/mean, date range — all in a single
    aggregate so the table is scanned once regardless of width.  At 100 TB
    swap exact distincts for approx_count_distinct (same plan shape)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.countDistinct("o_orderpriority").alias("d_priority"),
        F.countDistinct("o_custkey").alias("d_custkey"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_price"),
        F.min("o_orderdate").cast("string").alias("min_date"),
        F.max("o_orderdate").cast("string").alias("max_date"),
    )


# Relative-error acceptance bound for the sketch verdicts: HLL++ at
# rsd=0.02 is within 2.5σ = 5% essentially always (and HLL/t-digest are
# DETERMINISTIC given the data — no flake, just engine-specific estimates).
SKETCH_REL_BOUND = 0.05

_SKETCHES_ORACLE = f"""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         / count(DISTINCT l_partkey) < {SKETCH_REL_BOUND} AS hll_ok,
       abs(approx_quantile(l_extendedprice, 0.5)
           - quantile_cont(l_extendedprice, 0.5))
         / quantile_cont(l_extendedprice, 0.5) < {SKETCH_REL_BOUND} AS tdigest_ok
FROM lineitem GROUP BY l_returnflag
"""


@query("approx_sketches", oracle=_SKETCHES_ORACLE)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregates — the 100 TB replacements for exact
    distinct counts and percentiles: HLL++ (`approx_count_distinct`) and
    t-digest-style (`approx_percentile`).

    Tolerance-checked oracle pairing (r6, VERDICT r5 task 6): the raw
    estimates are engine-specific by design (different HLL register
    layouts, different percentile sketches), so the query emits what IS
    engine-exact — the exact distinct count — plus a per-engine VERDICT
    boolean: |sketch − exact| / exact < {SKETCH_REL_BOUND:.0%}, each
    engine judging its own sketch against its own exact aggregate.  Both
    engines' sketches are deterministic functions of the data, so the
    booleans are stable, and a sketch drifting out of its published error
    bound on EITHER engine flips a value and fails the hash compare.
    tests/test_scalar_ext.py additionally pins the tighter per-value
    errors Spark-side."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14: the exact distinct count lives in its OWN aggregation subtree.
    # Mixing a DISTINCT aggregate with the three plain aggregates in one
    # agg() makes Spark plan an Expand (every input row duplicated per
    # aggregate group): measured 5.6 s for the combined agg vs 1.5 + 1.8 s
    # for the split subtrees — and the two subtrees of the join are
    # independent stages the DAG scheduler runs CONCURRENTLY, so the wall
    # cost is max(), not sum().  The join key is the 3-row returnflag
    # domain (AQE broadcasts it); computed values, and therefore the
    # verdict booleans, are identical.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_parts")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "approx_median"
        ),
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            < SKETCH_REL_BOUND
        ).alias("hll_ok"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            / F.col("exact_median")
            < SKETCH_REL_BOUND
        ).alias("tdigest_ok"),
    )


# --------------------------------------------------------------------------
# Equi-width histogram (integer-exact binning)
# --------------------------------------------------------------------------
_HIST_BUCKETS = 22
_HIST_WIDTH_CENTS = 500_000  # 5000.00 per bucket over [0, 110000.00)

_HISTOGRAM_ORACLE = f"""
WITH b AS (
  SELECT least(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                    // {_HIST_WIDTH_CENTS} AS INT), {_HIST_BUCKETS - 1}) AS bucket,
         l_extendedprice AS p
  FROM lineitem)
SELECT bucket,
       CAST(bucket * {_HIST_WIDTH_CENTS} AS DOUBLE) / 100 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n,
       min(p) AS min_price, max(p) AS max_price
FROM b GROUP BY bucket
"""


@query("histogram_extendedprice", oracle=_HISTOGRAM_ORACLE)
def histogram_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width price histogram — the profiling primitive behind
    `SELECT histogram(col)` in DuckDB/Trino and optimizer NDV/skew stats.

    Binning happens in INTEGER cents (round to bigint, integer-divide by
    the bucket width) so bucket edges are engine-exact; float bucket
    arithmetic right at an edge could disagree in the last ulp and shift
    a row's bucket.  min/max per bucket are raw stored doubles (no
    accumulation → bit-exact).  One aggregation shuffle over at most
    {_HIST_BUCKETS} groups; partial aggregation collapses everything
    map-side, so the exchange moves O(buckets × partitions) rows no
    matter the table size."""
    li = load_table(spark, sf_dir, "lineitem")
    # integer division on BOTH engines (Spark `div`, DuckDB `//`):
    # float division + cast would truncate here but ROUND half-even in
    # DuckDB, shifting edge rows one bucket
    bucket = F.least(
        F.expr(
            f"CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
            f" div {_HIST_WIDTH_CENTS} AS INT)"
        ),
        F.lit(_HIST_BUCKETS - 1),
    )
    return (
        li.select(bucket.alias("bucket"), F.col("l_extendedprice").alias("p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p").alias("min_price"),
            F.max("p").alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("double") * _HIST_WIDTH_CENTS / 100).alias("bucket_lo"),
            "n",
            "min_price",
            "max_price",
        )
    )
