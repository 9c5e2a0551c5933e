"""Skew mitigation: salted joins for hot keys.

At 100 TB a shuffle join on a skewed key (a handful of values holding most
rows — event types, null-ish defaults, head domains) puts the hot key's
entire row set in ONE reducer task; the stage runs as slow as that task.
AQE's skew-join splitting handles sort-merge cases adaptively, but the
static salting pattern remains the portable fix — and the one you need
when the skewed side feeds an aggregation keyed by the same column.

`salted_join` spreads each hot key over `num_salts` synthetic sub-keys:
the small side is exploded ×num_salts (its row count is O(distinct keys),
so the blowup is bounded), the big side picks a DETERMINISTIC salt by
hashing a row-unique column (never `rand()` — retried tasks must
re-produce identical salts, see xxhash64 policy in datagen/values.py).
Join output is row-identical to the unsalted join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from iceberg_table_generator_spark.operators.relational import dsum, sql_dsum
from iceberg_table_generator_spark.registry import query
from iceberg_table_generator_spark.sources.tables import load_table


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, spread over `num_salts` sub-keys.

    `salt_from` names a big-side column whose per-row hash picks the salt
    (any roughly-unique column; uniqueness only affects spread quality,
    not correctness).  The small side is replicated across every salt via
    a bounded explode, so each (key, salt) bucket holds ~1/num_salts of
    the hot key's rows and the shuffle's largest task shrinks by that
    factor.  Result columns match the plain join (salt column dropped)."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from), F.lit(42)), F.lit(num_salts)).cast("int")
    )
    return big_salted.join(small_rep, [key, "__salt"], how).drop("__salt")


_SKEW_ORACLE = f"""
WITH dim AS (
  SELECT 'A' AS l_returnflag, 'returned' AS flag_desc UNION ALL
  SELECT 'N', 'not returned' UNION ALL
  SELECT 'R', 'refunded')
SELECT flag_desc,
       CAST(count(*) AS BIGINT) AS n_items,
       {sql_dsum("l_extendedprice")} AS total_price
FROM lineitem l JOIN dim USING (l_returnflag)
GROUP BY flag_desc
"""


@query("join_skew_salted", oracle=_SKEW_ORACLE)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join on `l_returnflag` — 3 distinct values over the
    whole lineitem table, the worst-case skew shape.  The merge hint forces
    the shuffle path (a dim this small would otherwise broadcast, which is
    the right call in production; the query exists to pin the salting
    machinery), and the salt spreads each flag across 16 sub-partitions.
    The oracle is the plain unsalted join: salting must be invisible in
    the result."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("A", "returned"), ("N", "not returned"), ("R", "refunded")],
        "l_returnflag string, flag_desc string",
    )
    joined = salted_join(
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"),
        dim.hint("merge"),
        "l_returnflag",
        salt_from="l_orderkey",
    )
    return joined.groupBy("flag_desc").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("total_price"),
    )


def salt_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated —
    the whole-row-hash variant of `salted_join` for frames with no single
    row-unique column.  `on` must name the key column present in both
    sides; output columns = the plain join's columns."""
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


__all__ = ["salted_join", "join_skew_salted", "salt_join", "salted_count"]
