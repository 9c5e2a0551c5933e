"""Query registry: every operator exposed through `__spark_entry__.py`.

Each registered query is a `(spark, sf_dir) -> DataFrame` callable plus (when
SQL-expressible) a DuckDB oracle SQL string over the same parquet tables.
This is the engine's public query surface and the driver's correctness gate
(SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; `oracle` is ANSI SQL DuckDB runs on the same data.

    Column names must match between the Spark result and the oracle result —
    alias everything on both sides.  Omit `oracle` only for genuinely
    non-SQL-expressible ops (approx/LSH, streaming) → rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    # Import registers everything; local import avoids cycles.
    from iceberg_table_generator_spark import operators  # noqa: F401
    from iceberg_table_generator_spark import datagen  # noqa: F401

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLE)
