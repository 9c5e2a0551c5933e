"""Operator modules — importing this package registers every query."""

from iceberg_table_generator_spark.operators import (  # noqa: F401
    corpus,
    dedup,
    graph,
    heavyhitters,
    incremental,
    metadata_tables,
    mining,
    multimodal,
    pipeline,
    relational,
    relational_ext,
    scalar_ext,
    sequences,
    similarity,
    skew,
    text,
    tpch_ext,
    wave8,
    wide,
    zorder,
)
