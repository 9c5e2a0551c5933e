"""Deterministic synthetic-data generation (SURVEY.md §2.4/§2.5)."""

from iceberg_table_generator_spark.datagen import records, values  # noqa: F401
