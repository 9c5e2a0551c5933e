"""iceberg_table_generator_spark — a PySpark-native analytics engine.

A brand-new Spark-first engine with the query and data-processing
capabilities of the reference `sgcowell/iceberg-table-generator`
(see SURVEY.md), extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.
"""

from iceberg_table_generator_spark.registry import all_oracles, all_queries
from iceberg_table_generator_spark.session import get_spark

__all__ = ["all_oracles", "all_queries", "get_spark"]
