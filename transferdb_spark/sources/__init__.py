"""Sources & sinks (SURVEY.md §2.1)."""

from transferdb_spark.sources.registry import TABLES, load_table, load_tables, register_views  # noqa: F401
