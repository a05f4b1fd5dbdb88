"""Catalog abstraction (SURVEY.md §1.3).

The reference introspects DBA_TABLES/DBA_TAB_COLUMNS/DBA_CONSTRAINTS/
DBA_INDEXES at runtime (/root/reference/database/oracle/reverse.go:516-656).
Here a `TableMeta` carries the same facts, built either from explicit
specs (FIXTURES.md B7) or derived from parquet schemas.
"""

from transferdb_spark.catalog.meta import ConstraintMeta, IndexMeta, TableMeta  # noqa: F401
from transferdb_spark.catalog.fixture import fixture_catalog, table_meta_from_schema  # noqa: F401
