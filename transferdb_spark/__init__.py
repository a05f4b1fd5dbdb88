"""transferdb_spark — a PySpark-native analytics/migration engine.

A brand-new engine with the query & data-processing capabilities of the
reference migration tool (wentaojin/transferdb, see /root/reference and
SURVEY.md): schema assessment, schema conversion (reverse), structure
check, chunked data compare, full/CSV migration, and CDC-style
incremental replication — re-expressed on the Spark DataFrame/SQL engine
so that Catalyst/Tungsten handle pushdown, pruning, shuffle and codegen,
plus large-scale training-data pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7): declarative DataFrame plans, broadcast for
small dims, commutative checksums for compare, Structured Streaming for
the incremental mode, and no driver-side row loops on data paths.
"""

__version__ = "0.1.0"

from transferdb_spark.session import get_spark  # noqa: F401
