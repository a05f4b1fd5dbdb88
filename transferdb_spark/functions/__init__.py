"""Scalar function library (SURVEY.md §2.8).

Re-expresses the reference's pushed-down SQL scalar functions
(NVL/DECODE/TO_CHAR/CRC32/LISTAGG… — see
/root/reference/module/compare/oracle/o2m/task.go:134-187 and
/root/reference/module/migrate/sql/oracle/o2m/full.go:885-948) as Spark
Column builders, plus the cross-engine canonical-rendering contract used
by compare-mode hashing.
"""

from transferdb_spark.functions.canonical import (  # noqa: F401
    NULL_SENTINEL,
    SEP,
    canon_column,
    canon_sql,
    row_string,
    row_string_sql,
)
from transferdb_spark.functions.hashing import (  # noqa: F401
    fast_hash64,
    portable_hash64,
    portable_hash64_sql,
    row_hash,
    row_hash_sql,
)
from transferdb_spark.functions.scalars import (  # noqa: F401
    glob_to_regex,
    nvl,
    ts_format,
)
