"""Schema-conversion rule engine (SURVEY.md §2.11 R1-R4, F6).

Pure-Python, deterministic, data-driven: built-in mapping tables plus
override resolution with priority column > table > schema > builtin
(/root/reference/module/reverse/oracle/public/change.go:219-241).
"""

from transferdb_spark.rules.datatypes import (  # noqa: F401
    OracleColumn,
    map_mysql_to_oracle_type,
    map_oracle_type,
    oracle_type_to_spark,
)
from transferdb_spark.rules.defaults import rewrite_default_m2o, rewrite_default_o2m  # noqa: F401
from transferdb_spark.rules.resolution import RuleSet, resolve_type  # noqa: F401
