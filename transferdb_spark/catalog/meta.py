"""Catalog dataclasses — the metadata IR for reverse/check/assess.

Shapes mirror the facets the reference's IReader gathers per table
(/root/reference/module/reverse/oracle/o2m/interf.go:24-35): columns,
PK/UK/FK/CK, indexes, comments, partition/table type.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from transferdb_spark.rules.datatypes import OracleColumn


@dataclass(frozen=True)
class ConstraintMeta:
    name: str
    ctype: str  # 'P' | 'U' | 'R' (FK) | 'C' (check)
    columns: tuple[str, ...] = ()
    r_table: str = ""  # FK referenced table
    r_columns: tuple[str, ...] = ()
    delete_rule: str = "NO ACTION"  # NO ACTION | CASCADE | SET NULL
    search_condition: str = ""  # check constraint text


@dataclass(frozen=True)
class IndexMeta:
    name: str
    columns: tuple[str, ...]
    unique: bool = False
    # NORMAL | UNIQUE | FUNCTION-BASED NORMAL | BITMAP | DOMAIN | NORMAL/REV
    index_type: str = "NORMAL"


# index types MySQL can't express -> compatibility quarantine
# (/root/reference/module/reverse/oracle/o2m/rule.go:425-746)
INCOMPATIBLE_INDEX_TYPES = {"BITMAP", "DOMAIN", "NORMAL/REV", "FUNCTION-BASED NORMAL"}

# table types routed to the compatibility file
# (/root/reference/module/reverse/oracle/public/filter.go:102-187)
INCOMPATIBLE_TABLE_TYPES = {"PARTITIONED", "TEMPORARY", "CLUSTERED", "MATERIALIZED VIEW"}


@dataclass
class TableMeta:
    schema: str
    name: str
    columns: list[OracleColumn] = field(default_factory=list)
    constraints: list[ConstraintMeta] = field(default_factory=list)
    indexes: list[IndexMeta] = field(default_factory=list)
    comment: str = ""
    table_type: str = "HEAP"  # HEAP | PARTITIONED | TEMPORARY | CLUSTERED | IOT
    row_count: int | None = None
    # charset/collation facets (check diffs them, diff.go:111-234);
    # source side carries Oracle collation classes (BINARY_CS/CI/AI),
    # target side carries MySQL charset + collation names
    charset: str = ""
    collation: str = ""
    # PARTITIONED tables: (partition_type, key columns), e.g.
    # ("RANGE", ("o_orderdate",)) — diffed by check (diff.go:521-561)
    partition_type: str = ""
    partition_keys: tuple[str, ...] = ()

    @property
    def primary_key(self) -> ConstraintMeta | None:
        for c in self.constraints:
            if c.ctype == "P":
                return c
        return None

    @property
    def is_compatible(self) -> bool:
        return self.table_type not in INCOMPATIBLE_TABLE_TYPES

    def column(self, name: str) -> OracleColumn | None:
        for c in self.columns:
            if c.name.upper() == name.upper():
                return c
        return None
