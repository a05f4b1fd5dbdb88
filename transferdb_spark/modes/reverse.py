"""`reverse` mode — schema conversion: catalog → target DDL (R5/R7/R8).

The reference assembles CREATE TABLE text per table — columns with
nullability/defaults/comments, PK/UK/FK/CK, indexes — and routes
objects MySQL can't express (bitmap/function-based/domain/reverse
indexes; partitioned/temporary/clustered tables) to a compatibility
file (/root/reference/module/reverse/oracle/o2m/rule.go:46-932,
ddl.go:1-252, public/filter.go:102-187). Failures are quarantined, not
fatal (reverse.go:210-258).

This engine emits (a) MySQL-dialect DDL, (b) Spark SQL DDL — the
native target for a lakehouse migration.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from transferdb_spark.catalog.meta import (
    INCOMPATIBLE_INDEX_TYPES,
    IndexMeta,
    TableMeta,
)
from transferdb_spark.rules.datatypes import map_oracle_type
from transferdb_spark.rules.defaults import rewrite_default_o2m
from transferdb_spark.rules.resolution import RuleSet, resolve_type


@dataclass
class ReverseResult:
    ddl: list[str] = field(default_factory=list)  # emitted CREATE statements
    compatibility: list[str] = field(default_factory=list)  # quarantined objects
    errors: list[str] = field(default_factory=list)  # per-table failures


def _case(name: str, policy: int) -> str:
    """R7 name-case policy: 0=origin, 1=lower, 2=upper
    (common/reverse.go:348-352 `lower-case-field-name`)."""
    return name if policy == 0 else name.lower() if policy == 1 else name.upper()


def gen_create_table_mysql(
    t: TableMeta, rules: RuleSet | None = None, case_policy: int = 1
) -> tuple[str, list[str]]:
    """(CREATE TABLE ddl, compatibility notes) for one table."""
    compat: list[str] = []
    lines: list[str] = []
    for c in t.columns:
        target = resolve_type(t.schema, t.name, c, rules)
        string_typed = any(k in target for k in ("CHAR", "TEXT"))
        parts = [f"`{_case(c.name, case_policy)}`", target]
        if not c.nullable:
            parts.append("NOT NULL")
        if c.default is not None:
            parts.append(f"DEFAULT {rewrite_default_o2m(c.default, string_typed)}")
        if c.comment:
            parts.append("COMMENT '" + c.comment.replace("'", "''") + "'")
        lines.append("  " + " ".join(parts))

    for con in t.constraints:
        cols = ", ".join(f"`{_case(x, case_policy)}`" for x in con.columns)
        if con.ctype == "P":
            lines.append(f"  PRIMARY KEY ({cols})")
        elif con.ctype == "U":
            lines.append(f"  UNIQUE KEY `{con.name.lower()}` ({cols})")
        elif con.ctype == "R":
            rcols = ", ".join(f"`{_case(x, case_policy)}`" for x in con.r_columns)
            fk = (
                f"  CONSTRAINT `{con.name.lower()}` FOREIGN KEY ({cols}) "
                f"REFERENCES `{_case(con.r_table, case_policy)}` ({rcols})"
            )
            if con.delete_rule and con.delete_rule != "NO ACTION":
                fk += f" ON DELETE {con.delete_rule}"
            lines.append(fk)
        elif con.ctype == "C":
            cond = con.search_condition
            # standalone NOT NULL checks are already column attributes
            if cond and "IS NOT NULL" not in cond.upper():
                lines.append(f"  CONSTRAINT `{con.name.lower()}` CHECK ({cond})")

    for ix in t.indexes:
        if ix.index_type in INCOMPATIBLE_INDEX_TYPES:
            compat.append(
                f"-- index {ix.name} type {ix.index_type} on {t.name} "
                f"is not directly convertible; manual review required"
            )
            continue
        cols = ", ".join(f"`{_case(x, case_policy)}`" for x in ix.columns)
        kind = "UNIQUE KEY" if ix.unique else "KEY"
        lines.append(f"  {kind} `{ix.name.lower()}` ({cols})")

    tname = f"`{_case(t.name, case_policy)}`"
    ddl = f"CREATE TABLE {tname} (\n" + ",\n".join(lines) + "\n)"
    if t.comment:
        ddl += " COMMENT='" + t.comment.replace("'", "''") + "'"
    ddl += ";"
    return ddl, compat


def gen_create_table_spark(t: TableMeta, case_policy: int = 1) -> str:
    """Spark SQL DDL (lakehouse target) from the same catalog facts."""
    lines = []
    for c in t.columns:
        _, _, spark_t = map_oracle_type(c)
        null_s = "" if c.nullable else " NOT NULL"
        comment = f" COMMENT '{c.comment}'" if c.comment else ""
        lines.append(f"  {_case(c.name, case_policy)} {spark_t.simpleString().upper()}{null_s}{comment}")
    return (
        f"CREATE TABLE {_case(t.name, case_policy)} (\n"
        + ",\n".join(lines)
        + "\n) USING parquet;"
    )


def gen_create_table_oracle(
    t: TableMeta, target_schema: str = ""
) -> tuple[list[str], list[str]]:
    """M2O reverse: MySQL-typed catalog → Oracle DDL statements.

    Completes the reverse direction the reference implements in
    /root/reference/module/reverse/mysql/m2o/rule.go:46-613 (column gen
    390-550, keys 115-318, comments 365-388/551-588) — Oracle dialect:
    upper-case double-quoted identifiers, inline CONSTRAINT clauses,
    separate CREATE INDEX and COMMENT ON statements.

    Returns (statements, compatibility_notes). A table containing
    ENUM/SET columns is quarantined whole — Oracle has no equivalent
    (common/reverse.go:362 OracleIsNotSupportDataType) — mirroring the
    O2M quarantine flow rather than emitting lossy DDL.
    """
    from transferdb_spark.rules.datatypes import M2O_UNSUPPORTED, map_mysql_to_oracle_type
    from transferdb_spark.rules.defaults import rewrite_default_m2o

    schema = (target_schema or t.schema).upper()
    qtable = f'"{schema}"."{t.name.upper()}"'
    compat: list[str] = []

    bad = [c.name for c in t.columns if c.data_type.upper() in M2O_UNSUPPORTED]
    if bad:
        compat.append(
            f"-- table {t.name}: columns {', '.join(bad)} use ENUM/SET — "
            f"oracle has no equivalent (OracleIsNotSupportDataType); manual conversion required"
        )
        return [], compat

    lines: list[str] = []
    comments: list[str] = []
    for c in t.columns:
        otype = map_mysql_to_oracle_type(
            c.data_type,
            length=c.data_length or c.char_length,
            precision=c.data_precision if c.data_precision is not None else 10,
            scale=c.data_scale if c.data_scale is not None else 0,
        )
        parts = [f'"{c.name.upper()}"', otype]
        if c.default is not None:
            string_typed = any(k in otype for k in ("CHAR", "CLOB"))
            parts.append(f"DEFAULT {rewrite_default_m2o(c.default, string_typed)}")
        if not c.nullable:
            parts.append("NOT NULL")
        lines.append("  " + " ".join(parts))
        if c.comment:
            esc = c.comment.replace("'", "''")
            comments.append(f"COMMENT ON COLUMN {qtable}.\"{c.name.upper()}\" IS '{esc}';")

    for con in t.constraints:
        cols = ", ".join(f'"{x.upper()}"' for x in con.columns)
        cname = f'"{con.name.upper()}"'
        if con.ctype == "P":
            lines.append(f"  CONSTRAINT {cname} PRIMARY KEY ({cols})")
        elif con.ctype == "U":
            lines.append(f"  CONSTRAINT {cname} UNIQUE ({cols})")
        elif con.ctype == "R":
            rcols = ", ".join(f'"{x.upper()}"' for x in con.r_columns)
            fk = (
                f"  CONSTRAINT {cname} FOREIGN KEY ({cols}) "
                f'REFERENCES "{schema}"."{con.r_table.upper()}" ({rcols})'
            )
            if con.delete_rule and con.delete_rule != "NO ACTION":
                fk += f" ON DELETE {con.delete_rule}"
            lines.append(fk)
        elif con.ctype == "C" and con.search_condition:
            if "IS NOT NULL" not in con.search_condition.upper():
                lines.append(f"  CONSTRAINT {cname} CHECK ({con.search_condition})")

    stmts = [f"CREATE TABLE {qtable} (\n" + ",\n".join(lines) + "\n);"]
    for ix in t.indexes:
        cols = ", ".join(f'"{x.upper()}"' for x in ix.columns)
        kind = "CREATE UNIQUE INDEX" if ix.unique else "CREATE INDEX"
        stmts.append(f'{kind} "{ix.name.upper()}" ON {qtable} ({cols});')
    if t.comment:
        esc = t.comment.replace("'", "''")
        stmts.append(f"COMMENT ON TABLE {qtable} IS '{esc}';")
    stmts.extend(comments)
    return stmts, compat


def reverse_tables_m2o(
    catalog: dict[str, TableMeta], target_schema: str = ""
) -> ReverseResult:
    """Convert a MySQL-typed catalog to Oracle DDL; quarantine, never abort."""
    out = ReverseResult()
    for name, t in sorted(catalog.items()):
        try:
            stmts, compat = gen_create_table_oracle(t, target_schema)
            out.ddl.extend(stmts)
            out.compatibility.extend(compat)
        except Exception as e:  # error_log_detail semantics
            out.errors.append(f"{t.name}: {e}")
    return out


def reverse_tables(
    catalog: dict[str, TableMeta], rules: RuleSet | None = None, case_policy: int = 1
) -> ReverseResult:
    """Convert a whole catalog; quarantine incompatibles, never abort."""
    out = ReverseResult()
    for name, t in sorted(catalog.items()):
        try:
            if not t.is_compatible:
                out.compatibility.append(
                    f"-- table {t.name} type {t.table_type} requires manual conversion"
                )
                continue
            ddl, compat = gen_create_table_mysql(t, rules, case_policy)
            out.ddl.append(ddl)
            out.compatibility.extend(compat)
        except Exception as e:  # error_log_detail semantics
            out.errors.append(f"{t.name}: {e}")
    return out
