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


def gen_create_table_ansi(
    t: TableMeta, rules: RuleSet | None = None
) -> tuple[str, list[str], list[str], list[str]]:
    """ANSI/Derby-dialect DDL for the LIVE-APPLY path — the direct-DB
    branch of the reference's writer (/root/reference/module/reverse/
    write.go:40-140 RWriteDB executes DDL against the target instead
    of writing files).

    Returns (create_stmt, index_stmts, fk_stmts, compat_notes) as
    SEPARATE statements: JDBC executeUpdate takes one statement at a
    time, and FK ALTERs must run after EVERY table exists (the caller
    orders creates < indexes < FKs across the catalog, dissolving
    cross-table dependency ordering).

    PK columns are forced NOT NULL (ANSI requires it; MySQL does the
    same conversion implicitly) — the structure check applies the same
    normalization, so this is not drift. Comments and function
    defaults are quarantined (Derby has no COMMENT syntax)."""
    from transferdb_spark.rules.ansi import ansi_type

    compat: list[str] = []
    pk = t.primary_key
    pk_set = set(pk.columns) if pk else set()
    lines: list[str] = []
    for c in t.columns:
        target = ansi_type(resolve_type(t.schema, t.name, c, rules))
        parts = [_case(c.name, 2), target]
        if not c.nullable or c.name.upper() in pk_set:
            parts.append("NOT NULL")
        if c.default is not None:
            if any(ch in c.default for ch in "()"):
                compat.append(
                    f"-- column {t.name}.{c.name} function default "
                    f"{c.default!r} requires manual conversion"
                )
            else:
                parts.append(f"DEFAULT {c.default}")
        if c.comment:
            compat.append(
                f"-- column comment on {t.name}.{c.name} not expressible in ANSI DDL"
            )
        lines.append("  " + " ".join(parts))

    fk_stmts: list[str] = []
    tname = _case(t.name, 2)
    for con in t.constraints:
        cols = ", ".join(_case(x, 2) for x in con.columns)
        if con.ctype == "P":
            lines.append(f"  PRIMARY KEY ({cols})")
        elif con.ctype == "U":
            lines.append(f"  CONSTRAINT {con.name.upper()} UNIQUE ({cols})")
        elif con.ctype == "R":
            rcols = ", ".join(_case(x, 2) for x in con.r_columns)
            fk = (
                f"ALTER TABLE {tname} ADD CONSTRAINT {con.name.upper()} "
                f"FOREIGN KEY ({cols}) REFERENCES {_case(con.r_table, 2)} ({rcols})"
            )
            if con.delete_rule and con.delete_rule != "NO ACTION":
                fk += f" ON DELETE {con.delete_rule}"
            fk_stmts.append(fk)
        elif con.ctype == "C":
            cond = con.search_condition
            if cond and "IS NOT NULL" not in cond.upper():
                lines.append(f"  CONSTRAINT {con.name.upper()} CHECK ({cond})")

    index_stmts: list[str] = []
    for ix in t.indexes:
        if ix.index_type in INCOMPATIBLE_INDEX_TYPES:
            compat.append(
                f"-- index {ix.name} type {ix.index_type} on {t.name} "
                f"is not directly convertible; manual review required"
            )
            continue
        cols = ", ".join(_case(x, 2) for x in ix.columns)
        kind = "CREATE UNIQUE INDEX" if ix.unique else "CREATE INDEX"
        index_stmts.append(f"{kind} {ix.name.upper()} ON {tname} ({cols})")

    if t.comment:
        compat.append(f"-- table comment on {t.name} not expressible in ANSI DDL")
    create = f"CREATE TABLE {tname} (\n" + ",\n".join(lines) + "\n)"
    return create, index_stmts, fk_stmts, compat


def reverse_tables_ansi(
    catalog: dict[str, TableMeta], rules: RuleSet | None = None
) -> ReverseResult:
    """Catalog → ordered, directly-executable ANSI statement list:
    every CREATE TABLE first, then indexes, then FK ALTERs — so the
    statements apply in emission order regardless of FK topology.
    Incompatibles quarantine, failures accumulate, never abort."""
    out = ReverseResult()
    creates: list[str] = []
    indexes: list[str] = []
    fks: list[str] = []
    for name, t in sorted(catalog.items()):
        try:
            if not t.is_compatible:
                out.compatibility.append(
                    f"-- table {t.name} type {t.table_type} requires manual conversion"
                )
                continue
            c, ix, fk, compat = gen_create_table_ansi(t, rules)
            creates.append(c)
            indexes.extend(ix)
            fks.extend(fk)
            out.compatibility.extend(compat)
        except Exception as e:  # error_log_detail semantics
            out.errors.append(f"{t.name}: {e}")
    out.ddl = creates + indexes + fks
    return out


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


# Source-charset → Oracle-charset maps (common/reverse.go:118-129).
# The TiDB map is strictly narrower than MySQL's: TiDB only ships
# utf8/utf8mb4/gbk server charsets, so big5/gb18030 sources that M2O
# converts are a T2O quarantine.
M2O_CHARSET_TO_ORACLE = {
    "UTF8MB4": "AL32UTF8",
    "UTF8": "AL32UTF8",
    "BIG5": "ZHT16BIG5",
    "GBK": "ZHS16GBK",
    "GB18030": "ZHS32GB18030",
}
T2O_CHARSET_TO_ORACLE = {
    "UTF8MB4": "AL32UTF8",
    "UTF8": "AL32UTF8",
    "GBK": "ZHS16GBK",
}


def _reverse_tables_to_oracle(
    catalog: dict[str, TableMeta],
    target_schema: str,
    charset_map: dict[str, str],
    dialect: str,
) -> ReverseResult:
    """Shared M2O/T2O driver: Oracle DDL per table, with the source
    charset/collation validated against the direction's map — an
    unrepresentable table quarantines whole (reference
    module/reverse/mysql/t2o/table.go:757-834 emits the same
    'charset/collation currently isn't support' compatibility note)."""
    out = ReverseResult()
    for name, t in sorted(catalog.items()):
        try:
            cs = (t.charset or "").upper().replace("-", "")
            if cs and cs not in charset_map:
                out.compatibility.append(
                    f"-- table {t.name}: {dialect} source charset {t.charset} has no "
                    f"oracle mapping in this direction; manual conversion required"
                )
                continue
            if t.collation:
                from transferdb_spark.rules.collation import mysql_to_oracle_collation

                try:
                    mysql_to_oracle_collation(t.collation)
                except ValueError:
                    out.compatibility.append(
                        f"-- table {t.name}: {dialect} collation {t.collation} not "
                        f"supported toward oracle; manual conversion required"
                    )
                    continue
            stmts, compat = gen_create_table_oracle(t, target_schema)
            out.ddl.extend(stmts)
            out.compatibility.extend(compat)
        except Exception as e:  # error_log_detail semantics
            out.errors.append(f"{t.name}: {e}")
    return out


def reverse_tables_m2o(
    catalog: dict[str, TableMeta], target_schema: str = ""
) -> ReverseResult:
    """Convert a MySQL-typed catalog to Oracle DDL; quarantine, never
    abort (module/reverse/mysql/m2o)."""
    return _reverse_tables_to_oracle(catalog, target_schema, M2O_CHARSET_TO_ORACLE, "mysql")


def reverse_tables_t2o(
    catalog: dict[str, TableMeta], target_schema: str = ""
) -> ReverseResult:
    """T2O: TiDB-typed catalog → Oracle DDL. Same generation flow as
    M2O (the reference's t2o package is the m2o flow re-keyed to the
    TaskTypeTiDB2Oracle lookup tables, module/reverse/mysql/t2o/
    rule.go:401,426) with the narrower TiDB charset surface — only
    utf8/utf8mb4/gbk sources convert; anything else quarantines."""
    return _reverse_tables_to_oracle(catalog, target_schema, T2O_CHARSET_TO_ORACLE, "tidb")


# TiDB's clustered-index integer family — a single-column PK of these
# types is already clustered by rowid, so SHARD_ROW_ID_BITS-style table
# options don't apply (common/reverse.go:54 TiDBIntegerPrimaryKeyList)
TIDB_INTEGER_PK_TYPES = ("TINYINT", "SMALLINT", "INT", "BIGINT", "DECIMAL")


@dataclass(frozen=True)
class TiDBReverseConfig:
    """O2T routing knobs (reverse/oracle/o2t/reverse.go:139-188 +
    example/config.toml [schema-config]).

    clustered_tables: struct-clustered-config — force `PRIMARY KEY ...
      CLUSTERED` when a PK exists (no PK → falls back to the global
      table option, with a compatibility note).
    nonclustered_tables: struct-nonclustered-config — table →
      per-table option (e.g. "SHARD_ROW_ID_BITS = 6 PRE_SPLIT_REGIONS
      = 6"); emits `PRIMARY KEY ... NONCLUSTERED`.
    clustered_index: downstream tidb_enable_clustered_index — ON
      (global clustered, table options disabled), OFF (global
      non-clustered, options enabled), INT_ONLY (routed by
      alter_primary_key + integer-PK shape, o2t/rule.go:263-360).
    alter_primary_key: the tidb config value for the INT_ONLY branch;
      None = not present in config (options disabled).
    """

    clustered_tables: frozenset = frozenset()
    nonclustered_tables: dict = field(default_factory=dict)
    global_table_option: str = ""
    clustered_index: str = "INT_ONLY"
    alter_primary_key: bool | None = None
    charset: str = "utf8mb4"
    collation: str = "utf8mb4_bin"

    def __post_init__(self):
        overlap = {t.upper() for t in self.clustered_tables} & {
            t.upper() for t in self.nonclustered_tables
        }
        if overlap:
            # reference refuses the ambiguous config outright
            # (o2t/reverse.go:159-162)
            raise ValueError(
                f"tables in both clustered and nonclustered config: {sorted(overlap)}"
            )


def _tidb_table_option_applies(cfg: TiDBReverseConfig, t: TableMeta, rules) -> bool:
    """Does the global table option belong on this table's suffix?
    (o2t/rule.go:263-360 — the tidb_enable_clustered_index dance.)"""
    mode = cfg.clustered_index.upper()
    if mode == "OFF":
        return True
    if mode == "ON":
        return False
    # INT_ONLY / unset: governed by alter-primary-key + PK shape
    if cfg.alter_primary_key is None:
        return False
    pk = t.primary_key
    single_int_pk = False
    if pk and len(pk.columns) == 1:
        col = next((c for c in t.columns if c.name.upper() == pk.columns[0].upper()), None)
        if col is not None:
            target = resolve_type(t.schema, t.name, col, rules)
            base = target.split("(")[0].strip().upper()
            single_int_pk = base in TIDB_INTEGER_PK_TYPES
    if not cfg.alter_primary_key and single_int_pk:
        return False  # rowid-clustered integer PK: option has no effect
    return True


def gen_create_table_tidb(
    t: TableMeta,
    cfg: TiDBReverseConfig,
    rules: RuleSet | None = None,
    case_policy: int = 1,
) -> tuple[list[str], list[str]]:
    """O2T: (statements, compatibility notes) in TiDB dialect.

    Differences from the MySQL renderer (o2t/ddl.go:180-236):
    - PK carries CLUSTERED / NONCLUSTERED per the routing config
      (o2t/rule.go:388-400).
    - FOREIGN KEY and CHECK constraints are emitted as ALTER TABLE
      statements in the COMPATIBILITY output — TiDB parses but does
      not enforce them (ddl.go:218 'TiDB 增加不兼容性语句').
    - The table suffix appends SHARD_ROW_ID_BITS-style options when
      the clustered-index mode allows (rule.go:263-360).
    """
    compat: list[str] = []
    lines: list[str] = []
    tname_u = t.name.upper()
    tname = f"`{_case(t.name, case_policy)}`"

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

    is_nonclustered = tname_u in {x.upper() for x in cfg.nonclustered_tables}
    is_clustered = tname_u in {x.upper() for x in cfg.clustered_tables}
    pk = t.primary_key
    if is_clustered and pk is None:
        compat.append(
            f"-- table {t.name}: struct-clustered-config but no primary key; "
            f"global table option used instead"
        )
        is_clustered = False

    for con in t.constraints:
        cols = ", ".join(f"`{_case(x, case_policy)}`" for x in con.columns)
        if con.ctype == "P":
            suffix = " NONCLUSTERED" if is_nonclustered else (" CLUSTERED" if is_clustered else "")
            lines.append(f"  PRIMARY KEY ({cols}){suffix}")
        elif con.ctype == "U":
            lines.append(f"  UNIQUE KEY `{con.name.lower()}` ({cols})")
        elif con.ctype == "R":
            rcols = ", ".join(f"`{_case(x, case_policy)}`" for x in con.r_columns)
            fk = (
                f"CONSTRAINT `{con.name.lower()}` FOREIGN KEY ({cols}) "
                f"REFERENCES `{_case(con.r_table, case_policy)}` ({rcols})"
            )
            if con.delete_rule and con.delete_rule != "NO ACTION":
                fk += f" ON DELETE {con.delete_rule}"
            compat.append(f"ALTER TABLE {tname} ADD {fk};")
        elif con.ctype == "C":
            cond = con.search_condition
            if cond and "IS NOT NULL" not in cond.upper():
                compat.append(
                    f"ALTER TABLE {tname} ADD CONSTRAINT `{con.name.lower()}` CHECK ({cond});"
                )

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

    suffix = f"ENGINE=InnoDB DEFAULT CHARSET={cfg.charset} COLLATE={cfg.collation}"
    if is_nonclustered:
        opts = {k.upper(): v for k, v in cfg.nonclustered_tables.items()}
        opt = opts.get(tname_u, "")
        if opt:
            suffix += f" {opt.upper()}"
    elif not is_clustered and cfg.global_table_option and _tidb_table_option_applies(cfg, t, rules):
        suffix += f" {cfg.global_table_option.upper()}"

    ddl = f"CREATE TABLE {tname} (\n" + ",\n".join(lines) + f"\n) {suffix}"
    if t.comment:
        ddl += " COMMENT='" + t.comment.replace("'", "''") + "'"
    ddl += ";"
    return [ddl], compat


def reverse_tables_o2t(
    catalog: dict[str, TableMeta],
    cfg: TiDBReverseConfig | None = None,
    rules: RuleSet | None = None,
    case_policy: int = 1,
) -> ReverseResult:
    """O2T reverse: Oracle catalog → TiDB DDL; quarantine, never abort
    (reverse/oracle/o2t/reverse.go:139-188)."""
    cfg = cfg or TiDBReverseConfig()
    out = ReverseResult()
    for name, t in sorted(catalog.items()):
        try:
            if not t.is_compatible:
                out.compatibility.append(
                    f"-- table {t.name} type {t.table_type} requires manual conversion"
                )
                continue
            stmts, compat = gen_create_table_tidb(t, cfg, rules, case_policy)
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
