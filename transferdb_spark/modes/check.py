"""`check` mode — table-structure diff source vs target → fix-SQL (R6).

The reference compares columns/types/PK/UK/FK/CK/indexes/partitions/
charset+collation/comments between the converted expectation and the
actual target and emits ALTER fix-SQL
(/root/reference/module/check/oracle/o2m/diff.go:60-707): partition
type 60-85, table comment 87-109, table charset/collation 111-145,
column charset 147-234, column counts 236-290, PK/UK 292-334,
FK 336-372, CK 374-414, index 416-519, partitions 521-561.

Diff logic = dictionary full-outer compare on names (J3) plus
expected-type derivation via the same rule engine (R2 shares R1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from transferdb_spark.catalog.meta import TableMeta
from transferdb_spark.rules.resolution import RuleSet, resolve_type


@dataclass
class CheckResult:
    table: str
    missing_columns: list[str] = field(default_factory=list)  # in src, not tgt
    extra_columns: list[str] = field(default_factory=list)  # in tgt, not src
    type_mismatches: list[tuple[str, str, str]] = field(default_factory=list)
    nullability_mismatches: list[tuple[str, bool, bool]] = field(default_factory=list)
    missing_indexes: list[str] = field(default_factory=list)
    pk_mismatch: tuple[tuple[str, ...], tuple[str, ...]] | None = None
    # R6 depth facets (diff.go:60-561)
    missing_uniques: list[tuple[str, ...]] = field(default_factory=list)
    missing_fks: list[str] = field(default_factory=list)
    extra_fks: list[str] = field(default_factory=list)
    missing_checks: list[str] = field(default_factory=list)
    comment_mismatch: tuple[str, str] | None = None
    column_comment_mismatches: list[tuple[str, str, str]] = field(default_factory=list)
    collation_mismatch: tuple[str, str] | None = None  # (expected, actual)
    partition_mismatch: str = ""
    fix_sql: list[str] = field(default_factory=list)

    @property
    def is_clean(self) -> bool:
        return not (
            self.missing_columns
            or self.extra_columns
            or self.type_mismatches
            or self.nullability_mismatches
            or self.missing_indexes
            or self.pk_mismatch
            or self.missing_uniques
            or self.missing_fks
            or self.extra_fks
            or self.missing_checks
            or self.comment_mismatch
            or self.column_comment_mismatches
            or self.collation_mismatch
            or self.partition_mismatch
        )


def check_table(
    src: TableMeta,
    tgt: TableMeta,
    rules: RuleSet | None = None,
    tgt_types: dict[str, str] | None = None,
    dialect: str = "mysql",
) -> CheckResult:
    """Diff src (converted expectation) against tgt structure.

    tgt_types overrides the target's column->type map (when the target
    catalog carries its own dialect types — e.g. a live JDBC catalog
    read via catalog/jdbc_catalog); default derives both sides through
    the rule engine so parity holds on fixtures.

    dialect='ansi' renders the EXPECTED types through rules/ansi and
    emits ANSI/Derby fix-SQL (unquoted upper identifiers, ALTER COLUMN
    SET DATA TYPE, DROP CONSTRAINT) — the live-apply direction, where
    fix_sql must be directly executable over JDBC.

    PK columns are compared as NOT NULL on the source side regardless
    of the catalog flag: both MySQL (implicit conversion) and ANSI
    (hard requirement) make them NOT NULL on the target, and that is
    conversion, not drift.
    """
    ansi = dialect == "ansi"
    if ansi:
        from transferdb_spark.rules.ansi import ansi_type as _ty
    else:
        def _ty(x: str) -> str:
            return x

    def qi(name: str) -> str:
        return name.upper() if ansi else f"`{name.lower()}`"

    r = CheckResult(table=src.name)
    src_cols = {c.name.upper(): c for c in src.columns}
    tgt_cols = {c.name.upper(): c for c in tgt.columns}
    spk = tuple(src.primary_key.columns) if src.primary_key else ()
    spk_set = {c.upper() for c in spk}
    # same normalization on the target side: a catalog that still says
    # "nullable" for a declared-PK column describes the same structure
    # a live target reports as NOT NULL
    tpk_set = {c.upper() for c in (tuple(tgt.primary_key.columns) if tgt.primary_key else ())}
    tname_q = qi(tgt.name)

    for name in sorted(src_cols.keys() - tgt_cols.keys()):
        r.missing_columns.append(name)
        c = src_cols[name]
        target_type = _ty(resolve_type(src.schema, src.name, c, rules))
        null_s = "" if (c.nullable and name not in spk_set) else " NOT NULL"
        r.fix_sql.append(
            f"ALTER TABLE {tname_q} ADD COLUMN {qi(name)} {target_type}{null_s};"
        )

    for name in sorted(tgt_cols.keys() - src_cols.keys()):
        r.extra_columns.append(name)
        r.fix_sql.append(f"ALTER TABLE {tname_q} DROP COLUMN {qi(name)};")

    for name in sorted(src_cols.keys() & tgt_cols.keys()):
        s, t = src_cols[name], tgt_cols[name]
        expected = _ty(resolve_type(src.schema, src.name, s, rules))
        actual = (tgt_types or {}).get(name) or _ty(
            resolve_type(tgt.schema, tgt.name, t, rules)
        )
        if expected != actual:
            r.type_mismatches.append((name, expected, actual))
            null_s = "" if (s.nullable and name not in spk_set) else " NOT NULL"
            if ansi:
                r.fix_sql.append(
                    f"ALTER TABLE {tname_q} ALTER COLUMN {qi(name)} SET DATA TYPE {expected};"
                )
            else:
                r.fix_sql.append(
                    f"ALTER TABLE {tname_q} MODIFY COLUMN {qi(name)} {expected}{null_s};"
                )
        s_null = s.nullable and name not in spk_set
        t_null = t.nullable and name not in tpk_set
        if s_null != t_null:
            r.nullability_mismatches.append((name, s_null, t_null))
            if ansi:
                # SET DATA TYPE never changes nullability — Derby's
                # ALTER COLUMN [NOT] NULL is the dedicated statement
                r.fix_sql.append(
                    f"ALTER TABLE {tname_q} ALTER COLUMN {qi(name)} "
                    f"{'NULL' if s_null else 'NOT NULL'};"
                )
            elif expected == actual:
                # the type-mismatch MODIFY above already carries the
                # source nullability; matched types need their own
                r.fix_sql.append(
                    f"ALTER TABLE {tname_q} MODIFY COLUMN {qi(name)} "
                    f"{expected}{'' if s_null else ' NOT NULL'};"
                )

    tpk = tuple(tgt.primary_key.columns) if tgt.primary_key else ()
    if spk != tpk:
        r.pk_mismatch = (spk, tpk)
        if tpk:
            r.fix_sql.append(f"ALTER TABLE {tname_q} DROP PRIMARY KEY;")
        if spk:
            cols = ", ".join(qi(c) for c in spk)
            r.fix_sql.append(f"ALTER TABLE {tname_q} ADD PRIMARY KEY ({cols});")

    # index diff: by name, with a COLUMN-SET fallback — live catalogs
    # report system-named backing indexes (Derby shares the physical
    # conglomerate between an FK's backing index and a same-column
    # user index, surfacing only the SQL... name), so "an index
    # covering these columns exists, unique-compatible" is the
    # functional presence test (same stance as the name-independent
    # UK diff, diff.go:292-334)
    src_ix = {i.name.upper(): i for i in src.indexes}
    tgt_ix = {i.name.upper(): i for i in tgt.indexes}
    tgt_ix_cols = {(tuple(i.columns), i.unique) for i in tgt.indexes}
    for name in sorted(src_ix.keys() - tgt_ix.keys()):
        ix = src_ix[name]
        covered = (tuple(ix.columns), True) in tgt_ix_cols or (
            not ix.unique and (tuple(ix.columns), False) in tgt_ix_cols
        )
        if covered:
            continue
        r.missing_indexes.append(name)
        cols = ", ".join(qi(c) for c in ix.columns)
        kind = "UNIQUE INDEX" if ix.unique else "INDEX"
        r.fix_sql.append(f"CREATE {kind} {qi(name)} ON {tname_q} ({cols});")

    tname = tgt.name.lower()

    # UK diff by column set, name-independent (diff.go:292-334)
    def _uniques(t: TableMeta) -> set[tuple[str, ...]]:
        return {tuple(c.columns) for c in t.constraints if c.ctype == "U"}

    for cols in sorted(_uniques(src) - _uniques(tgt)):
        r.missing_uniques.append(cols)
        col_list = ", ".join(qi(c) for c in cols)
        r.fix_sql.append(f"ALTER TABLE {tname_q} ADD UNIQUE ({col_list});")

    # FK diff keyed on (columns, referenced table/columns, delete rule)
    # (diff.go:336-372 — the reference ADDs missing FKs; extras are
    # recorded for the report, dropped only by name when known)
    def _fks(t: TableMeta) -> dict[tuple, str]:
        return {
            (tuple(c.columns), c.r_table.upper(), tuple(c.r_columns), c.delete_rule): c.name
            for c in t.constraints
            if c.ctype == "R"
        }

    sfk, tfk = _fks(src), _fks(tgt)
    for key in sorted(sfk.keys() - tfk.keys()):
        cols, r_table, r_cols, rule = key
        r.missing_fks.append(sfk[key])
        col_list = ", ".join(qi(c) for c in cols)
        ref_list = ", ".join(qi(c) for c in r_cols)
        on_del = "" if (ansi and rule == "NO ACTION") else f" ON DELETE {rule}"
        r.fix_sql.append(
            f"ALTER TABLE {tname_q} ADD FOREIGN KEY ({col_list}) "
            f"REFERENCES {qi(r_table)} ({ref_list}){on_del};"
        )
    for key in sorted(tfk.keys() - sfk.keys()):
        r.extra_fks.append(tfk[key])
        drop = "CONSTRAINT" if ansi else "FOREIGN KEY"
        r.fix_sql.append(f"ALTER TABLE {tname_q} DROP {drop} {qi(tfk[key])};")

    # CK diff on normalized condition text (diff.go:374-414)
    def _checks(t: TableMeta) -> set[str]:
        return {
            " ".join(c.search_condition.split()).upper()
            for c in t.constraints
            if c.ctype == "C" and c.search_condition
        }

    for cond in sorted(_checks(src) - _checks(tgt)):
        r.missing_checks.append(cond)
        r.fix_sql.append(
            f"ALTER TABLE `{tname}` ADD CONSTRAINT `{tname}_check_key` CHECK ({cond});"
        )

    # partition facet (diff.go:60-85, 521-561): a type/key divergence is
    # not ALTER-able online — the reference emits a manual-intervention
    # suggestion, not SQL
    if (src.table_type == "PARTITIONED") != (tgt.table_type == "PARTITIONED"):
        r.partition_mismatch = (
            f"partition type mismatch: source={src.table_type} target={tgt.table_type}"
            " — manual intervention required"
        )
        r.fix_sql.append(f"-- {r.partition_mismatch}")
    elif src.table_type == "PARTITIONED" and (
        src.partition_type != tgt.partition_type or src.partition_keys != tgt.partition_keys
    ):
        r.partition_mismatch = (
            f"partition layout differs: source {src.partition_type}{src.partition_keys} "
            f"vs target {tgt.partition_type}{tgt.partition_keys} — manual intervention required"
        )
        r.fix_sql.append(f"-- {r.partition_mismatch}")

    # table comment (diff.go:87-109)
    if src.comment != tgt.comment:
        r.comment_mismatch = (src.comment, tgt.comment)
        esc = src.comment.replace("'", "''")
        r.fix_sql.append(f"ALTER TABLE `{tname}` COMMENT '{esc}';")

    # column comments (gathered with columns in the reference's catalog
    # read, DBA_COL_COMMENTS join at database/oracle/reverse.go:548-571)
    for name in sorted(src_cols.keys() & tgt_cols.keys()):
        s, t = src_cols[name], tgt_cols[name]
        if s.comment != t.comment:
            r.column_comment_mismatches.append((name, s.comment, t.comment))
            expected = resolve_type(src.schema, src.name, s, rules)
            esc = s.comment.replace("'", "''")
            r.fix_sql.append(
                f"ALTER TABLE `{tname}` MODIFY COLUMN `{name.lower()}` {expected} COMMENT '{esc}';"
            )

    # charset/collation (diff.go:111-145): expected target collation is
    # the R8 mapping of the source's Oracle collation class onto the
    # target charset
    if src.collation and tgt.charset:
        from transferdb_spark.rules.collation import oracle_to_mysql_collation

        expected_coll = oracle_to_mysql_collation(src.collation, tgt.charset)
        actual_coll = (tgt.collation or "").upper()
        if actual_coll and actual_coll != expected_coll:
            r.collation_mismatch = (expected_coll, actual_coll)
            r.fix_sql.append(
                f"ALTER TABLE `{tname}` CHARACTER SET {tgt.charset.lower()} "
                f"COLLATE {expected_coll.lower()};"
            )

    return r


def _mysql_col_to_oracle_type(c) -> str:
    """Expected Oracle type for a MySQL-typed catalog column — the
    repo's twin of the reference's 488-LoC expected-type oracle
    (module/check/mysql/public/mapping_oracle.go)."""
    from transferdb_spark.rules.datatypes import map_mysql_to_oracle_type

    return map_mysql_to_oracle_type(
        c.data_type,
        length=c.data_length or c.char_length or 0,
        precision=c.data_precision if c.data_precision is not None else 10,
        scale=c.data_scale if c.data_scale is not None else 0,
    )


def check_table_m2o(src: TableMeta, tgt: TableMeta) -> CheckResult:
    """M2O struct check: MySQL source expectation vs actual Oracle
    target, fix-SQL in Oracle dialect (module/check/mysql/m2o/diff.go:
    column counts 247-294, column type 535+, charset/collation
    151-246, PK/UK 296-338).

    src carries MySQL types (OracleColumn reused as a dialect-neutral
    carrier), tgt carries Oracle types; the expected Oracle type is
    derived from src via the M2O mapping and compared against the
    target's declared type. ENUM/SET source columns are not
    expressible in Oracle — reported as a mismatch note, no fix SQL.
    """
    r = CheckResult(table=src.name)
    qt = f'"{tgt.schema.upper()}"."{tgt.name.upper()}"'
    src_cols = {c.name.upper(): c for c in src.columns}
    tgt_cols = {c.name.upper(): c for c in tgt.columns}

    for name in sorted(src_cols.keys() - tgt_cols.keys()):
        r.missing_columns.append(name)
        c = src_cols[name]
        try:
            otype = _mysql_col_to_oracle_type(c)
        except ValueError as e:
            r.fix_sql.append(f"-- column {name}: {e}")
            continue
        null_s = "" if c.nullable else " NOT NULL"
        r.fix_sql.append(f'ALTER TABLE {qt} ADD "{name}" {otype}{null_s};')

    for name in sorted(tgt_cols.keys() - src_cols.keys()):
        r.extra_columns.append(name)
        r.fix_sql.append(f'ALTER TABLE {qt} DROP COLUMN "{name}";')

    for name in sorted(src_cols.keys() & tgt_cols.keys()):
        s, t = src_cols[name], tgt_cols[name]
        try:
            expected = _mysql_col_to_oracle_type(s)
        except ValueError as e:
            r.type_mismatches.append((name, f"<{s.data_type}>", t.data_type.upper()))
            r.fix_sql.append(f"-- column {name}: {e}")
            continue
        actual = _render_oracle_type(t)
        if expected != actual:
            r.type_mismatches.append((name, expected, actual))
            r.fix_sql.append(f'ALTER TABLE {qt} MODIFY "{name}" {expected};')
        if s.nullable != t.nullable:
            r.nullability_mismatches.append((name, s.nullable, t.nullable))
            mod = "NULL" if s.nullable else "NOT NULL"
            r.fix_sql.append(f'ALTER TABLE {qt} MODIFY "{name}" {mod};')

    spk = tuple(x.upper() for x in src.primary_key.columns) if src.primary_key else ()
    tpk = tuple(x.upper() for x in tgt.primary_key.columns) if tgt.primary_key else ()
    if spk != tpk:
        r.pk_mismatch = (spk, tpk)
        if tpk and tgt.primary_key is not None:
            r.fix_sql.append(
                f'ALTER TABLE {qt} DROP CONSTRAINT "{tgt.primary_key.name.upper()}";'
            )
        if spk:
            cols = ", ".join(f'"{c}"' for c in spk)
            r.fix_sql.append(
                f'ALTER TABLE {qt} ADD CONSTRAINT "PK_{tgt.name.upper()}" PRIMARY KEY ({cols});'
            )

    # collation facet: the MySQL source collation maps to an Oracle
    # collation class (BINARY_CS/CI/AI); divergence is reported with an
    # ALTER ... DEFAULT COLLATION suggestion (12.2+ only — the
    # reference renders a suggestion table, diff.go:115-149)
    if src.collation and tgt.collation:
        from transferdb_spark.rules.collation import mysql_to_oracle_collation

        try:
            expected_coll = mysql_to_oracle_collation(src.collation)
        except ValueError as e:
            # quarantine-never-abort: an unmapped source collation
            # (utf8mb4_0900_ai_ci, latin1_swedish_ci, ...) is a
            # per-table finding, not a run-killer
            r.collation_mismatch = (f"<unmapped: {src.collation}>", tgt.collation.upper())
            r.fix_sql.append(f"-- collation facet skipped: {e}")
            return r
        actual_coll = tgt.collation.upper()
        if actual_coll != expected_coll:
            r.collation_mismatch = (expected_coll, actual_coll)
            r.fix_sql.append(
                f"-- expected oracle collation class {expected_coll}, found {actual_coll}"
                f" (ALTER TABLE {qt} DEFAULT COLLATION requires 12.2+ MAX_STRING_SIZE)"
            )
    return r


def _render_oracle_type(c) -> str:
    """Declared Oracle type string from catalog column facts, matching
    the M2O mapper's rendering so equal types compare equal."""
    dt = c.data_type.upper()
    if dt == "NUMBER":
        p = c.data_precision
        s = c.data_scale or 0
        if p is None:
            return "NUMBER"
        # always render the scale so NUMBER(19,0) from the M2O mapper
        # compares equal to a catalog's NUMBER(19)
        return f"NUMBER({p},{s})"
    if dt in ("VARCHAR2", "NVARCHAR2", "CHAR", "NCHAR", "RAW"):
        ln = c.data_length or c.char_length or 0
        return f"{dt}({ln})" if ln else dt
    if dt.startswith("TIMESTAMP"):
        return dt if "(" in dt else f"TIMESTAMP({c.data_scale if c.data_scale is not None else 6})"
    return dt


def check_catalogs(
    src: dict[str, TableMeta],
    tgt: dict[str, TableMeta],
    rules: RuleSet | None = None,
    direction: str = "o2m",
    dialect: str = "mysql",
    tgt_types_by_table: dict[str, dict[str, str]] | None = None,
) -> dict[str, CheckResult]:
    """Diff every common table; missing target tables get full DDL need.

    direction='o2m' (default): Oracle source vs MySQL target, MySQL
    fix-SQL. direction='m2o': MySQL source vs Oracle target, Oracle
    fix-SQL via the M2O expected-type oracle (check/mysql/m2o).
    dialect='ansi' + tgt_types_by_table (from catalog/jdbc_catalog
    rendered_types) is the LIVE-target check: expected types rendered
    through rules/ansi against the introspected dialect types."""
    out = {}
    for name in sorted(src):
        if name in tgt:
            out[name] = (
                check_table_m2o(src[name], tgt[name])
                if direction == "m2o"
                else check_table(
                    src[name],
                    tgt[name],
                    rules,
                    tgt_types=(tgt_types_by_table or {}).get(name),
                    dialect=dialect,
                )
            )
        else:
            r = CheckResult(table=name)
            r.missing_columns = [c.name for c in src[name].columns]
            r.fix_sql.append(f"-- table {name} missing on target: run reverse mode")
            out[name] = r
    return out
