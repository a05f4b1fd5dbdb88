"""`check` mode — table-structure diff source vs target → fix-SQL (R6).

The reference compares columns/types/PK/UK/FK/CK/indexes/comments
between the converted expectation and the actual target and emits
ALTER fix-SQL (/root/reference/module/check/oracle/o2m/diff.go:60-707).

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
        )


def check_table(
    src: TableMeta,
    tgt: TableMeta,
    rules: RuleSet | None = None,
    tgt_types: dict[str, str] | None = None,
) -> CheckResult:
    """Diff src (converted expectation) against tgt structure.

    tgt_types overrides the target's column->type map (when the target
    catalog carries its own dialect types); default derives both sides
    through the rule engine so parity holds on fixtures.
    """
    r = CheckResult(table=src.name)
    src_cols = {c.name.upper(): c for c in src.columns}
    tgt_cols = {c.name.upper(): c for c in tgt.columns}

    for name in sorted(src_cols.keys() - tgt_cols.keys()):
        r.missing_columns.append(name)
        c = src_cols[name]
        target_type = resolve_type(src.schema, src.name, c, rules)
        null_s = "" if c.nullable else " NOT NULL"
        r.fix_sql.append(f"ALTER TABLE `{tgt.name.lower()}` ADD COLUMN `{name.lower()}` {target_type}{null_s};")

    for name in sorted(tgt_cols.keys() - src_cols.keys()):
        r.extra_columns.append(name)
        r.fix_sql.append(f"ALTER TABLE `{tgt.name.lower()}` DROP COLUMN `{name.lower()}`;")

    for name in sorted(src_cols.keys() & tgt_cols.keys()):
        s, t = src_cols[name], tgt_cols[name]
        expected = resolve_type(src.schema, src.name, s, rules)
        actual = (tgt_types or {}).get(name) or resolve_type(tgt.schema, tgt.name, t, rules)
        if expected != actual:
            r.type_mismatches.append((name, expected, actual))
            null_s = "" if s.nullable else " NOT NULL"
            r.fix_sql.append(
                f"ALTER TABLE `{tgt.name.lower()}` MODIFY COLUMN `{name.lower()}` {expected}{null_s};"
            )
        if s.nullable != t.nullable:
            r.nullability_mismatches.append((name, s.nullable, t.nullable))

    spk = tuple(src.primary_key.columns) if src.primary_key else ()
    tpk = tuple(tgt.primary_key.columns) if tgt.primary_key else ()
    if spk != tpk:
        r.pk_mismatch = (spk, tpk)
        if tpk:
            r.fix_sql.append(f"ALTER TABLE `{tgt.name.lower()}` DROP PRIMARY KEY;")
        if spk:
            cols = ", ".join(f"`{c.lower()}`" for c in spk)
            r.fix_sql.append(f"ALTER TABLE `{tgt.name.lower()}` ADD PRIMARY KEY ({cols});")

    src_ix = {i.name.upper(): i for i in src.indexes}
    tgt_ix = {i.name.upper(): i for i in tgt.indexes}
    for name in sorted(src_ix.keys() - tgt_ix.keys()):
        r.missing_indexes.append(name)
        ix = src_ix[name]
        cols = ", ".join(f"`{c.lower()}`" for c in ix.columns)
        kind = "UNIQUE INDEX" if ix.unique else "INDEX"
        r.fix_sql.append(f"CREATE {kind} `{name.lower()}` ON `{tgt.name.lower()}` ({cols});")

    return r


def check_catalogs(
    src: dict[str, TableMeta], tgt: dict[str, TableMeta], rules: RuleSet | None = None
) -> dict[str, CheckResult]:
    """Diff every common table; missing target tables get full DDL need."""
    out = {}
    for name in sorted(src):
        if name in tgt:
            out[name] = check_table(src[name], tgt[name], rules)
        else:
            r = CheckResult(table=name)
            r.missing_columns = [c.name for c in src[name].columns]
            r.fix_sql.append(f"-- table {name} missing on target: run reverse mode")
            out[name] = r
    return out
