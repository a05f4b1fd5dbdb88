"""R3 — rule resolution with override precedence.

column > table > schema > builtin
(/root/reference/module/reverse/oracle/public/change.go:219-241;
rule tables database/meta/datatype_rule_*.go).

Rules are plain dicts (the reference stores them as meta-DB rows); at
runtime they'd be broadcast to executors if used inside expressions —
here they resolve at plan time in the driver, which is where the
reference also applies them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from transferdb_spark.rules.datatypes import OracleColumn, map_oracle_type


@dataclass
class RuleSet:
    """Layered type/default overrides, most-specific wins."""

    # {(schema, table, column): target_type}
    column_rules: dict[tuple[str, str, str], str] = field(default_factory=dict)
    # {(schema, table, source_type): target_type}
    table_rules: dict[tuple[str, str, str], str] = field(default_factory=dict)
    # {(schema, source_type): target_type}
    schema_rules: dict[tuple[str, str], str] = field(default_factory=dict)

    def normalized(self) -> "RuleSet":
        up = lambda t: tuple(x.upper() for x in t)  # noqa: E731
        return RuleSet(
            {up(k): v.upper() for k, v in self.column_rules.items()},
            {up(k): v.upper() for k, v in self.table_rules.items()},
            {up(k): v.upper() for k, v in self.schema_rules.items()},
        )


def resolve_type(schema: str, table: str, col: OracleColumn, rules: RuleSet | None = None) -> str:
    """Final target type for a column after override resolution."""
    origin, builtin_target, _ = map_oracle_type(col)
    if rules is None:
        return builtin_target
    r = rules.normalized()
    s, t, c = schema.upper(), table.upper(), col.name.upper()
    base_type = col.data_type.upper()
    if (s, t, c) in r.column_rules:
        return r.column_rules[(s, t, c)]
    if (s, t, base_type) in r.table_rules:
        return r.table_rules[(s, t, base_type)]
    if (s, base_type) in r.schema_rules:
        return r.schema_rules[(s, base_type)]
    return builtin_target
