"""ANSI/Derby dialect rewrite of the R1 target types (live-apply path).

The reference's writer can execute reverse DDL straight against the
target database instead of only writing files
(/root/reference/module/reverse/write.go:40-140, the direct-DB
branch). Our live integration target is embedded Apache Derby (the
only database in the container), whose SQL surface is close to ANSI —
so the rule engine's MySQL-dialect output gets ONE canonical rewrite
used by BOTH the DDL generator and the structure check: whatever the
generator emits is exactly what the checker expects back from the
live catalog, making "zero drift after apply" a string equality.

Derby constraints honored here (Derby reference manual, public docs):
- no TINYINT (smallest integer is SMALLINT)
- DECIMAL precision capped at 31
- no DATETIME type (TIMESTAMP)
- no TEXT/BLOB size tiers (CLOB/BLOB)
- binary types spell as CHAR/VARCHAR (n) FOR BIT DATA
- VARCHAR capped at 32672
"""

from __future__ import annotations

import re

_PAREN = re.compile(r"^([A-Z ]+?)\s*\((\d+)(?:\s*,\s*(\d+))?\)$")

ANSI_BASE = {
    "TINYINT": "SMALLINT",
    "INT": "INTEGER",
    "DATETIME": "TIMESTAMP",
    "FLOAT": "REAL",
    "DOUBLE": "DOUBLE",
    "TEXT": "CLOB",
    "TINYTEXT": "CLOB",
    "MEDIUMTEXT": "CLOB",
    "LONGTEXT": "CLOB",
    "TINYBLOB": "BLOB",
    "MEDIUMBLOB": "BLOB",
    "LONGBLOB": "BLOB",
}

DERBY_DECIMAL_MAX_PRECISION = 31
DERBY_VARCHAR_MAX = 32672


def ansi_type(mysql_type: str) -> str:
    """Rewrite one rule-engine (MySQL-dialect) type into its canonical
    ANSI/Derby form. Deterministic and total: unknown types pass
    through unchanged (the apply executor quarantines what the target
    then rejects, error_log_detail semantics)."""
    t = mysql_type.strip().upper()
    m = _PAREN.match(t)
    if not m:
        return ANSI_BASE.get(t, t)
    base, p_s, s_s = m.group(1).strip(), m.group(2), m.group(3)
    p = int(p_s)
    s = int(s_s) if s_s is not None else None
    if base in ("DECIMAL", "NUMERIC", "DEC"):
        p = min(p, DERBY_DECIMAL_MAX_PRECISION)
        s = min(s if s is not None else 0, p)
        return f"DECIMAL({p},{s})"
    if base == "DATETIME" or base == "TIMESTAMP":
        # Derby TIMESTAMP has fixed precision — the fractional-seconds
        # argument is not part of the type name
        return "TIMESTAMP"
    if base == "VARCHAR":
        return f"VARCHAR({min(p, DERBY_VARCHAR_MAX)})"
    if base == "CHAR":
        return f"CHAR({p})"
    if base == "VARBINARY":
        return f"VARCHAR ({p}) FOR BIT DATA"
    if base == "BINARY":
        return f"CHAR ({p}) FOR BIT DATA"
    if base in ANSI_BASE:
        # sized integer display widths (INT(11)) carry no semantics
        return ANSI_BASE[base]
    if base in ("TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT"):
        return ANSI_BASE.get(base, base)
    return f"{ANSI_BASE.get(base, base)}({p_s}{',' + s_s if s_s else ''})"
