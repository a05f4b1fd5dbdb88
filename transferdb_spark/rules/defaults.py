"""R4/F6 — default-value rewrite between dialects.

(/root/reference/common/buildin.go:22-43; quoting logic
module/reverse/oracle/public/change.go:263-384.)
"""

from __future__ import annotations

O2M_DEFAULTS = {
    "SYSDATE": "NOW()",
    "SYS_GUID()": "UUID()",
    "": "NULL",
}

M2O_DEFAULTS = {
    "CURRENT_TIMESTAMP": "SYSDATE",
    "NULL": "NULL",
}


def _rewrite(value: str | None, mapping: dict[str, str], string_typed: bool) -> str:
    if value is None:
        return "NULL"
    v = value.strip()
    if v.upper() in mapping or v in mapping:
        return mapping.get(v.upper(), mapping.get(v, "NULL"))
    # literal defaults: string-typed columns keep/gain quotes, others pass raw
    if string_typed:
        if v.startswith("'") and v.endswith("'"):
            return v
        return "'" + v.replace("'", "''") + "'"
    return v


def rewrite_default_o2m(value: str | None, string_typed: bool = False) -> str:
    return _rewrite(value, {k.upper(): v for k, v in O2M_DEFAULTS.items()}, string_typed)


def rewrite_default_m2o(value: str | None, string_typed: bool = False) -> str:
    return _rewrite(value, M2O_DEFAULTS, string_typed)
