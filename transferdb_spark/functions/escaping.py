"""F8/F10 — SQL-literal and CSV escaping (fix-SQL text generation).

Semantics from the reference (/root/reference/common/strings.go:453-521,
540-575): MySQL escaping backslash-prefixes every Unicode punctuation or
symbol rune EXCEPT '%' and '_' (LIKE wildcards are literal in MySQL
strings); Oracle escaping doubles single quotes only. CSV binary values
escape to hex. These run driver-side on repair/DDL text — never on the
distributed data path.
"""

from __future__ import annotations

import unicodedata


def _is_punct_or_symbol(ch: str) -> bool:
    return unicodedata.category(ch)[0] in ("P", "S")


def escape_mysql(s: str) -> str:
    """Backslash-escape punct/symbols except the LIKE wildcards % _ ."""
    out = []
    for ch in s:
        if _is_punct_or_symbol(ch) and ch not in ("%", "_"):
            out.append("\\")
        out.append(ch)
    return "".join(out)


def escape_oracle(s: str) -> str:
    """Oracle string literal: only ' doubles."""
    return s.replace("'", "''")


def escape_csv_binary(b: bytes | None, hex_prefix: str = "0x") -> str:
    """Binary cell → hex token for CSV export (strings.go:540-575)."""
    if b is None:
        return ""
    return hex_prefix + b.hex()


def compare_version(a: str, b: str) -> int:
    """F11 — ordinal version compare (strings.go:295-323): -1/0/1."""

    def parts(v: str) -> list[int]:
        out = []
        for p in v.strip().split("."):
            digits = "".join(c for c in p if c.isdigit())
            out.append(int(digits) if digits else 0)
        return out

    pa, pb = parts(a), parts(b)
    n = max(len(pa), len(pb))
    pa += [0] * (n - len(pa))
    pb += [0] * (n - len(pb))
    return (pa > pb) - (pa < pb)
