"""R8 — collation mapping between Oracle and MySQL dialects.

The reference ships a three-level literal map task-type → source
collation → target charset → target collation
(/root/reference/common/reverse.go:137-345). The structure underneath
is two axes — case sensitivity and accent sensitivity — crossed with
the charset family, so this module derives the same answers from those
axes instead of transcribing the table:

- Oracle 12.2+ column collations: BINARY_CS (case+accent sensitive —
  the default), BINARY_CI (case-insensitive, accent-sensitive — MySQL
  8.0 only), BINARY_AI (case- and accent-insensitive).
- CJK charsets (GBK/GB18030/Big5) have no accent-aware MySQL
  collations; both insensitive classes degrade to <charset>_CHINESE_CI
  exactly as the reference documents.

Metadata-only for the Spark engine (Spark compares binary UTF-8), but
reverse/check need it to emit and verify DDL.
"""

from __future__ import annotations

_UNICODE = {"UTF8MB4", "UTF8"}
_CJK = {"GBK", "GB18030", "BIG5"}


def oracle_to_mysql_collation(oracle_collation: str, target_charset: str) -> str:
    """Oracle column collation + MySQL charset -> MySQL collation."""
    coll = oracle_collation.upper()
    cs = target_charset.upper().replace("-", "")
    if cs not in _UNICODE | _CJK:
        raise ValueError(f"unsupported target charset: {target_charset!r}")
    if coll in ("BINARY_CS", "BINARY"):  # case+accent sensitive (default)
        return f"{cs}_BIN"
    if coll == "BINARY_CI":  # case-insensitive, accent-sensitive (MySQL 8.0)
        return f"{cs}_0900_AS_CI" if cs in _UNICODE else f"{cs}_CHINESE_CI"
    if coll == "BINARY_AI":  # case- and accent-insensitive
        return f"{cs}_GENERAL_CI" if cs in _UNICODE else f"{cs}_CHINESE_CI"
    raise ValueError(f"unsupported oracle collation: {oracle_collation!r}")


def mysql_to_oracle_collation(mysql_collation: str) -> str:
    """MySQL collation -> Oracle collation class (M2O direction).

    CHINESE_CI is ambiguous (the CJK charsets collapse both
    insensitive classes); the reference records it as AI-or-CI — we
    return the stricter BINARY_CI."""
    coll = mysql_collation.upper()
    if coll.endswith("_BIN"):
        return "BINARY_CS"
    if coll.endswith("_0900_AS_CI"):
        return "BINARY_CI"
    if coll.endswith("_GENERAL_CI") or coll.endswith("_UNICODE_CI"):
        return "BINARY_AI"
    if coll.endswith("_CHINESE_CI"):
        return "BINARY_CI"
    raise ValueError(f"unsupported mysql collation: {mysql_collation!r}")
