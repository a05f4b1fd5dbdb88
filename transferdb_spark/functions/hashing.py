"""Portable row hashing (SURVEY.md §2.4 A2, §2.8 F7).

The reference checksums a chunk as a *commutative sum* of per-row CRC32
values so no global sort is needed
(/root/reference/database/oracle/compare.go:259-263 — crc32 summed over
the chunk). Spark has crc32 built-in, but the DuckDB oracle (v1.0) does
not — so the engine's portable hash is the top 40 bits of md5, which
both engines compute bit-identically over the canonical row string.

40 bits keeps SUM() within int64 far beyond 10^7 rows per group; on the
real cluster the sum is per-chunk (bounded rows), and collision odds at
40 bits/row for chunk-level equality checks are ~n^2/2^41 per chunk —
the same birthday regime the reference accepts with CRC32 (32 bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 10  # 40 bits


def portable_hash64(col: Column | str) -> Column:
    """Spark: first 10 hex digits of md5 as BIGINT (matches DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB: identical value via hex-literal cast."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


def row_hash(schema, cols=None) -> Column:
    """Hash of the canonical row string (Spark side)."""
    from transferdb_spark.functions.canonical import row_string

    return portable_hash64(row_string(schema, cols))


def row_hash_sql(schema, cols=None) -> str:
    """Hash of the canonical row string (DuckDB side)."""
    from transferdb_spark.functions.canonical import row_string_sql

    return portable_hash64_sql(row_string_sql(schema, cols))
