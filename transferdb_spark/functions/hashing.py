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
    """Spark: first 10 hex digits of md5 as BIGINT (matches DuckDB).

    Use ONLY where the hash VALUE crosses the engine boundary (oracle
    checksums, hash-gated sampling, digests exposed in output). md5 is
    ~3-5× the CPU of xxhash64 — production compare paths where the hash
    stays internal (match flags, diff classification) use fast_hash64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB: identical value via hex-literal cast."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


def fast_hash64(col: Column | str) -> Column:
    """Production row hash: Spark's JVM-side xxhash64 (whole-stage
    codegen, no hex round-trip). NOT portable to the DuckDB oracle —
    use for hashes that never leave the engine (diff classification,
    internal checksums compared Spark-vs-Spark). Kept to the top 40
    bits (same width as the portable variant) so a commutative SUM()
    over a chunk cannot overflow BIGINT under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return F.shiftrightunsigned(F.xxhash64(c), 64 - HEX_DIGITS * 4)


def row_hash(schema, cols=None, portable: bool = True) -> Column:
    """Hash of the canonical row string (Spark side)."""
    from transferdb_spark.functions.canonical import row_string

    s = row_string(schema, cols)
    return portable_hash64(s) if portable else fast_hash64(s)


def row_hash_sql(schema, cols=None) -> str:
    """Hash of the canonical row string (DuckDB side)."""
    from transferdb_spark.functions.canonical import row_string_sql

    return portable_hash64_sql(row_string_sql(schema, cols))
