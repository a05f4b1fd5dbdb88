"""Canonical value rendering — the cross-engine compare contract.

The reference makes both databases render every value identically
*before* hashing rows (decimal leading-zero normalization
DECODE(SUBSTR(c,1,1),'.','0'||c,c) on Oracle vs CAST(0+CAST(c AS CHAR)
AS CHAR) on MySQL — /root/reference/module/compare/oracle/o2m/
task.go:147-152; timestamps via TO_CHAR — task.go:165-179; NULL and ''
both collapse to NULL — /root/reference/database/oracle/full.go:197-213).

Here the same contract is defined once and emitted twice: as a Spark
Column (`canon_column`) and as ANSI SQL that DuckDB runs (`canon_sql`).
Rules:

- string   -> NULLIF(x, '')              (''≡NULL, reference semantics)
- double   -> CAST(x AS DECIMAL(18,2)) rendered with fixed scale
- float32  -> same as double
- int*     -> decimal string
- timestamp-> 'yyyy-MM-dd HH:mm:ss.SSSSSS' (6-digit cap, reference
              truncates TIMESTAMP(9) to 6 — mapping_mysql.go:463-479)
- date     -> 'yyyy-MM-dd'
- binary   -> lowercase hex
- NULL     -> sentinel '\\N' (joined rows must distinguish NULL from '')
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = "\x1f"  # unit separator — cannot occur in fixture text columns
NULL_SENTINEL = "\\N"

# Money-like doubles in the fixtures carry 2 decimals; scale is a knob.
DEFAULT_DOUBLE_SCALE = 2


def canon_column(name: str, dtype: T.DataType, double_scale: int = DEFAULT_DOUBLE_SCALE) -> Column:
    """Spark-side canonical string for one column (pre-hash rendering)."""
    c = F.col(name)
    if isinstance(dtype, T.StringType):
        out = F.nullif(c, F.lit(""))
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = c.cast(T.DecimalType(18, double_scale)).cast("string")
    elif isinstance(dtype, T.DecimalType):
        out = c.cast("string")
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        out = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(dtype, T.DateType):
        out = F.date_format(c, "yyyy-MM-dd")
    elif isinstance(dtype, T.BinaryType):
        out = F.lower(F.hex(c))
    else:
        out = c.cast("string")
    return out


def canon_sql(name: str, dtype: T.DataType, double_scale: int = DEFAULT_DOUBLE_SCALE) -> str:
    """DuckDB-side canonical string, identical rendering to canon_column."""
    if isinstance(dtype, T.StringType):
        return f"NULLIF({name}, '')"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return f"CAST(CAST({name} AS DECIMAL(18,{double_scale})) AS VARCHAR)"
    if isinstance(dtype, T.DecimalType):
        return f"CAST({name} AS VARCHAR)"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return f"strftime({name}, '%Y-%m-%d %H:%M:%S.%f')"
    if isinstance(dtype, T.DateType):
        return f"strftime({name}, '%Y-%m-%d')"
    if isinstance(dtype, T.BinaryType):
        return f"lower(hex({name}))"
    return f"CAST({name} AS VARCHAR)"


def row_string(schema: T.StructType, cols: list[str] | None = None) -> Column:
    """Join canonical columns into one row string (NULL-safe).

    Mirrors the reference's rendered-row-string used for CRC32 hashing
    (/root/reference/database/oracle/compare.go:253-263). concat_ws
    would *skip* NULLs (collapsing NULL vs absent), so every column is
    coalesced to an explicit sentinel first.
    """
    names = cols or schema.fieldNames()
    by_name = {f.name: f.dataType for f in schema.fields}
    parts = [F.coalesce(canon_column(n, by_name[n]), F.lit(NULL_SENTINEL)) for n in names]
    return F.concat_ws(SEP, *parts)


def row_string_sql(schema: T.StructType, cols: list[str] | None = None) -> str:
    """DuckDB SQL equivalent of row_string (same separator/sentinel)."""
    names = cols or schema.fieldNames()
    by_name = {f.name: f.dataType for f in schema.fields}
    parts = [f"COALESCE({canon_sql(n, by_name[n])}, '\\N')" for n in names]
    return "concat_ws(chr(31), " + ", ".join(parts) + ")"


def stable_round(col: Column | str, digits: int) -> Column:
    """Half-up decimal rounding of a DOUBLE as floor(x·10^d + 0.5)/10^d.

    Each engine's native round() disagrees on EXACT decimal ties, which
    IEEE quotients do hit: a dyadic rational like 5/128 = 0.0390625
    terminates precisely at the tie digit, and Spark (BigDecimal
    HALF_UP) and DuckDB then round it differently — a real
    value-hash mismatch observed at sf0.1. Multiply, add, floor and
    divide are all correctly-rounded IEEE ops, bit-identical across
    engines, so this formula is deterministic and portable. Ties round
    toward +infinity."""
    p = float(10**digits)
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * p + F.lit(0.5)) / F.lit(p)


def stable_round_sql(expr: str, digits: int) -> str:
    """DuckDB twin of stable_round."""
    p = 10**digits
    return f"(floor(({expr}) * {p}.0 + 0.5) / {p}.0)"
