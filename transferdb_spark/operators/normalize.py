"""P1/P2 — type-normalizing projection (SURVEY.md §2.2).

The reference builds a per-column SELECT expression that renders every
value into its canonical migration form: NUMBER with leading-zero
DECODE, DATE/TIMESTAMP via TO_CHAR, intervals via TO_CHAR, XMLTYPE
serialized, NULL and '' collapsed to NULL
(/root/reference/module/migrate/sql/oracle/o2m/full.go:885-948; CSV
variant csv.go:832-893; compare variant task.go:134-187).

Spark-first: this is a single narrow `select` — Catalyst pushes the
column pruning into the parquet/JDBC scan and the expressions run in
whole-stage codegen. No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_projection(
    df: DataFrame,
    cols: list[str] | None = None,
    empty_string_as_null: bool = True,
    ts_scale: int = 6,
    double_scale: int = 2,
) -> DataFrame:
    """Render every column to its canonical string/typed form.

    Output column names are preserved (the reference keeps names and
    wraps values — full.go:920-943). Semantics flags:

    - empty_string_as_null: the Oracle ''≡NULL rule (full.go:197-213).
    - ts_scale: timestamp fractional digits, capped at 6.
    - double_scale: decimal rendering scale for float columns.
    """
    ts_scale = min(ts_scale, 6)
    fmt = "yyyy-MM-dd HH:mm:ss" + ("." + "S" * ts_scale if ts_scale else "")
    out = []
    for f in df.schema.fields:
        if cols is not None and f.name not in cols:
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, T.StringType):
            e = F.nullif(c, F.lit("")) if empty_string_as_null else c
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            e = c.cast(T.DecimalType(18, double_scale)).cast("string")
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            e = F.date_format(c, fmt)
        elif isinstance(f.dataType, T.DateType):
            e = F.date_format(c, "yyyy-MM-dd")
        elif isinstance(f.dataType, T.BinaryType):
            e = F.lower(F.hex(c))
        else:
            e = c
        out.append(e.alias(f.name))
    return df.select(*out)


def normalize_projection_sql(schema: T.StructType, table: str, ts_scale: int = 6, double_scale: int = 2) -> str:
    """DuckDB oracle SQL producing the identical normalized projection."""
    ts_fmt = "%Y-%m-%d %H:%M:%S" + (".%f" if ts_scale else "")
    parts = []
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            parts.append(f"NULLIF({f.name}, '') AS {f.name}")
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            parts.append(f"CAST(CAST({f.name} AS DECIMAL(18,{double_scale})) AS VARCHAR) AS {f.name}")
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            parts.append(f"strftime({f.name}, '{ts_fmt}') AS {f.name}")
        elif isinstance(f.dataType, T.DateType):
            parts.append(f"strftime({f.name}, '%Y-%m-%d') AS {f.name}")
        elif isinstance(f.dataType, T.BinaryType):
            parts.append(f"lower(hex({f.name})) AS {f.name}")
        else:
            parts.append(f.name)
    return f"SELECT {', '.join(parts)} FROM {table}"
