"""R1/R2 — datatype mapping Oracle→MySQL (+ Spark types), M2O direction.

Semantics reproduced from the reference's rule matrix
(/root/reference/module/reverse/oracle/public/mapping_mysql.go:47-486;
built-in name map /root/reference/common/buildin.go:130-205):

- NUMBER(p,0): p∈[1,3)→TINYINT, [3,5)→SMALLINT, [5,9)→INT, [9,19)→BIGINT,
  [19,38]→DECIMAL(p); p absent (Oracle "no precision" = (38,127), see
  database/oracle/reverse.go:542-543) → DECIMAL(65,scale).
- NUMBER(p,s>0): DECIMAL(p,s) with scale clamped to 30 and precision
  promoted to 65 when p=38 (MySQL DECIMAL maxima).
- CHAR/VARCHAR2 CHAR vs BYTE length semantics (CHAR_USED='C' uses
  char_length, else data_length).
- TIMESTAMP(s): scale capped at 6; WITH (LOCAL) TIME ZONE → DATETIME.
- INTERVAL YEAR/DAY → VARCHAR(30); RAW→VARBINARY; BFILE→VARCHAR(255);
  unknown → TEXT.

The Spark-type column is this engine's own addition: the DataFrame
schema the migrated data gets, with Spark's 38-digit decimal cap.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# built-in Oracle -> MySQL base-type names (buildin.go:130-205)
O2M_BASE = {
    "BFILE": "VARCHAR(255)",
    "CHAR": "VARCHAR({len})",
    "CHARACTER": "VARCHAR({len})",
    "CLOB": "LONGTEXT",
    "NCLOB": "TEXT",
    "BLOB": "BLOB",
    "LONG": "LONGTEXT",
    "LONG RAW": "LONGBLOB",
    "RAW": "VARBINARY({len})",
    "DATE": "DATETIME",
    "FLOAT": "DOUBLE",
    "REAL": "DOUBLE",
    "BINARY_FLOAT": "DOUBLE",
    "BINARY_DOUBLE": "DOUBLE",
    "DOUBLE PRECISION": "DOUBLE PRECISION",
    "INT": "INT",
    "INTEGER": "INT",
    "SMALLINT": "SMALLINT",
    "NCHAR": "VARCHAR({len})",
    "NCHAR VARYING": "NCHAR VARYING({len})",
    "NVARCHAR2": "VARCHAR({len})",
    "VARCHAR": "VARCHAR({len})",
    "VARCHAR2": "VARCHAR({len})",
    "ROWID": "VARCHAR({len})",
    "UROWID": "VARCHAR({len})",
    "XMLTYPE": "LONGTEXT",
}

MYSQL_DECIMAL_MAX_PRECISION = 65
MYSQL_DECIMAL_MAX_SCALE = 30
SPARK_DECIMAL_MAX = 38


@dataclass(frozen=True)
class OracleColumn:
    """Catalog facts for one column (DBA_TAB_COLUMNS shape)."""

    name: str
    data_type: str
    data_length: int = 0
    data_precision: int | None = None
    data_scale: int | None = None
    char_used: str = "B"  # 'C' = CHAR semantics, 'B' = BYTE
    char_length: int = 0
    nullable: bool = True
    default: str | None = None
    comment: str = ""
    # provenance marker for columns whose logical source type had to be
    # serialized into this one (e.g. array<float> landed as BLOB) —
    # assess classifies such columns convertible, not 1:1 compatible
    source_hint: str = ""


def _number_to_mysql(p: int | None, s: int | None) -> str:
    # Oracle "NUMBER" w/o precision arrives as (38,127) from the catalog
    p = 38 if p is None else p
    s = 127 if s is None else s
    if s > 0:
        if p == 38:
            return f"DECIMAL(65,{min(s, MYSQL_DECIMAL_MAX_SCALE)})"
        return f"DECIMAL({p},{min(s, MYSQL_DECIMAL_MAX_SCALE)})"
    if 1 <= p < 3:
        return "TINYINT"
    if 3 <= p < 5:
        return "SMALLINT"
    if 5 <= p < 9:
        return "INT"
    if 9 <= p < 19:
        return "BIGINT"
    if 19 <= p <= 38:
        return f"DECIMAL({p})"
    return f"DECIMAL(65,{s})"


def _number_to_spark(p: int | None, s: int | None) -> T.DataType:
    p = 38 if p is None else p
    s = 127 if s is None else s
    if s > 0:
        # Oracle permits scale > precision (e.g. NUMBER(1,2) holds 0.0x);
        # Spark requires scale <= precision, so widen precision to fit.
        ss = min(s, SPARK_DECIMAL_MAX)
        return T.DecimalType(min(max(p, ss), SPARK_DECIMAL_MAX), ss)
    if 1 <= p < 3:
        return T.ByteType()
    if 3 <= p < 5:
        return T.ShortType()
    if 5 <= p < 9:
        return T.IntegerType()
    if 9 <= p < 19:
        return T.LongType()
    return T.DecimalType(min(p, SPARK_DECIMAL_MAX), 0)


def map_oracle_type(col: OracleColumn) -> tuple[str, str, T.DataType]:
    """(origin_type, mysql_type, spark_type) for one Oracle column."""
    dt = col.data_type.upper().strip()
    p, s = col.data_precision, col.data_scale

    if dt in ("NUMBER", "DECIMAL", "DEC", "NUMERIC"):
        origin = f"NUMBER({38 if p is None else p},{127 if s is None else s})"
        return origin, _number_to_mysql(p, s), _number_to_spark(p, s)

    if dt.startswith("INTERVAL YEAR"):
        return dt, "VARCHAR(30)", T.StringType()
    if dt.startswith("INTERVAL DAY"):
        return dt, "VARCHAR(30)", T.StringType()

    if "TIMESTAMP" in dt:
        scale = min(s if s is not None else 6, 6)
        if "TIME ZONE" in dt:
            return dt, f"DATETIME({scale})", T.TimestampType()
        return dt, f"TIMESTAMP({scale})", T.TimestampNTZType()

    if dt in ("CHAR", "CHARACTER", "NCHAR", "VARCHAR", "VARCHAR2", "NVARCHAR2", "NCHAR VARYING"):
        length = col.char_length if col.char_used.upper() == "C" else col.data_length
        origin = f"{dt}({length})"
        return origin, O2M_BASE[dt].format(len=length), T.StringType()

    if dt in ("RAW",):
        return f"RAW({col.data_length})", O2M_BASE[dt].format(len=col.data_length), T.BinaryType()
    if dt in ("ROWID", "UROWID"):
        length = col.data_length or (10 if dt == "ROWID" else 3950)
        return dt, f"VARCHAR({length})", T.StringType()

    fixed = {
        "BFILE": T.StringType(),
        "CLOB": T.StringType(),
        "NCLOB": T.StringType(),
        "LONG": T.StringType(),
        "XMLTYPE": T.StringType(),
        "BLOB": T.BinaryType(),
        "LONG RAW": T.BinaryType(),
        "DATE": T.TimestampNTZType(),  # Oracle DATE carries time-of-day
        "FLOAT": T.DoubleType(),
        "REAL": T.DoubleType(),
        "BINARY_FLOAT": T.DoubleType(),
        "BINARY_DOUBLE": T.DoubleType(),
        "DOUBLE PRECISION": T.DoubleType(),
        "INT": T.IntegerType(),
        "INTEGER": T.IntegerType(),
        "SMALLINT": T.ShortType(),
    }
    if dt in fixed:
        return dt, O2M_BASE[dt], fixed[dt]

    # unknown types degrade to TEXT (mapping_mysql.go default branch)
    return dt, "TEXT", T.StringType()


# --- M2O direction (module/reverse/mysql/, common/buildin.go:206-243) ---

M2O_BASE = {
    "TINYINT": "NUMBER(3,0)",
    "SMALLINT": "NUMBER(5,0)",
    "MEDIUMINT": "NUMBER(7,0)",
    "INT": "NUMBER(10,0)",
    "INTEGER": "NUMBER(10,0)",
    "BIGINT": "NUMBER(19,0)",
    "FLOAT": "BINARY_FLOAT",
    "DOUBLE": "BINARY_DOUBLE",
    "DECIMAL": "NUMBER({p},{s})",
    "NUMERIC": "NUMBER({p},{s})",
    "CHAR": "CHAR({len})",
    "VARCHAR": "VARCHAR2({len})",
    "TINYTEXT": "VARCHAR2(255)",
    "TEXT": "CLOB",
    "MEDIUMTEXT": "CLOB",
    "LONGTEXT": "CLOB",
    "BINARY": "RAW({len})",
    "VARBINARY": "RAW({len})",
    "TINYBLOB": "BLOB",
    "BLOB": "BLOB",
    "MEDIUMBLOB": "BLOB",
    "LONGBLOB": "BLOB",
    "DATE": "DATE",
    "DATETIME": "DATE",
    "TIMESTAMP": "TIMESTAMP({s})",
    "TIME": "DATE",
    "YEAR": "NUMBER(4,0)",
}

M2O_UNSUPPORTED = {"ENUM", "SET"}  # common/reverse.go:362


def map_mysql_to_oracle_type(
    data_type: str, length: int = 0, precision: int = 10, scale: int = 0
) -> str:
    dt = data_type.upper().strip()
    if dt in M2O_UNSUPPORTED:
        raise ValueError(f"mysql type {dt} unsupported toward oracle (reference common/reverse.go:362)")
    if dt in M2O_BASE:
        return M2O_BASE[dt].format(len=length, p=precision, s=scale)
    return "CLOB"


def oracle_type_to_spark(col: OracleColumn) -> T.StructField:
    """StructField for the migrated DataFrame schema."""
    _, _, spark_t = map_oracle_type(col)
    return T.StructField(col.name.lower(), spark_t, col.nullable)
