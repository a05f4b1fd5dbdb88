"""Fixture-backed catalog: derive Oracle-shaped metadata from parquet.

The reference reads its catalog from the live database; with parquet
fixtures the "catalog" is the file schema plus known key structure.
Spark → Oracle logical types use the inverse of the R1 mapping.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from transferdb_spark.catalog.meta import ConstraintMeta, IndexMeta, TableMeta
from transferdb_spark.rules.datatypes import OracleColumn

_SPARK_TO_ORACLE = [
    (T.ByteType, ("NUMBER", 2, 0)),
    (T.ShortType, ("NUMBER", 4, 0)),
    (T.IntegerType, ("NUMBER", 8, 0)),
    # 18, not 19: NUMBER(p<19) buckets back to BIGINT/LongType so the
    # catalog→DDL→schema roundtrip is stable for int64 fixture columns
    (T.LongType, ("NUMBER", 18, 0)),
    (T.FloatType, ("BINARY_FLOAT", None, None)),
    (T.DoubleType, ("BINARY_DOUBLE", None, None)),
    (T.StringType, ("VARCHAR2", None, None)),
    (T.BinaryType, ("BLOB", None, None)),
    (T.TimestampType, ("TIMESTAMP", None, 6)),
    (T.TimestampNTZType, ("TIMESTAMP", None, 6)),
    (T.DateType, ("DATE", None, None)),
    (T.BooleanType, ("NUMBER", 1, 0)),
]

# known key structure of the driver fixtures (TESTDATA.md)
FIXTURE_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXTURE_FKS: dict[str, list[tuple[str, str, str]]] = {
    # table -> [(fk_col, ref_table, ref_col)]
    "nation": [("n_regionkey", "region", "r_regionkey")],
    "customer": [("c_nationkey", "nation", "n_nationkey")],
    "supplier": [("s_nationkey", "nation", "n_nationkey")],
    "orders": [("o_custkey", "customer", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
}


def _oracle_column(field: T.StructField) -> OracleColumn:
    for spark_cls, (otype, prec, scale) in _SPARK_TO_ORACLE:
        if isinstance(field.dataType, spark_cls):
            length = 4000 if otype == "VARCHAR2" else 0
            return OracleColumn(
                name=field.name.upper(),
                data_type=otype,
                data_length=length,
                data_precision=prec,
                data_scale=scale,
                nullable=field.nullable,
            )
    if isinstance(field.dataType, T.ArrayType):
        return OracleColumn(
            name=field.name.upper(),
            data_type="BLOB",
            nullable=field.nullable,
            source_hint=field.dataType.simpleString(),  # serialized array
        )
    if isinstance(field.dataType, T.DecimalType):
        return OracleColumn(
            name=field.name.upper(),
            data_type="NUMBER",
            data_precision=field.dataType.precision,
            data_scale=field.dataType.scale,
            nullable=field.nullable,
        )
    return OracleColumn(name=field.name.upper(), data_type="VARCHAR2", data_length=4000)


def table_meta_from_schema(
    schema_name: str, table: str, schema: T.StructType, row_count: int | None = None
) -> TableMeta:
    cols = [_oracle_column(f) for f in schema.fields]
    constraints = []
    if table in FIXTURE_KEYS:
        constraints.append(
            ConstraintMeta(
                name=f"PK_{table.upper()}",
                ctype="P",
                columns=tuple(c.upper() for c in FIXTURE_KEYS[table]),
            )
        )
    for fk_col, r_table, r_col in FIXTURE_FKS.get(table, []):
        constraints.append(
            ConstraintMeta(
                name=f"FK_{table.upper()}_{fk_col.upper()}",
                ctype="R",
                columns=(fk_col.upper(),),
                r_table=r_table.upper(),
                r_columns=(r_col.upper(),),
            )
        )
    indexes = [
        IndexMeta(name=f"IDX_{table.upper()}_{c.upper()}", columns=(c.upper(),), unique=False)
        for c, *_ in [fk[:1] for fk in FIXTURE_FKS.get(table, [])]
    ]
    return TableMeta(
        schema=schema_name,
        name=table.upper(),
        columns=cols,
        constraints=constraints,
        indexes=indexes,
        row_count=row_count,
    )


def fixture_catalog(
    spark: SparkSession, sf_dir: str, schema_name: str = "TPCH", with_counts: bool = False
) -> dict[str, TableMeta]:
    from transferdb_spark.sources.registry import TABLES, load_table, table_path
    import os

    out = {}
    for t in TABLES:
        if not os.path.exists(table_path(sf_dir, t)):
            continue
        df = load_table(spark, sf_dir, t)
        cnt = df.count() if with_counts else None
        out[t] = table_meta_from_schema(schema_name, t, df.schema, cnt)
    return out
