"""Fixture table registry (S5 — table enumerator).

The reference enumerates tables from DBA_TABLES and applies a glob
include/exclude filter (/root/reference/database/oracle/oracle.go:246-260,
/root/reference/filter/parser.go:45-120). Here the "catalog" is a parquet
directory; the same glob filter applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from transferdb_spark.functions.scalars import glob_match

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read it as raw int64 nanos (legacy conf) and convert
    to a µs timestamp with exact integer division — the same 6-digit cap
    the reference applies to TIMESTAMP(9) (mapping_mysql.go:463-479).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Enumerate + glob-filter tables (P6/S5 semantics)."""
    names = [t for t in TABLES if os.path.exists(table_path(sf_dir, t))]
    if include:
        names = [t for t in names if glob_match(include, t)]
    if exclude:
        names = [t for t in names if not glob_match(exclude, t)]
    return {t: load_table(spark, sf_dir, t) for t in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for Spark SQL entry points."""
    for t in names or TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
