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

    `events.ts` has shipped as parquet TIMESTAMP(NANOS) (Spark rejects
    it vectorized — read as raw int64 nanos and integer-divide to µs,
    the same 6-digit cap the reference applies to TIMESTAMP(9),
    mapping_mysql.go:463-479) and as TIMESTAMP(MICROS) without
    isAdjustedToUTC (Spark loads TIMESTAMP_NTZ, which refuses numeric
    casts and streaming watermarks). Normalize both at this boundary to
    a plain session-tz TIMESTAMP. The NTZ→TIMESTAMP cast is
    epoch-preserving only because session.py pins
    spark.sql.session.timeZone=UTC — keep the two in sync.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = _normalize_ntz(df)
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return _normalize_ntz(spark.read.parquet(table_path(sf_dir, name)))


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to session-tz TIMESTAMP."""
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


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
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def load_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet target whose schema EVOLVED across appends.

    A long-lived migration target gains columns over time (the source
    ran ALTER TABLE ADD between runs — exactly what `check` mode
    detects and fixes). mergeSchema unions every file's schema;
    rows written before the column existed read as NULL, which is the
    reference's NULL-for-missing semantics on the target side. Footer
    merging is O(files) driver-side metadata, so keep it an explicit
    opt-in (this helper), not a default read path."""
    return _normalize_ntz(
        spark.read.option("mergeSchema", "true").parquet(path)
    )
