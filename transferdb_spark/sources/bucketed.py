"""Bucketed-table layout — co-located joins without a shuffle.

The 100 TB migrate-then-verify loop joins source and target on the
same split key repeatedly (compare, diff, incremental reconcile). When
both sides are written bucketed by that key, every one of those joins
is map-side: Spark aligns bucket files pairwise and never exchanges
either table. This is the persistent-layout analogue of the
reference's chunk alignment (both sides chunked by the same ranges,
module/compare/oracle/o2m/chunk.go) — but enforced by the storage
format instead of re-planned per run.

Bucket counts should divide evenly into cluster cores and keep each
bucket under a few GB at target scale; both sides MUST use the same
(count, key) pair or Spark falls back to shuffling the mismatched one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    database: str | None = None,
) -> str:
    """Persist df bucketed+sorted by key; returns qualified table name."""
    name = f"{database}.{table}" if database else table
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )
    return name


def co_located_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs the physical plan contains no Exchange:
    each task reads bucket i of both tables and joins locally."""
    return spark.table(left).join(spark.table(right), key, how)
