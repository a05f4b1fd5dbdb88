"""Bucketed (co-located) tables — shuffle-free repeated joins.

The reference re-shuffles nothing because it never joins at scale; at
100 TB the dominant cost of a repeated fact-to-fact join (orders ⋈
lineitem every pipeline run) is the exchange of BOTH sides on the
key. Spark's bucketing persists that exchange INTO THE LAYOUT: both
tables hash-bucketed into the same bucket count on the join key scan
straight into a SortMergeJoin with NO Exchange on either side — the
shuffle is paid once at write time and amortized over every
subsequent join/aggregate on the key.

Bucketing requires the session catalog (`saveAsTable`); plain
parquet paths carry no bucket metadata. The spec is deliberately
thin: write with `write_bucketed`, verify the plan with
`joins_without_exchange` (used by tests and the plan linter's
methodology — trust the PLAN, not the intention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets keeps parquet min/max stats tight for key
    filters. (Spark 3+ does not expose bucket sortedness to the
    planner by default — spark.sql.legacy.bucketedTableScan.
    outputOrdering — so the SortMergeJoin still sorts; that sort is
    within-bucket and cheap, the eliminated Exchange is the win.)"""
    keys = [key] if isinstance(key, str) else list(key)
    # one FILE per bucket: repartitioning onto the bucket hash (the
    # same Murmur3 HashPartitioning bucketBy uses) makes each task own
    # exactly one bucket — without it every task writes a file into
    # EVERY bucket it holds rows for (tasks x buckets small files).
    shaped = df.repartition(n_buckets, *keys)
    writer = shaped.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def joins_without_exchange(joined: DataFrame) -> bool:
    """True iff the physical plan contains a SortMergeJoin with NO
    Exchange anywhere — the co-located join proof. (AQE wraps the
    plan; the check scans the final/initial plan text.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "SortMergeJoin" in plan and "Exchange" not in plan


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys)
