"""Two-phase distributed global ranking — total-order ranks WITHOUT a
single-partition window.

A `Window.orderBy(...)` with no partitionBy funnels the whole table
through one task (Spark even warns: "Moving all data to a single
partition"). That is fine for a demo and fatal at 100 TB. The scalable
form is the classic two-phase plan every MPP engine uses:

1. range-repartition on the ORDER key(s) — each partition holds a
   contiguous key range, globally ordered across partitions;
2. count rows per partition (an aggregate, k rows to the driver);
3. broadcast the cumulative offsets; global row_number =
   within-partition row_number (a PARALLEL window, partitioned by
   spark_partition_id) + the partition's offset.

Exactness: the order key list must be a TOTAL order (append a unique
tie-breaker). Range partitioning puts equal keys in the same partition
and orders partitions by key, so offset + local row_number is exactly
the global row_number; ntile/quartile assignments derive from it with
SQL ntile's exact uneven-bucket rule (first N % k buckets get one
extra row).

The reference has no window machinery at all (SURVEY §2.5); this is
the Spark-native upgrade path for the global variants plan_lint's
SinglePartitionWindow flag exists to catch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame, order_cols: list[str], num_partitions: int = 32
) -> DataFrame:
    """df + `rn` = exact global row_number over order_cols (must be a
    total order), computed with parallel per-partition windows.

    Driver traffic is ONE row per partition (the counts); everything
    else stays distributed. The per-partition window sorts only its
    partition — the range exchange already did the global ordering.
    """
    out, _ = _global_row_number_with_total(df, order_cols, num_partitions)
    return out


def _global_row_number_with_total(
    df: DataFrame, order_cols: list[str], num_partitions: int
) -> tuple[DataFrame, int]:
    ranged = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    # MATERIALIZE the ranged partitioning before reading it twice:
    # RangePartitioner picks its bounds by SAMPLING, so re-executing
    # the exchange for the count job and the window job can land rows
    # in different partitions — offsets from one partitioning applied
    # to the other produced duplicate/skipped ranks (caught at sf0.1).
    # localCheckpoint pins one materialization; a cluster deployment
    # would use persist(DISK) or a reliable checkpoint the same way.
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint()

    # k rows to the driver: partition id -> row count
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    off_expr: Column = F.lit(0)
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(off_expr)

    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    out = with_pid.withColumn("rn", F.row_number().over(w) + off_expr).drop("__pid")
    return out, acc


def ntile_from_rn(rn: Column, total: int, k: int) -> Column:
    """SQL ntile(k) from a 1-based global row_number — the exact uneven
    rule: the first total%k buckets hold ceil(total/k) rows, the rest
    floor(total/k)."""
    big = total % k
    size_big = -(-total // k)  # ceil
    size_small = total // k
    cut = big * size_big
    if size_small == 0:
        # fewer rows than buckets: row r is bucket r
        return rn.cast("int")
    return (
        F.when(rn <= cut, ((rn - 1) / size_big).cast("int") + 1)
        .otherwise(F.lit(big) + ((rn - cut - 1) / size_small).cast("int") + 1)
        .cast("int")
    )


def global_ntile(
    df: DataFrame, order_cols: list[str], k: int, num_partitions: int = 32
) -> DataFrame:
    """df + `bucket` = exact SQL ntile(k) over the total order — the
    scalable twin of `ntile(k) OVER (ORDER BY ...)`. The total count
    falls out of the phase-2 offsets (no extra scan)."""
    with_rn, total = _global_row_number_with_total(df, order_cols, num_partitions)
    return with_rn.withColumn("bucket", ntile_from_rn(F.col("rn"), total, k))
