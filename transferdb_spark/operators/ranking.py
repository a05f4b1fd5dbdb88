"""Two-phase distributed global ranking — total-order ranks WITHOUT a
single-partition window.

A `Window.orderBy(...)` with no partitionBy funnels the whole table
through one task (Spark even warns: "Moving all data to a single
partition"). That is fine for a demo and fatal at 100 TB. The scalable
form is the classic two-phase plan every MPP engine uses:

1. derive range-bucket boundaries for the leading order column
   (approx quantiles — ANY boundaries are correct, equal-depth ones
   are merely fast) and assign each row a bucket id with a PURE
   expression — deterministic, so no materialization is needed to
   keep two reads of the partitioning consistent;
2. count rows per bucket (an aggregate, one row per bucket);
3. fold the cumulative offsets into the plan; global row_number =
   within-bucket row_number (a PARALLEL window partitioned by the
   bucket id) + the bucket's offset.

An earlier revision used repartitionByRange + spark_partition_id and
had to localCheckpoint the exchange: RangePartitioner SAMPLES its
bounds, so re-executing it for the count job and the window job put
rows in different partitions and produced duplicate ranks (caught by
the sf0.1 gate). The pure-expression bucket id removes that hazard and
the checkpoint with it — the only jobs are the quantile probe and the
bucket counts.

Exactness: the order key list must be a TOTAL order (append a unique
tie-breaker). All rows equal on the leading column share a bucket, so
bucket order is consistent with the total order and offset + local
row_number is exactly the global row_number. ntile derives from it
with SQL ntile's exact uneven-bucket rule (first N % k buckets get one
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
    total order), computed with parallel per-bucket windows.

    Driver traffic: the quantile probe plus one count row per bucket."""
    out, _ = _global_row_number_with_total(df, order_cols, num_partitions)
    return out


def _bucket_expr(df: DataFrame, lead_col: str, num_partitions: int) -> Column:
    """Deterministic range-bucket id for the leading order column:
    sum of (col > boundary_i) over approx-quantile boundaries. Equal
    values always share a bucket; skewed data just means uneven
    buckets, never wrong ranks."""
    from pyspark.sql import types as T

    qs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = sorted(set(df.stat.approxQuantile(lead_col, qs, 0.001)))
    pid: Column = F.lit(0)
    for b in bounds:
        pid = pid + (F.col(lead_col) > F.lit(b)).cast("int")
    # Edge ordering must match the window semantics we claim parity
    # with: NULL sorts FIRST under Spark's default ascending order
    # (own leading bucket), and NaN sorts LAST / greater-than-all
    # (own trailing bucket — `NaN > bound` is false, so it would
    # otherwise silently land in bucket 0 with the LOWEST ranks).
    out = F.when(F.col(lead_col).isNull(), F.lit(-1)).otherwise(pid)
    if isinstance(df.schema[lead_col].dataType, (T.FloatType, T.DoubleType)):
        out = F.when(F.isnan(F.col(lead_col)), F.lit(num_partitions + 1)).otherwise(out)
    return out


def _global_row_number_with_total(
    df: DataFrame, order_cols: list[str], num_partitions: int
) -> tuple[DataFrame, int]:
    lead = order_cols[0]
    with_pid = df.withColumn("__pid", _bucket_expr(df, lead, num_partitions))

    # one row per bucket to the driver
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
