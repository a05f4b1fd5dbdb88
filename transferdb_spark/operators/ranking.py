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


def _order_surrogate(df: DataFrame, lead_col: str) -> Column:
    """An order-preserving NUMERIC image of the leading order column,
    so boundary derivation (approxQuantile, numeric-only) works for
    every supported lead type.

    The surrogate need not be injective — a monotone non-decreasing
    map is enough: rows it collapses share a bucket, and the
    within-bucket window still applies the full total order. Dates and
    timestamps map to epoch ordinals (exact); strings map to their
    first 7 UTF-8 bytes as a big-endian integer (order-consistent with
    Spark's binary string comparison; ties just coarsen buckets)."""
    from pyspark.sql import types as T

    dt = df.schema[lead_col].dataType
    c = F.col(lead_col)
    if isinstance(dt, T.NumericType):
        return c
    if isinstance(dt, T.BooleanType):
        return c.cast("int")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01"))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("long")
    if isinstance(dt, T.StringType):
        # 7 bytes = 14 hex digits < 2^56: fits a signed long. The hex
        # image must be RIGHT-zero-padded to fixed width — otherwise a
        # short string ('zebra', 10 hex digits) compares below a longer
        # lexicographically-smaller one ('apple p', 14 digits). 0x00
        # padding sorts the prefix first, matching binary comparison.
        return F.coalesce(
            F.conv(
                F.rpad(F.hex(F.substring(F.encode(c, "UTF-8"), 1, 7)), 14, "0"),
                16,
                10,
            ).cast("bigint"),
            F.lit(0),
        )
    raise ValueError(
        f"global ranking: unsupported leading order column type {dt.simpleString()} "
        f"for {lead_col!r}; supported: numeric, boolean, date, timestamp, string"
    )


def _bucket_expr(df: DataFrame, lead_col: str, num_partitions: int) -> Column:
    """Deterministic range-bucket id for the leading order column:
    sum of (surrogate > boundary_i) over approx-quantile boundaries.
    Equal values always share a bucket; skewed data just means uneven
    buckets, never wrong ranks."""
    from pyspark.sql import types as T

    surrogate = _order_surrogate(df, lead_col)
    qs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = sorted(
        set(
            df.select(surrogate.alias("__ord")).stat.approxQuantile(
                "__ord", qs, 0.001
            )
        )
    )
    pid: Column = F.lit(0)
    for b in bounds:
        pid = pid + (surrogate > F.lit(b)).cast("int")
    # Edge ordering must match the window semantics we claim parity
    # with: NULL sorts FIRST under Spark's default ascending order
    # (own leading bucket). NaN compares GREATER than any double in
    # Spark SQL, so it would naturally accumulate into the last
    # bucket; the explicit override gives it its own trailing bucket —
    # same order, and a NaN-heavy column can't skew the top bucket.
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
