"""As-of (point-in-time) join — an operator Spark has no builtin for.

For every left row, attach the payload of the LATEST right row with
right.ts <= left.ts within the same key — the canonical "state at
event time" lookup (prices at trade time, profile at click time).

Spark-native realization, one shuffle total: tag and union both
sides, then a per-key window ordered by (ts, side) carries the last
non-null right payload forward onto each left row
(last_value IGNORE NULLS over ROWS UNBOUNDED PRECEDING). This is the
sort-merge as-of: cost = one hash exchange on the key + one sort
within partitions, independent of how many right rows precede each
left row. A right row at exactly left.ts wins (<=), so right sorts
before left on ties.

The DuckDB oracle uses its native ASOF JOIN — two independent
implementations must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """left columns + the latest right payload as-of each left row.

    right must be unique per (key, ts) — pre-aggregate if not, or the
    carried value is undefined (DuckDB's ASOF has the same caveat)."""
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ord", F.col(ts))
    rt = (
        right.select(key, ts, *payload)
        .withColumn("_side", F.lit(0))
        .withColumn("_ord", F.col(ts))
    )
    l_cols = [c for c in left.columns]
    both = lt.select(
        *l_cols,
        "_side",
        "_ord",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    ).unionByName(
        rt.select(
            *[
                F.col(c).alias(c) if c in (key, ts) else F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in l_cols
            ],
            "_side",
            "_ord",
            *[F.col(c).alias(f"_r_{c}") for c in payload],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ord", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *l_cols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
