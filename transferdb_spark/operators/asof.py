"""As-of (point-in-time) join — an operator Spark has no builtin for.

For every left row, attach the payload of the matching right row
within the same key:

- ``backward`` (default): the LATEST right row with right.ts <=
  left.ts — the canonical "state at event time" lookup (prices at
  trade time, profile at click time).
- ``forward``: the EARLIEST right row with right.ts >= left.ts —
  "next event after" (next maintenance after a failure, next purchase
  after a click).
- ``nearest``: whichever of the two is closer in time; exact ties go
  backward (pandas merge_asof semantics).

``tolerance`` (seconds for timestamp keys, raw units for numeric)
nulls the payload when the matched row is farther than the bound —
again merge_asof parity.

Spark-native realization, one shuffle total: tag and union both
sides, then a per-key window ordered by (ts, side) carries the last
non-null right payload forward onto each left row
(last_value IGNORE NULLS over ROWS UNBOUNDED PRECEDING). This is the
sort-merge as-of: cost = one hash exchange on the key + one sort
within partitions, independent of how many right rows precede each
left row. A right row at exactly left.ts is eligible in every
direction (<= / >=), so right sorts before left on ties. ``forward``
is the same carry over the reversed ordering; ``nearest`` evaluates
both carries over the one shuffled relation (two in-partition sorts,
still one exchange) and picks per row.

The DuckDB oracle uses its native ASOF JOIN (>= for backward, <= for
forward, a two-ASOF CASE for nearest) — two independent
implementations must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MATCH_TS = "__rts"  # carried right-side ts (tolerance / nearest math)


def _seconds(col: Column, dtype) -> Column:
    """ts → seconds-as-double (numeric passes through; timestamp and
    timestamp_ntz cast via TIMESTAMP so the epoch math is uniform)."""
    if dtype.typeName() in ("timestamp", "timestamp_ntz"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """left columns + the matched right payload as-of each left row.

    right must be unique per (key, ts) — pre-aggregate if not, or the
    carried value is undefined (DuckDB's ASOF has the same caveat)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    ts_type = left.schema[ts].dataType
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ord", F.col(ts))
    rt = (
        right.select(key, ts, *payload)
        .withColumn(_MATCH_TS, F.col(ts))
        .withColumn("_side", F.lit(0))
        .withColumn("_ord", F.col(ts))
    )
    rpay = payload + [_MATCH_TS]
    l_cols = list(left.columns)
    both = lt.select(
        *l_cols,
        "_side",
        "_ord",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(f"_r_{c}") for c in rpay],
    ).unionByName(
        rt.select(
            *[
                F.col(c).alias(c)
                if c in (key, ts)
                else F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in l_cols
            ],
            "_side",
            "_ord",
            *[F.col(c).alias(f"_r_{c}") for c in rpay],
        )
    )

    def carry(ascending: bool) -> dict[str, Column]:
        order = [
            F.col("_ord").asc() if ascending else F.col("_ord").desc(),
            F.col("_side").asc(),  # equal-ts right rows stay eligible
        ]
        w = (
            Window.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in rpay}

    if direction == "backward":
        m = carry(True)
    elif direction == "forward":
        m = carry(False)
    else:
        b, fw = carry(True), carry(False)
        lsec = _seconds(F.col("_ord"), ts_type)
        bd = F.abs(lsec - _seconds(b[_MATCH_TS], ts_type))
        fd = F.abs(lsec - _seconds(fw[_MATCH_TS], ts_type))
        use_b = fw[_MATCH_TS].isNull() | (b[_MATCH_TS].isNotNull() & (bd <= fd))
        m = {c: F.when(use_b, b[c]).otherwise(fw[c]) for c in rpay}

    out_cols = dict(m)
    if tolerance is not None:
        delta = F.abs(
            _seconds(F.col("_ord"), ts_type) - _seconds(m[_MATCH_TS], ts_type)
        )
        within = delta <= F.lit(float(tolerance))
        out_cols = {c: F.when(within, m[c]) for c in payload}

    carried = both.select(
        *l_cols,
        "_side",
        *[out_cols[c].alias(f"{c}{suffix}") for c in payload],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
