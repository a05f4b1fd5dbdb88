"""Range (interval) join — bucketed equi-join decomposition.

Joining points to containing intervals (`p.ts BETWEEN i.start AND
i.end`) has no hash-join form: Spark plans a raw inequality join as
BroadcastNestedLoopJoin — O(|points| × |intervals|), hopeless at
scale. The standard decomposition: quantize time into coarse buckets,
explode each interval into the buckets it covers, equi-join points to
interval-buckets on the bucket id (hash join!), then refine with the
exact predicate. Cost: O(|points| + Σ interval_spans/bucket) shuffle
rows — choose the bucket width near the median interval length so
most intervals land in 1-2 buckets.

DuckDB executes the plain theta join fine at oracle scale, giving an
independent implementation to verify against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int = 3600,
    extra_key: str | None = None,
) -> DataFrame:
    """Rows of `points` × matching `intervals` (inclusive bounds).

    extra_key adds an equality dimension (e.g. user_id) to both the
    bucket join and the refine — the usual per-entity range join."""

    def bucket_of(col: Column) -> Column:
        return (col.cast("long") / bucket_width).cast("long")

    pts = points.withColumn("_b", bucket_of(F.col(point_ts)))
    ivl = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(bucket_of(F.col(start)), bucket_of(F.col(end)))
        ),
    )
    on = [pts["_b"] == ivl["_b"]]
    if extra_key:
        on.append(pts[extra_key] == ivl[extra_key])
    refined = pts.join(ivl, on).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    drop = [ivl["_b"], pts["_b"]] + ([ivl[extra_key]] if extra_key else [])
    out = refined
    for c in drop:
        out = out.drop(c)
    return out
