"""Stream-stream interval join — last-mile attribution.

The one Structured Streaming join shape the engine did not yet
exercise: TWO unbounded sides joined on a key plus an EVENT-TIME
interval, each side watermarked so the state store can evict rows
that can no longer match (Spark buffers both sides; without the
time-range condition + watermarks the state would grow forever —
the constraint is what makes the join feasible on unbounded input).

Semantics here are click→purchase attribution: every (click,
purchase) pair for the same user where the click happened in the
``within_s`` seconds before the purchase. The BATCH twin
(attribution_pairs) is the oracle-checked definition; the streaming
form must converge to it for event-time-ordered arrivals, which the
batch-equivalence test pins across a micro-batch boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIB_SRC = "click"
ATTRIB_DST = "purchase"
ATTRIB_WITHIN_S = 3600


def attribution_pairs(
    ev: DataFrame,
    src_type: str = ATTRIB_SRC,
    dst_type: str = ATTRIB_DST,
    within_s: int = ATTRIB_WITHIN_S,
) -> DataFrame:
    """Batch twin: all (user_id, src_ts, dst_ts) pairs where a
    src-type event precedes a dst-type event by at most within_s
    seconds (strictly before or simultaneous — ts_src <= ts_dst).
    One shuffle keyed on user_id; the per-user join is bounded by the
    per-user event count, and at 100 TB AQE's skew handling splits a
    hot user the same way sessionize's window does."""
    clicks = ev.where(F.col("event_type") == src_type).select(
        "user_id",
        F.col("ts").alias("src_ts"),
        F.col("event_id").alias("src_event_id"),
    )
    buys = ev.where(F.col("event_type") == dst_type).select(
        "user_id",
        F.col("ts").alias("dst_ts"),
        F.col("event_id").alias("dst_event_id"),
    )
    return (
        clicks.join(buys, "user_id")
        .where(
            (F.col("src_ts") <= F.col("dst_ts"))
            & (
                F.col("dst_ts").cast("double") - F.col("src_ts").cast("double")
                <= F.lit(float(within_s))
            )
        )
        .select(
            "user_id",
            "src_event_id",
            "dst_event_id",
            F.col("src_ts").alias("src_ts"),
            F.col("dst_ts").alias("dst_ts"),
        )
        .orderBy("user_id", "src_event_id", "dst_event_id")
    )


def attribution_pairs_sql(
    src_type: str = ATTRIB_SRC,
    dst_type: str = ATTRIB_DST,
    within_s: int = ATTRIB_WITHIN_S,
) -> str:
    return f"""
SELECT c.user_id,
       c.event_id AS src_event_id,
       p.event_id AS dst_event_id,
       c.ts AS src_ts,
       p.ts AS dst_ts
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = '{src_type}') c
JOIN (SELECT user_id AS p_user, ts, event_id FROM events WHERE event_type = '{dst_type}') p
  ON c.user_id = p.p_user
WHERE c.ts <= p.ts
  AND epoch(p.ts) - epoch(c.ts) <= {float(within_s)}
ORDER BY user_id, src_event_id, dst_event_id
"""


def streaming_attribution_join(
    stream: DataFrame,
    src_type: str = ATTRIB_SRC,
    dst_type: str = ATTRIB_DST,
    within_s: int = ATTRIB_WITHIN_S,
    watermark_s: int = 2 * ATTRIB_WITHIN_S,
) -> DataFrame:
    """Stream-stream inner join with an event-time interval.

    Both sides derive from one input stream (filtered twice — Spark
    treats them as two independent stateful sides), each watermarked
    ``watermark_s`` behind its own max event time. The join condition
    carries the time bound, so Spark derives state-eviction watermarks
    for BOTH buffers: a click older than (purchase watermark -
    within_s) can never match again and is dropped — bounded state on
    unbounded input. Output columns match the batch twin."""
    # raw parquet streams read ts as TIMESTAMP_NTZ (Spark 4), which
    # watermarks reject — same normalization as sources/registry
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = (
        stream.where(F.col("event_type") == src_type)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("src_ts"),
            F.col("event_id").alias("src_event_id"),
        )
        .withWatermark("src_ts", f"{watermark_s} seconds")
    )
    buys = (
        stream.where(F.col("event_type") == dst_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("dst_ts"),
            F.col("event_id").alias("dst_event_id"),
        )
        .withWatermark("dst_ts", f"{watermark_s} seconds")
    )
    return (
        clicks.join(
            buys,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("src_ts") <= F.col("dst_ts"))
            & (
                F.col("dst_ts")
                <= F.col("src_ts") + F.expr(f"INTERVAL {within_s} SECONDS")
            ),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "src_event_id",
            "dst_event_id",
            "src_ts",
            "dst_ts",
        )
    )
