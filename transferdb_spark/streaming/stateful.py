"""Custom stateful streaming operator — applyInPandasWithState.

The reference has no user-extensible stateful operators (its only state
is the SCN checkpoint). This is the Spark-native extension point for
them: arbitrary per-key state evolved across micro-batches with
exactly-once semantics from the streaming checkpoint.

Operator: running per-user activity profile over the event stream —
event count, value sum, last-seen timestamp — emitted as an update
stream. At scale, state is partitioned by key across executors and
bounded by the key count (plus optional timeouts for eviction).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cnt LONG, total DOUBLE, last_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, total, last_ts = state.get
    else:
        cnt, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((cnt, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "cnt": [cnt], "total": [total], "last_ts": [last_ts]}
    )


def user_activity_profile(stream: DataFrame) -> DataFrame:
    """Evolve per-user (count, sum, last_ts) state across batches."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_profile_to_memory(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    name: str = "profiles",
    max_files_per_trigger: int | None = None,
):
    from transferdb_spark.streaming.incr import stream_events

    stream = stream_events(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    return (
        user_activity_profile(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
