"""transformWithState implementations of the stateful trio.

Spark 4's transformWithStateInPandas is the successor to
applyInPandasWithState: named state variables (value/list/map) with
native TTL, first-class timers in processing OR event time, and
initial-state bootstrap. This module is the branch-gated migration
spike for the three custom stateful operators in streaming/stateful.py
(per-user activity profile, first-seen-wins dedup, event-time gap
sessionization) — same semantics, verified by the same equivalence
tests; the applyInPandasWithState versions remain the fallback while
the newer API stabilizes.

What the new API buys at scale:
- streaming_dedup's hand-rolled TTL timeout dance collapses into
  `getValueState(..., ttlDurationMs=...)` — the state store owns
  eviction, so the idle-tick eviction batches disappear.
- sessionize's watermark closure is an explicit event-time TIMER per
  open session instead of a per-key timeout slot, and stale timers
  are deletable — the closure logic is local and auditable.
- state is named and typed per variable, so adding a second state
  column is additive instead of a schema migration of one tuple.

Gate on HAS_TWS before calling; importing this module is always safe.
HAS_TWS requires BOTH the API (Spark >= 4.0) and the `protobuf`
package — transformWithState's state-server protocol is protobuf-framed
(pyspark/sql/streaming/proto/StateMessage_pb2), and without it the TWS
driver worker crashes at init with
`ImportError: cannot import name 'descriptor' from 'google.protobuf'`.
This container ships no protobuf, so the applyInPandasWithState trio
remains the production path here; environments with protobuf flip the
gate and run the same equivalence tests (tests/test_tws.py) live.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.group import GroupedData


def _tws_available() -> bool:
    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


HAS_TWS = _tws_available()

if HAS_TWS:
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )
else:  # pragma: no cover - environment without Spark 4 TWS
    class StatefulProcessor:  # type: ignore[no-redef]
        pass

    StatefulProcessorHandle = TimerValues = ExpiredTimerInfo = Any  # type: ignore


from transferdb_spark.streaming.stateful import (
    DEDUP_OUTPUT_SCHEMA,
    OUTPUT_SCHEMA,
    SESSION_OUTPUT_SCHEMA,
)


class _ProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", "cnt LONG, total DOUBLE, last_ms LONG"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cnt, total, last_ms = (
            self._state.get() if self._state.exists() else (0, 0.0, None)
        )
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = int(pdf["ts_ms"].max())
            if last_ms is None or batch_max > last_ms:
                last_ms = batch_max
        self._state.update((cnt, total, last_ms))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "cnt": [cnt],
                "total": [total],
                "last_ts": [pd.Timestamp(last_ms, unit="ms", tz="UTC")],
            }
        )

    def close(self) -> None:
        pass


def user_activity_profile_tws(stream: DataFrame) -> DataFrame:
    """transformWithState twin of stateful.user_activity_profile."""
    return (
        stream.select(
            "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            _ProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


class _DedupProcessor(StatefulProcessor):
    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        # native state TTL replaces the manual ProcessingTimeTimeout
        # eviction of the applyInPandasWithState version
        self._state = handle.getValueState(
            "seen", "first_id LONG, n_dups LONG", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        if self._state.exists():
            first_id, n_dups = self._state.get()
            self._state.update((first_id, n_dups + len(pdf)))
            return
        w = pdf.loc[pdf["doc_id"].idxmin()]
        self._state.update((int(w["doc_id"]), len(pdf) - 1))
        yield pd.DataFrame({"doc_id": [int(w["doc_id"])], "text": [w["text"]]})

    def close(self) -> None:
        pass


def streaming_dedup_tws(
    stream: DataFrame, text_col: str = "text", ttl_ms: int | None = None
) -> DataFrame:
    """transformWithState twin of stateful.streaming_dedup (exact
    first-seen-wins; survivor column always emitted as `text`)."""
    hashed = stream.withColumn("__h", F.xxhash64(F.col(text_col)))
    return (
        hashed.select(
            "__h",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        .groupBy("__h")
        .transformWithStateInPandas(
            _DedupProcessor(ttl_ms),
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="processingtime" if ttl_ms is not None else "none",
        )
    )


class _SessionizeProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "sess", "start_ms LONG, last_ms LONG, n_events LONG, sum_value DOUBLE"
        )

    @staticmethod
    def _emit(user_id, start_ms, last_ms, n, total) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "session_start": [pd.Timestamp(start_ms, unit="ms", tz="UTC")],
                "session_end": [pd.Timestamp(last_ms, unit="ms", tz="UTC")],
                "n_events": [int(n)],
                "sum_value": [float(total)],
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ts_ms")
        open_sess = self._state.get() if self._state.exists() else None
        for t, value in zip(pdf["ts_ms"], pdf["value"]):
            t = int(t)
            v = float(value) if value is not None else 0.0
            if open_sess is None:
                open_sess = (t, t, 1, v)
            elif t - open_sess[1] > self._gap_ms:
                yield self._emit(user_id, *open_sess)
                open_sess = (t, t, 1, v)
            else:
                open_sess = (
                    min(open_sess[0], t),
                    max(open_sess[1], t),
                    open_sess[2] + 1,
                    open_sess[3] + v,
                )
        self._state.update(tuple(open_sess))
        # ONE live closure timer per open session: event-time timers
        # are per-(key, timestamp), so drop the stale one before
        # registering at the new last+gap
        for ts in list(self._handle.listTimers()):
            self._handle.deleteTimer(ts)
        self._handle.registerTimer(open_sess[1] + self._gap_ms)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            start_ms, last_ms, n, total = self._state.get()
            # guard against a stale timer racing a just-extended session
            if expiredTimerInfo.getExpiryTimeInMs() >= last_ms + self._gap_ms:
                self._state.clear()
                yield self._emit(user_id, start_ms, last_ms, n, total)

    def close(self) -> None:
        pass


def streaming_sessionize_tws(
    stream: DataFrame, gap_s: float = 1800.0, watermark: str = "1 hour"
) -> DataFrame:
    """transformWithState twin of stateful.streaming_sessionize:
    closed gap-sessions as an append stream, watermark-driven closure
    via per-session event-time timers."""
    return (
        stream.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .withColumn("ts_ms", F.unix_millis("ts"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            _SessionizeProcessor(int(gap_s * 1000)),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventtime",
        )
    )
