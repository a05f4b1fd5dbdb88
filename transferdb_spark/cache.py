"""Query-scoped persist tracking — the release hook for builder caches.

Several query builders persist a relation that their returned (lazy)
DataFrame consumes more than once — a broadcast self-join side can
never reuse the other side's shuffle stages, so without the persist
the whole input pipeline re-executes per consumer (round-9 changes
13-15). The builder cannot unpersist before the caller acts, so each
call pins one InMemoryRelation for the life of the session.

Contract for long-lived sessions (documented here per the round-9
verdict): after consuming a query's result, call
``release_query_caches()`` (or ``spark.catalog.clearCache()``, which
drops ALL SQL caches) to free builder-pinned relations. The bench
already clears between queries; one-shot driver runs never accumulate
enough to matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# strong refs on purpose: the JVM-side cache outlives the builder's
# Python locals, so a weak ref would be dead by the time a caller
# releases. A DataFrame handle is a few hundred bytes; the registry
# is cleared on release.
_TRACKED: list[DataFrame] = []


def qpersist(df: DataFrame) -> DataFrame:
    """persist() plus registration with the release hook below."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_query_caches() -> int:
    """Unpersist every tracked builder cache; returns the count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # noqa: BLE001 — a dead session must not raise
            pass
    return n
