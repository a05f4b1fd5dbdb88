"""Table-format capability probe + atomic-commit adapter seam.

Three subsystems simulate atomic table commits with rename/overwrite
dances today (correct under the engine's single-writer contract, but
multi-step):

- state/snapshots.py      — staging dir + put-if-absent manifest link
- modes/optimize.py       — staging → backup → rename swap
- streaming/corpus.py     — per-batch_id partition dirs + rename compact
  (the CDC landing in streaming/incr.py shares the batch_id shape)

A real table format (Delta Lake / Iceberg) turns each of those into
ONE atomic commit with snapshot isolation and multi-writer safety.
The container has neither package, so — exactly like streaming/tws.py
gates transformWithState behind HAS_TWS — this module probes the
environment once and exposes the commit verbs the call sites need;
each verb has the table-format implementation written against the
PUBLIC Delta API (delta.io docs: DataFrameWriter.format("delta"),
replaceWhere, time travel) and dispatches to it the moment the probe
turns true. Until then every verb reports unavailable and the call
sites keep their rename-dance fallback — the swap is a flag flip, not
a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _probe() -> str | None:
    """Detect a usable Spark table format. Delta needs BOTH the python
    package and its jars on the session classpath; checking the import
    alone (the cheap half) is safe — configureSparkWithDelta happens at
    session build, so a mid-session probe must not claim more."""
    try:
        import delta  # noqa: F401

        return "delta"
    except ImportError:
        pass
    return None


TABLE_FORMAT = _probe()
HAS_TABLE_FORMAT = TABLE_FORMAT is not None


class TableFormatUnavailable(RuntimeError):
    pass


def _require() -> str:
    if not HAS_TABLE_FORMAT:
        raise TableFormatUnavailable(
            "no table format on the classpath — callers must use their "
            "rename-dance fallback (gate on HAS_TABLE_FORMAT)"
        )
    return TABLE_FORMAT


# ---------------------------------------------------------------------------
# commit verbs — one per call-site shape


def atomic_overwrite(df: DataFrame, path: str) -> None:
    """One-commit full-image replace (optimize.py's swap; snapshots'
    mode='overwrite'). Readers see the old or the new image, never a
    half-renamed directory, and a concurrent writer conflict is a
    transaction error instead of a silent clobber."""
    fmt = _require()
    df.write.format(fmt).mode("overwrite").option(
        "overwriteSchema", "true"
    ).save(path)


def atomic_append(df: DataFrame, path: str) -> None:
    """One-commit append (snapshots' mode='append'; the signature
    store's per-batch adds)."""
    fmt = _require()
    df.write.format(fmt).mode("append").save(path)


def atomic_replace_partition(
    df: DataFrame, path: str, partition_col: str, values: list
) -> None:
    """One-commit partition replace — the corpus store's
    DROP-PARTITION+append and the CDC landing's batch_id overwrite
    collapse into a single replaceWhere commit."""
    fmt = _require()
    in_list = ", ".join(repr(v) for v in values)
    df.write.format(fmt).mode("overwrite").option(
        "replaceWhere", f"{partition_col} IN ({in_list})"
    ).save(path)


def committed_version(spark: SparkSession, path: str) -> int:
    """Latest commit version of a table — write_snapshot's return
    value when the format owns the log (delta.tables.DeltaTable
    history, public API)."""
    _require()
    from delta.tables import DeltaTable  # noqa: PLC0415 — gated import

    return int(
        DeltaTable.forPath(spark, path)
        .history(1)
        .select("version")
        .first()["version"]
    )


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Snapshot read, optionally AS OF a version or a wall-clock
    timestamp — the manifest resolver's job (state/snapshots.
    read_snapshot/resolve_version_at) done by the format's own log
    (Delta versionAsOf/timestampAsOf, public API)."""
    fmt = _require()
    if version is not None and timestamp_ms is not None:
        raise ValueError("pass either version or timestamp_ms, not both")
    reader = spark.read.format(fmt)
    if version is not None:
        reader = reader.option("versionAsOf", version)
    if timestamp_ms is not None:
        import datetime as _dt

        reader = reader.option(
            "timestampAsOf",
            _dt.datetime.fromtimestamp(timestamp_ms / 1000.0).strftime(
                "%Y-%m-%d %H:%M:%S.%f"
            ),
        )
    return reader.load(path)


def is_format_table(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds a committed table of the active format —
    the dispatch predicate the read paths share with the writers, so a
    pre-format manifest/parquet store at the same path keeps its own
    protocol instead of being misread through the format."""
    if not HAS_TABLE_FORMAT:
        return False
    from delta.tables import DeltaTable  # noqa: PLC0415 — gated import

    return bool(DeltaTable.isDeltaTable(spark, path))


def atomic_merge(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str,
    scn_col: str | None = None,
) -> None:
    """One-commit MERGE (upsert by key) — snapshots.merge_snapshot's
    copy-on-write done by the format's own file pruning
    (delta.tables.DeltaTable.merge, public API). scn_col != None is
    the per-key latest-wins gate: a matched row is replaced only when
    the batch's scn is >= the stored one (ties prefer the batch,
    idempotent redelivery), mirroring merge_snapshot exactly."""
    _require()
    from delta.tables import DeltaTable  # noqa: PLC0415 — gated import

    target = DeltaTable.forPath(spark, path).alias("t")
    m = target.merge(batch.alias("s"), f"t.{key} = s.{key}")
    if scn_col is not None:
        m = m.whenMatchedUpdateAll(condition=f"s.{scn_col} >= t.{scn_col}")
    else:
        m = m.whenMatchedUpdateAll()
    m.whenNotMatchedInsertAll().execute()
