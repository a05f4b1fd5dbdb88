"""`all`-mode LIVE sink: redo-SQL micro-batches applied to a JDBC
target transactionally, with a persisted SCN checkpoint.

This is the reference's full incremental loop
(/root/reference/module/migrate/sql/oracle/o2m/incr.go:61-247) on
Structured Streaming: each micro-batch of (scn, xid, sql_redo) rows is
parsed executor-side (streaming/redo.redo_stream_to_changes,
mapInPandas), grouped into commit-SCN-ordered transactions
(group_transactions), translated to the target dialect
(translate_stmt) and executed one JDBC TRANSACTION per redo
transaction (modes/apply.apply_transactions — rollback-whole,
commit-SCN resume gate). The SCN high-water persists next to the
Spark checkpoint, so a redelivered batch (or a whole re-run over the
same feed) replays idempotently — the incr_sync_meta semantics.

Two apply executors, by what the target connection can be:

- apply_redo_batch — JDBC target (Derby-tested). JDBC lives behind
  py4j, which only exists on the DRIVER, so the statements must cross
  it; but parse AND translate run executor-side (mapInPandas) and the
  driver pulls translated transactions one PARTITION at a time via
  toLocalIterator — it never materializes a batch's change payload.
- apply_changes_distributed — DBAPI target (any Python driver:
  psycopg2/pymysql/sqlite3…). Fully executor-side: per-table apply
  units repartitioned by table, commit-SCN-ordered within each
  partition, applied through per-partition connections; the driver
  sees only the tiny (table, xid, scn, status) rows. This mirrors the
  reference's per-table worker map + per-table SCN checkpoint
  (/root/reference/module/migrate/sql/oracle/o2m/apply.go:58-233).

The structured MERGE path (streaming/incr.py) remains the preferred
sink when before/after images are available; this is the text-redo
path the reference runs when they are not.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferdb_spark.modes.apply import ApplyResult, apply_transactions
from transferdb_spark.sources.jdbc import JdbcSink
from transferdb_spark.streaming.redo import (
    RedoStmt,
    group_table_transactions,
    group_transactions,
    redo_stream_to_changes,
    translate_stmt,
    translate_transactions_df,
)


def read_scn_checkpoint(path: str) -> int:
    if not os.path.exists(path):
        return -1
    with open(path) as fh:
        return int(json.load(fh)["scn"])


def write_scn_checkpoint(path: str, scn: int) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"scn": scn}, fh)
    os.rename(tmp, path)  # single-writer (the streaming query) — atomic swap


def _stmt_from_change(c) -> RedoStmt:
    """Rebuild a RedoStmt from one grouped change struct."""
    return RedoStmt(
        operation=c["operation"],
        schema=c["schema_name"],
        table=c["table_name"],
        data=json.loads(c["data_json"]),
        before=json.loads(c["before_json"]),
    )


def apply_redo_batch(
    spark: SparkSession,
    sink: JdbcSink,
    batch: DataFrame,
    scn_path: str,
    target_schema: str = "",
    dialect: str = "ansi",
) -> ApplyResult:
    """One micro-batch: parse -> group -> translate (all executor-side)
    -> transactional apply gated on the persisted SCN; advances the
    checkpoint to the new high-water AFTER the apply (crash before the
    write = the batch replays, and the SCN gate + rollback-whole txns
    make the replay idempotent).

    Driver memory is bounded by ONE shuffle partition of translated
    statement text: toLocalIterator pulls partitions sequentially, so
    a hot batch's full change payload never lands on the driver — only
    the SQL the driver's JDBC connection must ship anyway, a partition
    at a time."""
    changes = redo_stream_to_changes(batch.select("scn", "sql_redo")).join(
        batch.select("scn", "xid"), "scn"
    )
    changes = changes.filter("operation <> 'ERROR'")
    txn_sql = translate_transactions_df(
        group_transactions(changes), target_schema, dialect=dialect
    ).orderBy("commit_scn", "xid")

    def txn_iter():
        for row in txn_sql.toLocalIterator():
            yield row["xid"], list(row["stmts"]), int(row["commit_scn"])

    resume = read_scn_checkpoint(scn_path)
    res = apply_transactions(spark, sink, txn_iter(), resume_scn=resume)
    if res.high_scn > resume:
        write_scn_checkpoint(scn_path, res.high_scn)
    return res


# ---------------------------------------------------------------------------
# fully distributed apply — DBAPI targets

APPLY_STATUS_SCHEMA = (
    "table_name string, xid string, commit_scn long, status string, "
    "error string, worker_pid long"
)


def apply_changes_distributed(
    changes: DataFrame,
    connect,
    resume_scn: int = -1,
    target_schema: str = "",
    dialect: str = "ansi",
    num_partitions: int | None = None,
    resume_scns: dict[str, int] | None = None,
) -> DataFrame:
    """Executor-side transactional apply — no driver round-trip for
    row data at all. ``connect`` is a zero-arg factory returning a
    DBAPI connection (psycopg2/pymysql/sqlite3…), cloudpickled to the
    executors; each partition opens ONE connection and applies its
    transactions in commit-SCN order.

    Ordering contract (the reference's own, apply.go:58-77 — its
    worker map is keyed by TABLE and its SCN checkpoint is per-table):
    apply units are (table, xid) groups, repartitioned BY TABLE and
    sorted by commit_scn within each partition, so every table sees
    its changes in commit order while distinct tables apply
    concurrently across executors. Cross-table atomicity of one source
    txn is intentionally relaxed exactly as the reference relaxes it.

    Returns the (table_name, xid, commit_scn, status, error,
    worker_pid) status relation — the ONLY thing that should ever be
    collected; aggregate max(commit_scn) WHERE status='applied' per
    table for the checkpoint (per-table incr_sync_meta semantics).
    Each txn is committed whole or rolled back whole; units at or
    below the resume SCN are reported 'skipped' without touching the
    target. ``resume_scns`` is the per-TABLE gate ({table: high_scn},
    the incr_sync_meta TableScnS shape produced by
    distributed_apply_high_scns); the scalar ``resume_scn`` remains as
    a global floor applied to every table."""
    units = translate_transactions_df(
        group_table_transactions(changes), target_schema, dialect=dialect
    )
    n = num_partitions or units.sparkSession.sparkContext.defaultParallelism
    parts = units.repartition(n, "table_name").sortWithinPartitions(
        "table_name", "commit_scn", "xid"
    )

    gates = dict(resume_scns or {})

    def apply_partition(batches):
        import os as _os

        import pandas as pd

        pid = _os.getpid()
        conn = None
        try:
            for pdf in batches:
                if len(pdf) and conn is None:
                    conn = connect()
                out = []
                for i in range(len(pdf)):
                    r = pdf.iloc[i]
                    scn = int(r["commit_scn"])
                    if scn <= max(resume_scn, gates.get(r["table_name"], -1)):
                        out.append((r["table_name"], r["xid"], scn, "skipped", "", pid))
                        continue
                    runnable = [
                        s2
                        for s2 in (s.strip().rstrip(";").strip() for s in r["stmts"])
                        if s2 and not s2.startswith("--")
                    ]
                    if not runnable:
                        # comment-only unit (UNTRANSLATABLE quarantine)
                        out.append(
                            (r["table_name"], r["xid"], scn, "skipped",
                             "; ".join(r["stmts"])[:500], pid)
                        )
                        continue
                    try:
                        cur = conn.cursor()
                        try:
                            for s in runnable:
                                cur.execute(s)
                        finally:
                            cur.close()
                        conn.commit()
                        out.append((r["table_name"], r["xid"], scn, "applied", "", pid))
                    except Exception as e:  # noqa: BLE001 — rollback + quarantine
                        conn.rollback()
                        out.append(
                            (
                                r["table_name"],
                                r["xid"],
                                scn,
                                "failed",
                                str(e).splitlines()[0][:500],
                                pid,
                            )
                        )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "table_name",
                        "xid",
                        "commit_scn",
                        "status",
                        "error",
                        "worker_pid",
                    ],
                )
        finally:
            if conn is not None:
                conn.close()

    return parts.mapInPandas(apply_partition, schema=APPLY_STATUS_SCHEMA)


def distributed_apply_high_scns(status: DataFrame) -> DataFrame:
    """Per-table applied high-water — the rows to persist as the
    per-table SCN checkpoint (reference incr_sync_meta TableScnS)."""
    return (
        status.where(F.col("status") == "applied")
        .groupBy("table_name")
        .agg(F.max("commit_scn").alias("high_scn"))
    )


def read_table_scns(path: str) -> dict[str, int]:
    """Per-table SCN checkpoint file — the incr_sync_meta twin of the
    scalar read_scn_checkpoint."""
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return {k: int(v) for k, v in json.load(fh).items()}


def write_table_scns(path: str, highs: dict[str, int]) -> None:
    """Merge the batch's per-table high-waters into the checkpoint
    (max-wins — a replayed batch can never regress a table's SCN)."""
    cur = read_table_scns(path)
    for t, s in highs.items():
        cur[t] = max(int(s), cur.get(t, -1))
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(cur, fh)
    os.rename(tmp, path)  # single-writer (the streaming query)


def run_redo_apply_stream_dbapi(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    connect,
    scn_path: str,
    target_schema: str = "",
    dialect: str = "ansi",
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """The fully DISTRIBUTED live loop: a JSON-lines redo feed streams
    through executor-side parse → per-table transaction grouping →
    per-partition DBAPI apply; the driver touches only the per-table
    status/SCN rows. Crash-safe exactly like the JDBC loop: the
    per-table checkpoint advances AFTER each batch's apply, and a
    redelivered batch is gated out per table by its own high SCN."""

    stream = (
        spark.readStream.schema("scn long, xid string, sql_redo string")
        .json(source_dir)
    )

    def sink_batch(batch: DataFrame, _batch_id: int) -> None:
        changes = redo_stream_to_changes(batch.select("scn", "sql_redo")).join(
            batch.select("scn", "xid"), "scn"
        ).filter("operation <> 'ERROR'")
        status = apply_changes_distributed(
            changes,
            connect,
            target_schema=target_schema,
            dialect=dialect,
            num_partitions=num_partitions,
            resume_scns=read_table_scns(scn_path),
        )
        highs = {
            r["table_name"]: int(r["high_scn"])
            for r in distributed_apply_high_scns(status).collect()
        }
        if highs:
            write_table_scns(scn_path, highs)

    writer = stream.writeStream.foreachBatch(sink_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_redo_apply_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink: JdbcSink,
    scn_path: str,
    target_schema: str = "",
    dialect: str = "ansi",
    available_now: bool = True,
):
    """Stream a JSON-lines redo feed ((scn, xid, sql_redo) rows, one
    file per log drop — the LogMiner file-batch shape T1 polls) into
    the live transactional apply."""
    stream = (
        spark.readStream.schema("scn long, xid string, sql_redo string")
        .json(source_dir)
    )

    def sink_batch(batch: DataFrame, _batch_id: int) -> None:
        apply_redo_batch(
            spark, sink, batch, scn_path, target_schema=target_schema, dialect=dialect
        )

    writer = stream.writeStream.foreachBatch(sink_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
