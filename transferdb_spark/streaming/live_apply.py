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

Driver traffic per batch = the transaction STATEMENTS (which must
reach the driver anyway to run over JDBC) — the parse itself is
distributed; only the translated apply unit collects. The structured
MERGE path (streaming/incr.py) remains the preferred sink when
before/after images are available; this is the text-redo path the
reference runs when they are not.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from transferdb_spark.modes.apply import ApplyResult, apply_transactions
from transferdb_spark.sources.jdbc import JdbcSink
from transferdb_spark.streaming.redo import (
    RedoStmt,
    group_transactions,
    redo_stream_to_changes,
    translate_stmt,
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
    """One micro-batch: parse -> group -> translate -> transactional
    apply gated on the persisted SCN; advances the checkpoint to the
    new high-water AFTER the apply (crash before the write = the
    batch replays, and the SCN gate + rollback-whole txns make the
    replay idempotent)."""
    changes = redo_stream_to_changes(batch.select("scn", "sql_redo")).join(
        batch.select("scn", "xid"), "scn"
    )
    changes = changes.filter("operation <> 'ERROR'")
    txn_rows = group_transactions(changes).collect()

    txns: list[tuple[str, list[str]]] = []
    commit_scns: dict[str, int] = {}
    for t in txn_rows:
        stmts: list[str] = []
        for c in t["changes"]:
            stmts.extend(
                translate_stmt(_stmt_from_change(c), target_schema, dialect=dialect)
            )
        txns.append((t["xid"], stmts))
        commit_scns[t["xid"]] = int(t["commit_scn"])

    resume = read_scn_checkpoint(scn_path)
    res = apply_transactions(
        spark, sink, txns, commit_scns=commit_scns, resume_scn=resume
    )
    if res.high_scn > resume:
        write_scn_checkpoint(scn_path, res.high_scn)
    return res


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
