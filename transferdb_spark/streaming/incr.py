"""Incremental replication — Structured Streaming over the event stream.

The reference's `all` mode polls LogMiner every 300 ms, filters records
by per-table SCN checkpoints (≥/> reset dance for re-read redo), and
applies them through ordered worker pools with UPDATE = DELETE+REPLACE
(/root/reference/module/migrate/sql/oracle/o2m/incr.go:61-247,
public/logminer.go:100-193, o2m/apply.go:58-233).

Structured Streaming replaces every piece of that machinery:
- poll loop        -> micro-batch trigger (ProcessingTime / availableNow)
- SCN checkpoints  -> the streaming checkpoint (offsets, exactly-once)
- ≥/> re-read gate -> idempotent anti-join apply in foreachBatch
- ordered appliers -> per-key dedupe inside the batch + idempotent merge
- late records     -> event-time watermark on windowed aggregations

The `events` fixture plays the redo stream: event_id ≈ SCN (monotone),
event_type ≈ operation, ts = event time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OP_WHITELIST = ("click", "view", "purchase", "signup", "error")


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over event parquet drops.

    Each new file in source_dir is a redo-log batch — the analogue of
    LogMiner's archived-log discovery (T1, incr.go:507-548).
    max_files_per_trigger caps each micro-batch (honored by availableNow
    too), mirroring the reference's bounded per-poll log pull."""
    if schema is None:
        files = [f for f in os.listdir(source_dir) if f.endswith(".parquet")]
        if not files:
            raise ValueError(f"no parquet seed in {source_dir} to infer schema")
        schema = spark.read.parquet(os.path.join(source_dir, files[0])).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # Same source-boundary rule as the batch registry: fixture parquet
    # has shipped as TIMESTAMP_NTZ, which watermarks reject — cast to
    # session-tz TIMESTAMP (epoch-preserving, session tz pinned UTC).
    from transferdb_spark.sources.registry import _normalize_ntz

    return _normalize_ntz(reader.parquet(source_dir))


def filter_ops(stream: DataFrame, min_scn: int = 0) -> DataFrame:
    """P7 — op whitelist + SCN gate (logminer.go:100-193)."""
    return stream.filter(
        (F.col("event_id") > min_scn) & F.col("event_type").isin(*OP_WHITELIST)
    )


def _latest_per_key(batch: DataFrame, key: str, scn_col: str) -> DataFrame:
    """Newest image per business key within one micro-batch — the
    UPDATE = DELETE+REPLACE collapse every applier shares (ties break
    on ts; extend HERE, not per-applier)."""
    return (
        batch.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(F.desc(scn_col), F.desc("ts"))
            ),
        )
        .filter("_rn = 1")
        .drop("_rn")
    )


def apply_cdc_stream(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
    scn_col: str = "event_id",
    available_now: bool = True,
):
    """foreachBatch idempotent apply — the T4-T6 replacement.

    Per-batch IO is O(batch) and NEVER reads the target, so apply cost
    does not grow with target size. Three mechanisms replace the old
    full-target anti-join:

    1. **SCN gate** — the reference drops redo records at or below the
       per-table SCN checkpoint because LogMiner re-reads redo
       (/root/reference/module/migrate/sql/oracle/public/
       logminer.go:134-174). Same here: a tiny driver-side watermark
       (max applied `scn_col`) filters re-delivered records out of each
       batch. State is O(1) per stream, persisted next to the
       checkpoint so restarts keep the gate.
    2. **Batch-idempotent writes** — each micro-batch lands in its own
       `batch_id=N` subdirectory with overwrite, so a batch replayed
       after a failure between write and checkpoint commit rewrites the
       same files instead of duplicating them (the ≥ half of the
       reference's ≥/> dance).
    3. **Latest-wins log** — the target is an append-only change log;
       `cdc_current_state` resolves the newest image per business key
       at read time. An update for an already-applied key therefore
       lands and wins — the parquet analogue of the reference's
       UPDATE = DELETE+REPLACE apply (o2m/apply.go:119-233) — instead
       of being anti-joined away.
    """
    import json

    gate_path = os.path.join(checkpoint_dir, "scn_gate.json")

    def _load_gate() -> dict:
        if os.path.exists(gate_path):
            with open(gate_path) as fh:
                return json.load(fh)
        return {"max_scn": None, "batch_floors": {}}

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        gate = _load_gate()
        bkey = str(batch_id)
        if bkey in gate["batch_floors"]:
            floor = gate["batch_floors"][bkey]  # replayed batch: original gate
        else:
            floor = gate["max_scn"]
        gated = batch if floor is None else batch.filter(F.col(scn_col) > floor)
        latest = _latest_per_key(gated, key, scn_col)
        latest.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"batch_id={batch_id}")
        )
        batch_max = gated.agg(F.max(scn_col)).first()[0]  # one scalar to the driver
        new_max = gate["max_scn"]
        if batch_max is not None:
            new_max = batch_max if new_max is None else max(new_max, batch_max)
        # keep only this batch's floor: earlier batches are committed
        gate = {"max_scn": new_max, "batch_floors": {bkey: floor}}
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(gate_path, "w") as fh:
            json.dump(gate, fh)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="300 milliseconds")  # reference poll cadence
    return writer.start()


def apply_cdc_stream_to_jdbc(
    stream: DataFrame,
    sink,
    checkpoint_dir: str,
    key: str = "event_id",
    scn_col: str = "event_id",
    available_now: bool = True,
):
    """Stream → MERGE into a live JDBC target — the end-to-end analogue
    of the reference's incr apply loop (o2m/apply.go:119-233: ordered
    appliers executing REPLACE against the target database).

    Per micro-batch: dedupe to the newest image per business key
    (latest-wins, the UPDATE = DELETE+REPLACE collapse), then
    JdbcSink.merge_from_staging lands the batch executor-side and runs
    ONE set-based MERGE — re-delivered batches re-merge the same
    images, so the apply is idempotent and the streaming checkpoint's
    at-least-once delivery upgrades to effectively-once on the target.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # persist: the dedupe window feeds the isEmpty probe AND the
        # staging write — without it the shuffle runs twice per batch
        latest = _latest_per_key(batch, key, scn_col).persist()
        try:
            if latest.isEmpty():
                return
            sink.merge_from_staging(
                latest,
                [key],
                staging_table=f"{sink.table}__STG_{batch_id}",
                scn_col=scn_col,
            )
        finally:
            latest.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="300 milliseconds")
    return writer.start()


def apply_cdc_stream_to_snapshot(
    stream: DataFrame,
    base: str,
    checkpoint_dir: str,
    key: str = "event_id",
    scn_col: str = "event_id",
    stat_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Stream → copy-on-write MERGE into the versioned snapshot store —
    the lakehouse twin of apply_cdc_stream_to_jdbc: each micro-batch
    dedupes to the newest image per key and merge_snapshot rewrites
    only the files whose key ranges the batch touches, committing one
    new manifest version per batch (so the CDC history is time-travel
    readable: version N = state after batch N).

    Idempotence: a re-delivered batch re-merges the same images —
    the file set changes but the logical image does not, so
    at-least-once delivery is effectively-once on the table image."""
    from transferdb_spark.state.snapshots import merge_snapshot

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        # persist: the dedupe window feeds the empty probe, the NULL
        # check, the touch test, and the merge write
        latest = _latest_per_key(batch, key, scn_col).persist()
        try:
            if latest.isEmpty():
                return
            # scn_col makes the merge latest-wins PER KEY: a stale
            # event re-delivered in a later batch cannot regress an
            # already-applied newer image
            merge_snapshot(
                batch.sparkSession,
                base,
                latest,
                key,
                stat_cols=stat_cols,
                scn_col=scn_col,
            )
        finally:
            latest.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="300 milliseconds")
    return writer.start()


def cdc_current_state(
    spark: SparkSession, target_dir: str, key: str = "event_id", scn_col: str = "event_id"
) -> DataFrame:
    """Latest-wins view over the CDC change log landed by
    apply_cdc_stream: one row per key, the image with the highest SCN.

    This is where UPDATE semantics live (reference applies
    UPDATE = DELETE+REPLACE into a mutable DB; a parquet log resolves
    it at read time). At 100 TB the window shuffles once on the key —
    or compact periodically by rewriting the log through this view."""
    df = spark.read.parquet(target_dir)
    w = Window.partitionBy(key).orderBy(F.desc(scn_col), F.desc("ts"), F.desc("batch_id"))
    out = df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    return out.drop("batch_id")


def compact_cdc_log(
    spark: SparkSession,
    target_dir: str,
    key: str = "event_id",
    scn_col: str = "event_id",
) -> dict:
    """Compact the landed CDC change log to its current state.

    The change log appends one `batch_id=N` directory per micro-batch,
    so `cdc_current_state` read cost grows with HISTORY. Compaction
    rewrites the log so read cost tracks LIVE KEYS: resolve the newest
    image per key (same latest-wins rule as the read path), land it as
    one snapshot batch directory, and drop the historical ones. SCN
    ordering stays correct because snapshot rows keep their original
    `scn_col` values — a later change always outranks the snapshot.
    The streaming writer keeps appending new batch dirs afterward
    (its epoch ids come from the checkpoint, not from dir names).

    Crash safety on a plain filesystem: the snapshot is first written
    to an underscore-prefixed dir (ignored by Spark's partition
    discovery), old dirs are renamed aside before the snapshot is
    renamed in, and the aside dirs are removed last. A crash mid-swap
    leaves `_old_*` dirs to restore from; production deployments on a
    table format (Delta/Iceberg) get this swap as one atomic commit —
    the reference's meta-DB transaction analogue
    (/root/reference/database/meta/meta.go:100-117).

    Returns {"live_rows", "dirs_removed"}.
    """
    import shutil

    old_dirs = sorted(
        d for d in os.listdir(target_dir) if d.startswith("batch_id=")
    )
    if len(old_dirs) <= 1:
        return {"live_rows": None, "dirs_removed": 0}
    max_bid = max(int(d.split("=", 1)[1]) for d in old_dirs)

    snap = cdc_current_state(spark, target_dir, key=key, scn_col=scn_col)
    tmp = os.path.join(target_dir, "_compact_tmp")
    snap.write.mode("overwrite").parquet(tmp)
    live_rows = spark.read.parquet(tmp).count()

    aside = []
    for d in old_dirs:
        src = os.path.join(target_dir, d)
        dst = os.path.join(target_dir, f"_old_{d}")
        os.rename(src, dst)
        aside.append(dst)
    os.rename(tmp, os.path.join(target_dir, f"batch_id={max_bid}"))
    for d in aside:
        shutil.rmtree(d)
    return {"live_rows": live_rows, "dirs_removed": len(old_dirs)}


def hourly_rollup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T-family windowed aggregation with late-data watermark.

    The reference has no window semantics (SCN ordering only) — this is
    the Spark-native upgrade: tumbling 1h windows, late events beyond
    the watermark dropped deterministically."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def run_rollup_to_memory(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, name: str = "rollup"
):
    """Drive the rollup with availableNow into an in-memory sink
    (complete mode) — the test/verification harness path.

    Sizing note: a streaming aggregation's STATE partition count is
    spark.sql.shuffle.partitions at the query's FIRST start and is
    pinned into the checkpoint permanently — set it to the expected
    state volume (keys, not input rows) BEFORE first start; per-task
    state-store overhead makes oversizing expensive at every trigger."""
    stream = stream_events(spark, source_dir)
    q = (
        hourly_rollup_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q


def session_window_stream(stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Dynamic-gap session windows per user — the streaming twin of the
    batch sessionize operator. State closes when event time passes
    session end + watermark, so state size tracks *open* sessions
    (active users), not stream length."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_sessions_to_memory(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, name: str = "sessions"
):
    stream = stream_events(spark, source_dir)
    return (
        session_window_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once record stream from an at-least-once source.

    dropDuplicatesWithinWatermark keeps one copy of each key and
    expires its dedup state once event time passes the watermark —
    bounded state, unlike dropDuplicates' grow-forever set. This is
    the streaming-native form of the reference's ≥/> SCN re-read gate
    (logminer.go:134-174): re-delivered redo inside the window is
    dropped by key, not by offset arithmetic."""
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream_with_dimension(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: every micro-batch joins the latest snapshot
    of the dimension (broadcast — never a stateful stream-stream join
    when one side is a table). The migrate analogue: tagging CDC rows
    with rule/catalog metadata."""
    return stream.join(F.broadcast(dim), on, "left")


def attribution_join_stream(
    clicks: DataFrame, purchases: DataFrame, within: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream inner join bounded by an event-time range: each
    purchase is attributed to the same user's click(s) in the preceding
    `within` interval.

    Both sides carry watermarks AND the join condition bounds the two
    event times relative to each other, so Spark can evict join state
    as the watermark advances — state size tracks the `within` window,
    not stream length. Without the range condition this would be an
    unbounded-state join, which does not survive at scale.

    The reference has no stream-stream semantics (SCN ordering only,
    incr.go:61-247) — this is the Spark-native upgrade. ``watermark``
    (default: the join window itself) is the lateness allowance; the
    one-source wrapper with the ORACLED batch twin lives in
    streaming/joins.py and delegates here."""
    wm = watermark or within
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", wm)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", wm)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
