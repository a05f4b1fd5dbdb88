"""Streaming heavy-hitter tracking — Count-Min sketches over a
document stream.

The batch sketch (ext/sketches.py) answers "what are the hot tokens in
THIS corpus"; a live pipeline wants the running answer as drops arrive.
CMS mergeability makes this the cheapest stateful query in the system:
each micro-batch reduces to a PARTIAL sketch of at most d·w cells, the
partials land in `batch_id=N` directories (overwrite → replay-safe,
same idempotence architecture as streaming/corpus.py), and the current
sketch is the cell-wise SUM of all partials at read time. No stream
state store at all — the sketch IS the state, and it is bounded by
d·w·batches bytes regardless of stream volume.

At 100 TB/day: per-batch IO is O(d·w) after the map-side combine
(every task collapses to ≤ d·w cells before the exchange), landing is
one tiny file per batch, and `compact_sketch` folds history into one
d·w-row snapshot so read cost stays flat (on a table format that swap
is a single atomic commit)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferdb_spark.ext.sketches import cms_sketch


def ingest_sketch_stream(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch: reduce each micro-batch to its partial CMS and
    land it under batch_id=N (overwrite — a replayed batch rewrites
    the same cells instead of double-counting)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        cms_sketch(batch).write.mode("overwrite").parquet(
            os.path.join(target_dir, f"batch_id={batch_id}")
        )

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


def sketch_current_state(spark: SparkSession, target_dir: str) -> DataFrame:
    """(row, col, cnt): cell-wise sum of every landed partial — the
    exact sketch of everything ingested so far."""
    return (
        spark.read.option("basePath", target_dir)
        .parquet(target_dir)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy("row", "col")
    )


def compact_sketch(spark: SparkSession, target_dir: str) -> int:
    """Fold landed partials into one snapshot; returns the number of
    batch directories folded. Read cost afterwards is one d·w-row file
    however long the stream has run.

    Same discipline as streaming/corpus.py compact_corpus: the batch
    list is FROZEN first and only those directories are read, so a
    batch landing mid-compaction is untouched (merged next time, never
    dropped); folded dirs are renamed aside (underscore prefix — the
    parquet reader skips them) before the snapshot takes the LOWEST
    folded id, so no reader window ever double-counts, and a crash
    leaves the aside dirs recoverable. On a table format this whole
    swap is one atomic commit."""
    batches = sorted(d for d in os.listdir(target_dir) if d.startswith("batch_id="))
    if len(batches) <= 1:
        return 0
    min_bid = min(int(d.split("=", 1)[1]) for d in batches)
    merged = (
        spark.read.option("basePath", target_dir)
        .parquet(*[os.path.join(target_dir, d) for d in batches])
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()  # <= d*w rows
    )
    snap = spark.createDataFrame(
        [(int(r["row"]), int(r["col"]), int(r["cnt"])) for r in merged],
        "row int, col int, cnt bigint",
    )
    tmp = os.path.join(target_dir, "_compact_tmp")
    snap.coalesce(1).write.mode("overwrite").parquet(tmp)
    aside = []
    for d in batches:
        dst = os.path.join(target_dir, f"_old_{d}")
        os.rename(os.path.join(target_dir, d), dst)
        aside.append(dst)
    os.rename(tmp, os.path.join(target_dir, f"batch_id={min_bid}"))
    for d in aside:
        shutil.rmtree(d)
    return len(batches)
