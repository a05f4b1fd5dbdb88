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
    """Fold all landed partials into one batch_id=0 snapshot; returns
    the number of batch directories removed. Read cost afterwards is
    one d·w-row file however long the stream has run."""
    merged = sketch_current_state(spark, target_dir).collect()  # <= d*w rows
    batches = [d for d in os.listdir(target_dir) if d.startswith("batch_id=")]
    snap = spark.createDataFrame(merged, "row int, col int, cnt bigint")
    tmp = os.path.join(target_dir, "_compact_tmp")
    snap.coalesce(1).write.mode("overwrite").parquet(tmp)
    for d in batches:
        shutil.rmtree(os.path.join(target_dir, d))
    os.rename(tmp, os.path.join(target_dir, "batch_id=0"))
    return len(batches)
