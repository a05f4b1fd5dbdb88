"""`full` mode — chunked full table migration (SURVEY.md §3.1).

Reference pipeline: snapshot SCN → chunk split → per-chunk
SELECT-normalize-INSERT through three nested worker pools
(/root/reference/module/migrate/sql/oracle/o2m/full.go:66-385).

Spark-first shape: ONE declarative job per table —
read → normalize select → repartitionByRange(split key) → write.
Partitions are the chunks; Spark's scheduler is the worker pool; the
chunk plan is persisted only for resume bookkeeping. Failed-chunk
retry re-runs with the chunk predicate pushed into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from transferdb_spark.operators.normalize import normalize_projection
from transferdb_spark.plans.chunker import elect_split_key, plan_chunks, plan_chunks_quantile
from transferdb_spark.state.store import FAILED, SUCCESS, StateStore


def full_migrate_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    workdir: str,
    n_chunks: int = 32,
    key: str | None = None,
    normalize: bool = False,
    store: StateStore | None = None,
    user_range: str | None = None,
    partition_cols: list[str] | None = None,
    chunk_strategy: str = "width",
) -> str:
    """Migrate one table to the parquet target; returns target path.

    normalize=False keeps native types (lossless lakehouse landing);
    True applies the reference's canonical string projection (P1).
    user_range is the P5 operator — a user WHERE clause ANDed with
    every chunk predicate (reference merges config `range` into chunk
    SQL, module/migrate/sql/oracle/o2m/full.go:740-804); Catalyst
    pushes it into the scan alongside the chunk ranges.
    partition_cols writes a hive-partitioned layout (the 100 TB table
    organization: partition pruning serves the dominant filter axis,
    parquet row-group stats serve the rest).
    chunk_strategy="quantile" plans equi-depth chunks from approximate
    key quantiles — use on skewed keys, where fixed-width ranges put
    most of the table in one straggler chunk.
    """
    store = store or StateStore(workdir, "full")
    if user_range:
        df = df.filter(user_range)
    key = key or elect_split_key(df)
    planner = plan_chunks_quantile if chunk_strategy == "quantile" else plan_chunks
    chunks = planner(df, key, n_chunks)
    states = store.init_table(table, chunks)
    pending = store.pending(table)
    target = os.path.join(workdir, "target", table)

    out = normalize_projection(df) if normalize else df

    def _writer(d):
        w = d.write.option("maxRecordsPerFile", 5_000_000)
        if partition_cols:
            # hive-style layout: downstream date/tenant filters become
            # partition pruning (directories skipped, never scanned)
            w = w.partitionBy(*partition_cols)
        return w

    if len(pending) == len(states):
        # fresh run: one job, chunk-aligned range partitioning
        try:
            shaped = (
                out.repartition(n_chunks, *partition_cols)
                if partition_cols
                else out.repartitionByRange(n_chunks, key)
            )
            _writer(shaped).mode("overwrite").parquet(target)
            for c in states:
                store.mark(table, c.chunk_id, SUCCESS)
        except Exception as e:
            for c in states:
                store.mark(table, c.chunk_id, FAILED, str(e)[:500])
            raise
    else:
        # resume: re-run only failed/waiting chunks, predicate pushdown
        for c in pending:
            try:
                _writer(out.filter(c.predicate)).mode("append").parquet(target)
                store.mark(table, c.chunk_id, SUCCESS)
            except Exception as e:
                store.mark(table, c.chunk_id, FAILED, str(e)[:500])
                raise
    return target


def full_migrate(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    tables: list[str] | None = None,
    n_chunks: int = 32,
) -> dict[str, str]:
    """Migrate a set of tables; returns table -> target path."""
    from transferdb_spark.plans.chunker import elect_split_key
    from transferdb_spark.sources.registry import load_tables

    out = {}
    store = StateStore(workdir, "full")
    for name, df in load_tables(spark, sf_dir, include=tables).items():
        try:
            key = elect_split_key(df)
        except ValueError:
            key = None
        if key is None:
            target = os.path.join(workdir, "target", name)
            df.write.mode("overwrite").parquet(target)
            out[name] = target
            continue
        out[name] = full_migrate_table(
            spark, df, name, workdir, n_chunks=n_chunks, key=key, store=store
        )
    return out
