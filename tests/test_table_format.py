"""HAS_TABLE_FORMAT adapter seam: each rename-dance call site must
route its commit through state/table_format the moment the probe
turns true, and keep the dance as fallback when it is false (the
container has no Delta/Iceberg — the fallback paths are the ones the
rest of the suite exercises end-to-end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transferdb_spark.state import table_format as tf


def test_probe_reports_absent_and_verbs_refuse(spark):
    # environment truth: this container has no table format
    assert tf.HAS_TABLE_FORMAT is False and tf.TABLE_FORMAT is None
    df = spark.range(3)
    with pytest.raises(tf.TableFormatUnavailable):
        tf.atomic_overwrite(df, "/tmp/nope")
    with pytest.raises(tf.TableFormatUnavailable):
        tf.atomic_append(df, "/tmp/nope")
    with pytest.raises(tf.TableFormatUnavailable):
        tf.atomic_replace_partition(df, "/tmp/nope", "p", [1])


def _arm(monkeypatch, calls):
    monkeypatch.setattr(tf, "HAS_TABLE_FORMAT", True)
    monkeypatch.setattr(tf, "TABLE_FORMAT", "fake")
    monkeypatch.setattr(
        tf, "atomic_overwrite", lambda df, path: calls.append(("overwrite", path))
    )
    monkeypatch.setattr(
        tf, "atomic_append", lambda df, path: calls.append(("append", path))
    )
    monkeypatch.setattr(
        tf,
        "atomic_replace_partition",
        lambda df, path, col, vals: calls.append(("replace", path, col, list(vals))),
    )
    monkeypatch.setattr(
        tf, "committed_version", lambda spark, path: 41
    )


def test_snapshot_write_routes_through_format(spark, tmp_path, monkeypatch):
    from transferdb_spark.state.snapshots import write_snapshot

    calls: list = []
    _arm(monkeypatch, calls)
    base = str(tmp_path / "snap")
    v = write_snapshot(spark.range(5), base, mode="overwrite")
    assert v == 41 and calls == [("overwrite", base)]
    v = write_snapshot(spark.range(5), base, mode="append")
    assert v == 41 and calls[-1] == ("append", base)
    import os

    assert not os.path.exists(base)  # no staging/manifest dance ran


def test_compact_files_routes_through_format(spark, tmp_path, monkeypatch):
    from transferdb_spark.modes.optimize import compact_files

    path = str(tmp_path / "t")
    spark.range(100).repartition(4).write.parquet(path)
    calls: list = []
    _arm(monkeypatch, calls)
    stats = compact_files(spark, path, n_files=1)
    assert calls == [("overwrite", path)]
    assert stats.files_before == 4 and stats.files_after == 1
    import os

    # dance did not run: original part files untouched, no backup dir
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == 4


def test_corpus_landing_and_compact_route_through_format(spark, tmp_path, monkeypatch):
    from transferdb_spark.streaming import corpus as cp

    # landing: run one availableNow batch with the fake format armed —
    # monkeypatch the module's imported reference via state.table_format
    calls: list = []
    _arm(monkeypatch, calls)

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = cp.ingest_documents_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    assert calls and calls[0][0] == "replace" and calls[0][2] == "batch_id"

    # compact: build a real (fallback-format) store, then arm the fake
    calls.clear()
    monkeypatch.setattr(tf, "HAS_TABLE_FORMAT", False)
    store = str(tmp_path / "store2")
    for bid, rows in enumerate([[(1, "a")], [(2, "b")]]):
        spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
            cp.DIGEST_COL, F.sha2("text", 256)
        ).write.parquet(f"{store}/batch_id={bid}")
    monkeypatch.setattr(tf, "HAS_TABLE_FORMAT", True)
    out = cp.compact_corpus(spark, store)
    assert out["dirs_removed"] == 2
    assert calls == [("replace", store, "batch_id", [0, 1])]
