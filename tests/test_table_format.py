"""HAS_TABLE_FORMAT adapter seam: each rename-dance call site must
route its commit through state/table_format the moment the probe
turns true, and keep the dance as fallback when it is false (the
container has no Delta/Iceberg — the fallback paths are the ones the
rest of the suite exercises end-to-end).

Beyond call-recording dispatch checks, FakeFormat below is a minimal
but REAL versioned format (linear versions on plain parquet) so the
seam is exercised write-THEN-read: snapshots round-trip with time
travel, merge upserts instead of clobbering, and the corpus store's
current-state/compaction read through the format instead of
resurrecting tombstoned rows from a raw directory scan."""

from __future__ import annotations

import os
import uuid

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
    with pytest.raises(tf.TableFormatUnavailable):
        tf.atomic_merge(spark, df, "/tmp/nope", "id")
    with pytest.raises(tf.TableFormatUnavailable):
        tf.read_version(spark, "/tmp/nope")
    assert tf.is_format_table(spark, "/tmp/nope") is False


class FakeFormat:
    """A working stand-in table format: every commit lands a full image
    as a new linear version on plain parquet. Small, but it honors the
    contracts the seam depends on — committed versions are immutable,
    reads resolve through the log (never the directory), and
    partition-replace tombstones the replaced values."""

    def __init__(self, spark, root):
        self.spark = spark
        self.root = str(root)
        self.tables: dict[str, list[str]] = {}

    def _commit(self, df, path) -> int:
        d = os.path.join(self.root, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(d)
        vs = self.tables.setdefault(path, [])
        vs.append(d)
        return len(vs) - 1

    # --- verb twins (same signatures as state.table_format) ---
    def atomic_overwrite(self, df, path):
        self._commit(df, path)

    def atomic_append(self, df, path):
        if path in self.tables:
            df = self.read_version(None, path).unionByName(df)
        self._commit(df, path)

    def atomic_replace_partition(self, df, path, col, vals):
        if path in self.tables:
            keep = self.read_version(None, path).filter(~F.col(col).isin(list(vals)))
            df = keep.unionByName(df)
        self._commit(df, path)

    def atomic_merge(self, spark, batch, path, key, scn_col=None):
        cur = self.read_version(None, path)
        remaining = cur.join(batch.select(key).distinct(), key, "left_anti")
        self._commit(remaining.unionByName(batch), path)

    def read_version(self, spark, path, version=None, timestamp_ms=None):
        vs = self.tables[path]
        return self.spark.read.parquet(vs[-1 if version is None else version])

    def committed_version(self, spark, path):
        return len(self.tables[path]) - 1

    def is_format_table(self, spark, path):
        return path in self.tables


def _arm(monkeypatch, spark, tmp_path):
    fake = FakeFormat(spark, tmp_path / "_format_data")
    monkeypatch.setattr(tf, "HAS_TABLE_FORMAT", True)
    monkeypatch.setattr(tf, "TABLE_FORMAT", "fake")
    for verb in (
        "atomic_overwrite",
        "atomic_append",
        "atomic_replace_partition",
        "atomic_merge",
        "read_version",
        "committed_version",
        "is_format_table",
    ):
        monkeypatch.setattr(tf, verb, getattr(fake, verb))
    return fake


def test_snapshot_write_then_read_round_trip_with_time_travel(
    spark, tmp_path, monkeypatch
):
    """ADVICE regression: the seam must not be write-only. write →
    read must resolve through the format, including version time
    travel, with NO manifest/staging protocol artifacts on disk."""
    from transferdb_spark.state.snapshots import read_snapshot, write_snapshot

    fake = _arm(monkeypatch, spark, tmp_path)
    base = str(tmp_path / "snap")
    v0 = write_snapshot(spark.range(5), base, mode="overwrite")
    v1 = write_snapshot(spark.range(5, 8), base, mode="append")
    assert (v0, v1) == (0, 1)
    assert not os.path.exists(base)  # the format owns the layout

    got = {r["id"] for r in read_snapshot(spark, base).collect()}
    assert got == set(range(8))
    old = {r["id"] for r in read_snapshot(spark, base, version=0).collect()}
    assert old == set(range(5))
    # predicate becomes a residual filter (format does its own skipping)
    pruned = {
        r["id"]
        for r in read_snapshot(spark, base, predicate=("id", 2, 6)).collect()
    }
    assert pruned == {2, 3, 4, 5, 6}
    assert fake.committed_version(spark, base) == 1


def test_merge_snapshot_on_format_store_upserts_not_clobbers(
    spark, tmp_path, monkeypatch
):
    """ADVICE regression (the exact reported failure): merge into a
    format-armed store used to see list_versions()==[] and fall back to
    write_snapshot(mode='overwrite') — a full-table clobber. It must
    route to the format MERGE and preserve unmatched rows."""
    from transferdb_spark.state.snapshots import merge_snapshot, write_snapshot

    _arm(monkeypatch, spark, tmp_path)
    base = str(tmp_path / "m")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"]), base
    )
    merge_snapshot(
        spark, base, spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"]), key="k"
    )
    from transferdb_spark.state.snapshots import read_snapshot

    got = {(r["k"], r["v"]) for r in read_snapshot(spark, base).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}  # 1,3 survived

    with pytest.raises(ValueError, match="union"):
        merge_snapshot(
            spark, base, spark.createDataFrame([(5, "e")], ["k", "v"]),
            key="k", evolution="union",
        )


def test_manifest_store_keeps_manifest_protocol_when_format_arms(
    spark, tmp_path, monkeypatch
):
    """One protocol per store: a PRE-FORMAT manifest store must keep
    reading/writing/merging through its manifests after the format
    arrives — never a format write on top of a manifest layout."""
    from transferdb_spark.state.snapshots import (
        list_versions,
        merge_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = str(tmp_path / "legacy")
    assert tf.HAS_TABLE_FORMAT is False
    write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), base)

    fake = _arm(monkeypatch, spark, tmp_path)
    v = write_snapshot(
        spark.createDataFrame([(9, "z")], ["k", "v"]), base, mode="append"
    )
    assert v == 1 and list_versions(base) == [0, 1]
    merge_snapshot(spark, base, spark.createDataFrame([(2, "B")], ["k", "v"]), key="k")
    got = {(r["k"], r["v"]) for r in read_snapshot(spark, base).collect()}
    assert got == {(1, "a"), (2, "B"), (9, "z")}
    assert fake.tables == {}  # the format never touched this store


def test_corpus_store_round_trip_through_format(spark, tmp_path, monkeypatch):
    """Corpus landing, current-state and compaction all through the
    format: a raw-parquet read of the store directory would resurrect
    tombstoned rows from replaced batches — current_state must read
    the format's live image, and compaction must discover batch ids
    from the table, not a batch_id= dir listing (which doesn't exist)."""
    from transferdb_spark.streaming import corpus as cp

    fake = _arm(monkeypatch, spark, tmp_path)
    store = str(tmp_path / "store")

    def land(bid, rows):
        df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
            cp.DIGEST_COL, F.sha2("text", 256)
        ).withColumn("batch_id", F.lit(bid))
        tf.atomic_replace_partition(df, store, "batch_id", [bid])

    land(0, [(1, "a"), (2, "b")])
    land(1, [(3, "a"), (4, "c")])  # doc 3 dups doc 1's text
    # replay of batch 1 lands a corrected image — the format tombstones
    # the old batch-1 rows; a raw dir read would still see doc 4
    land(1, [(3, "a"), (5, "d")])

    state = cp.corpus_current_state(spark, store)
    got = {(r["doc_id"], r["text"]) for r in state.collect()}
    assert got == {(1, "a"), (2, "b"), (5, "d")}  # first-wins, no doc 4

    out = cp.compact_corpus(spark, store)
    assert out["dirs_removed"] == 2
    after = {
        (r["doc_id"], r["text"])
        for r in cp.corpus_current_state(spark, store).collect()
    }
    assert after == got
    # compaction collapsed the store to ONE live batch id
    ids = {
        r["batch_id"]
        for r in fake.read_version(spark, store).select("batch_id").collect()
    }
    assert ids == {0}


def test_corpus_landing_routes_through_format(spark, tmp_path, monkeypatch):
    from transferdb_spark.streaming import corpus as cp

    fake = _arm(monkeypatch, spark, tmp_path)
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = cp.ingest_documents_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    store = str(tmp_path / "store")
    assert store in fake.tables  # landed via the format, not a dir write
    got = {
        (r["doc_id"], r["text"])
        for r in cp.corpus_current_state(spark, store).collect()
    }
    assert got == {(1, "a"), (3, "b")}  # within-batch exact dedup kept min


def test_compact_files_routes_through_format(spark, tmp_path, monkeypatch):
    from transferdb_spark.modes.optimize import compact_files

    path = str(tmp_path / "t")
    spark.range(100).repartition(4).write.parquet(path)
    calls: list = []
    monkeypatch.setattr(tf, "HAS_TABLE_FORMAT", True)
    monkeypatch.setattr(tf, "TABLE_FORMAT", "fake")
    monkeypatch.setattr(
        tf, "atomic_overwrite", lambda df, path: calls.append(("overwrite", path))
    )
    stats = compact_files(spark, path, n_files=1)
    assert calls == [("overwrite", path)]
    assert stats.files_before == 4 and stats.files_after == 1
    # dance did not run: original part files untouched, no backup dir
    assert len([f for f in os.listdir(path) if f.endswith(".parquet")]) == 4
