"""transformWithState migration spike — the SAME equivalence checks
the applyInPandasWithState trio passes (test_stateful.py), run against
the streaming/tws.py twins. Skipped wholesale when the runtime has no
transformWithStateInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transferdb_spark.streaming.tws import HAS_TWS

pytestmark = pytest.mark.skipif(
    not HAS_TWS, reason="no transformWithStateInPandas in this Spark"
)


def test_tws_profile_matches_batch(spark, sf_dir, tmp_path):
    from transferdb_spark.sources.registry import load_table
    from transferdb_spark.streaming.incr import stream_events
    from transferdb_spark.streaming.tws import user_activity_profile_tws

    events = load_table(spark, sf_dir, "events").drop("props")
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)

    stream = stream_events(spark, src)
    q = (
        user_activity_profile_tws(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_profiles")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["user_id"]: (r["cnt"], round(r["total"], 6))
        for r in spark.sql("SELECT * FROM tws_profiles").collect()
    }
    expected = {
        r["user_id"]: (r["cnt"], round(r["total"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expected


def test_tws_dedup_first_seen_wins(spark, sf_dir, tmp_path):
    from transferdb_spark.sources.registry import load_table
    from transferdb_spark.streaming.tws import streaming_dedup_tws

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    resub = first.limit(30).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    second = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
        .unionByName(resub)
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        streaming_dedup_tws(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_dedup")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT doc_id, text FROM tws_dedup").collect()
    }
    expected = {
        (r["doc_id"], r["text"])
        for r in first.unionByName(second)
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .collect()
    }
    assert got == expected
    assert len(got) < first.count() + second.count()


def test_tws_sessionize_matches_gap_sessions(spark, tmp_path):
    from datetime import datetime, timedelta

    from transferdb_spark.streaming.tws import streaming_sessionize_tws

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(uid, mins, val):
        return (uid, t0 + timedelta(minutes=mins), float(val))

    batch1 = [ev(1, 10, 2.0), ev(1, 0, 1.0), ev(2, 15, 5.0), ev(2, 5, 4.0)]
    batch2 = [ev(1, 20, 3.0), ev(1, 80, 7.0), ev(1, 85, 8.0)]
    sentinel = [ev(99, 24 * 60, 0.0)]
    sentinel2 = [ev(98, 48 * 60, 0.0)]

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"
    for i, rows in enumerate([batch1, batch2, sentinel, sentinel2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_sessionize_tws(stream, gap_s=1800.0, watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_sess")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
         r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tws_sess WHERE user_id IN (1, 2)").collect()
    }
    want = {
        (1, 12 * 60 + 0, 3, 6.0),
        (1, 13 * 60 + 20, 2, 15.0),
        (2, 12 * 60 + 5, 2, 9.0),
    }
    assert got == want
