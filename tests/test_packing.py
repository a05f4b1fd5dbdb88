"""Sequence packing, split, and index/sketch evaluation operators."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from transferdb_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from transferdb_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_pack_plan_is_exact_prefix_sum(spark, docs):
    """start_offsets sorted must be the exclusive prefix sum of
    n_tokens — every token position is assigned exactly once, with no
    gaps or overlaps (the concat-and-chunk invariant)."""
    from transferdb_spark.ext.packing import PACK_BUDGET, pack_plan

    rows = sorted(pack_plan(docs).collect(), key=lambda r: r["start_offset"])
    assert rows[0]["start_offset"] == 0
    acc = 0
    for r in rows:
        assert r["start_offset"] == acc
        assert r["bin_id"] == acc // PACK_BUDGET
        acc += r["n_tokens"]
    assert len(rows) == docs.count()


def test_pack_plan_deterministic_across_bucket_counts(spark, docs):
    """The layout must not depend on the physical bucket count —
    re-running with a different shuffle.partitions setting (different
    prefix-sum bucketing) yields byte-identical assignments."""
    from transferdb_spark.ext.packing import pack_plan

    old = spark.conf.get("spark.sql.shuffle.partitions")
    base = {r["doc_id"]: (r["start_offset"], r["bin_id"]) for r in pack_plan(docs).collect()}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {r["doc_id"]: (r["start_offset"], r["bin_id"]) for r in pack_plan(docs).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt


def test_pack_plan_has_no_global_sort_exchange(spark, docs):
    """The scale contract: no single-partition Exchange in the plan
    (a Window.orderBy with no partition key would show one)."""
    from transferdb_spark.ext.packing import pack_plan

    plan = pack_plan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_bin_stats_reconcile_with_plan(spark, docs):
    from transferdb_spark.ext.packing import pack_bin_stats, pack_plan

    plan = pack_plan(docs).collect()
    stats = {r["bin_id"]: (r["n_docs"], r["tokens_started"]) for r in pack_bin_stats(docs).collect()}
    agg: dict[int, list[int]] = {}
    for r in plan:
        a = agg.setdefault(r["bin_id"], [0, 0])
        a[0] += 1
        a[1] += r["n_tokens"]
    assert stats == {k: (v[0], v[1]) for k, v in agg.items()}


def test_split_is_total_and_deterministic(spark, docs):
    from transferdb_spark.ext.packing import split_assign

    n = docs.count()
    counts = {r["split"]: r["n"] for r in split_assign(docs).groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == n
    assert set(counts) == {"train", "val", "test"}
    # hash split tracks the 90/5/5 target within sampling noise
    assert counts["train"] / n == pytest.approx(0.90, abs=0.05)
    again = {r["split"]: r["n"] for r in split_assign(docs).groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert counts == again


def test_ann_recall_bounds_and_bruteforce_self_recall(spark, emb):
    """recall ∈ [0,1]; and the evaluator run with the exact arm on both
    sides must report recall 1.0 (sanity of the harness itself)."""
    from transferdb_spark.ext.similarity import ann_recall_eval

    rows = ann_recall_eval(emb, n_queries=4, k=5).collect()
    assert len(rows) == 4
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_at_k"] == pytest.approx(r["n_hits"] / 5)


def test_export_corpus_roundtrip(spark, docs, tmp_path):
    """Export writes every doc exactly once with split+packing tags,
    the manifest reconciles with the data, and each split's files are
    readable back in training order."""
    from transferdb_spark.ext.packing import pack_plan, split_assign
    from transferdb_spark.modes.export import export_corpus, read_manifest

    outdir = str(tmp_path / "corpus")
    manifest = export_corpus(spark, docs, outdir, budget=256)

    out = spark.read.parquet(manifest.path)
    n = docs.count()
    assert out.count() == n == manifest.n_docs
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # tags match the operators that defined them
    plan = {r["doc_id"]: (r["bin_id"], r["start_offset"]) for r in pack_plan(docs, 256).collect()}
    splits = {r["doc_id"]: r["split"] for r in split_assign(docs).select("doc_id", "split").collect()}
    for r in out.collect():
        assert plan[r["doc_id"]] == (r["bin_id"], r["start_offset"])
        assert splits[r["doc_id"]] == r["split"]
    # manifest on disk reconciles
    disk = read_manifest(outdir)
    assert disk["n_docs"] == n
    assert sum(v["n_docs"] for v in disk["splits"].values()) == n
    assert disk["budget"] == 256


def test_export_files_cover_contiguous_bin_ranges(spark, docs, tmp_path):
    """Training-order contract: within a split, the per-file bin_id
    ranges must not interleave — a trainer reading files in order
    streams bins in order."""
    from pyspark.sql import functions as F

    from transferdb_spark.modes.export import export_corpus

    manifest = export_corpus(spark, docs, str(tmp_path / "c2"), budget=256)
    out = spark.read.parquet(manifest.path).withColumn("file", F.input_file_name())
    per_file = (
        out.groupBy("split", "file")
        .agg(F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"))
        .collect()
    )
    by_split: dict[str, list] = {}
    for r in per_file:
        by_split.setdefault(r["split"], []).append((r["lo"], r["hi"]))
    for ranges in by_split.values():
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            # a bin may straddle two files, but ranges must not interleave
            assert hi1 <= lo2 or (hi1 == lo2 and lo1 <= lo2)


def test_minhash_calibration_error_is_bounded(spark, docs):
    """Estimator and exact Jaccard both land in [0,1]; planted exact
    duplicates must show est == exact == 1.0 (all slots agree, full
    shingle overlap)."""
    from transferdb_spark.ext.dedup import minhash_calibration

    rows = minhash_calibration(docs).collect()
    assert rows, "LSH banding should surface candidate pairs at sf0.001"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        assert r["abs_err"] == pytest.approx(abs(r["est_jaccard"] - r["exact_jaccard"]), abs=1e-9)
    perfect = [r for r in rows if r["exact_jaccard"] == 1.0]
    for r in perfect:
        assert r["est_jaccard"] == 1.0
