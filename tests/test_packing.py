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


def test_pack_token_stats_bins_are_exactly_full(spark, docs):
    """After boundary splitting every bin but the last must hold
    exactly the budget in tokens, pieces must cover the corpus with no
    token lost, and piece counts must reconcile with a Python replay
    of the layout."""
    from transferdb_spark.ext.packing import PACK_BUDGET, pack_plan, pack_token_stats

    stats = pack_token_stats(docs).collect()
    assert stats == sorted(stats, key=lambda r: r["bin_id"])
    total = sum(r["bin_tokens"] for r in stats)
    for r in stats[:-1]:
        assert r["bin_tokens"] == PACK_BUDGET, r
    assert 0 < stats[-1]["bin_tokens"] <= PACK_BUDGET

    # replay the piece explode from the plan in plain Python
    expected: dict[int, list[int]] = {}
    tok_total = 0
    for r in pack_plan(docs).collect():
        if r["n_tokens"] == 0:
            continue
        tok_total += r["n_tokens"]
        start, n = r["start_offset"], r["n_tokens"]
        for b in range(start // PACK_BUDGET, (start + n - 1) // PACK_BUDGET + 1):
            lo = max(0, b * PACK_BUDGET - start)
            hi = min(n, (b + 1) * PACK_BUDGET - start)
            a = expected.setdefault(b, [0, 0, 0])
            a[0] += 1
            a[1] += hi - lo
            a[2] += 1 if max(0, start - b * PACK_BUDGET) == 0 else 0
    assert total == tok_total
    got = {r["bin_id"]: [r["n_pieces"], r["bin_tokens"], r["n_continuations"]] for r in stats}
    assert got == expected


def test_encode_ids_matches_counts_and_decodes(spark, docs):
    """encode_ids_df must agree with encode_bytes_df on length, and
    concatenating the vocab byte-strings over the emitted ids must
    reproduce the normalized byte stream exactly (lossless apply)."""
    from transferdb_spark.ext.bpe import (
        encode_bytes_df,
        encode_ids_df,
        train_bytes,
        vocab_tokens,
    )

    sample = docs.limit(40)
    merges = train_bytes(sample, vocab_size=256 + 8)
    vocab = vocab_tokens(merges)
    counts = {r["doc_id"]: r["n_tokens"] for r in encode_bytes_df(sample, merges).collect()}
    ids = {r["doc_id"]: r for r in encode_ids_df(sample, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    assert set(ids) == set(counts)
    for did, r in ids.items():
        assert r["n_tokens"] == counts[did] == len(r["token_ids"])
        decoded = b"".join(vocab[t] for t in r["token_ids"])
        assert decoded == texts[did].lower().encode("utf-8"), did


def test_encode_ids_special_tokens_single_id(spark, docs):
    """An added special token must surface as exactly one id, above
    the learned vocab, and decode round-trip must still hold around
    it."""
    from pyspark.sql import functions as F

    from transferdb_spark.ext.bpe import (
        encode_ids_df,
        special_token_ids,
        train_bytes,
        vocab_tokens,
    )

    sample = docs.limit(10)
    merges = train_bytes(sample, vocab_size=256 + 6)
    specials = ["<|endoftext|>"]
    sids = special_token_ids(merges, specials)
    wrapped = sample.select(
        "doc_id", F.concat(F.col("text"), F.lit("<|endoftext|>")).alias("text")
    )
    vocab = vocab_tokens(merges)
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    for r in encode_ids_df(wrapped, merges, special_tokens=specials).collect():
        assert r["token_ids"][-1] == sids["<|endoftext|>"]
        body = b"".join(vocab[t] for t in r["token_ids"][:-1])
        assert body == texts[r["doc_id"]].lower().encode("utf-8")


def test_pack_token_sequences_roundtrip(spark, docs):
    """Flattening the packed bins in bin order must reproduce the
    concatenation of per-doc token ids in (order-hash, doc_id) order,
    and every bin but the last must hold exactly the budget."""
    from pyspark.sql import functions as F

    from transferdb_spark.ext.bpe import encode_ids_df, train_bytes
    from transferdb_spark.ext.packing import pack_token_sequences
    from transferdb_spark.functions.hashing import portable_hash64

    sample = docs.limit(60)
    merges = train_bytes(sample, vocab_size=256 + 8)
    ids = encode_ids_df(sample, merges)
    budget = 128
    bins = pack_token_sequences(ids, budget=budget).collect()

    assert bins == sorted(bins, key=lambda r: r["bin_id"])
    assert [r["bin_id"] for r in bins] == list(range(len(bins)))
    for r in bins[:-1]:
        assert r["n_tokens"] == budget == len(r["token_ids"])
    assert 0 < bins[-1]["n_tokens"] <= budget

    order = ids.select(
        "doc_id",
        portable_hash64(
            F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))
        ).alias("h"),
        "token_ids",
    ).collect()
    order.sort(key=lambda r: (r["h"], r["doc_id"]))
    expected = [t for r in order for t in r["token_ids"]]
    flat = [t for r in bins for t in r["token_ids"]]
    assert flat == expected


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


def test_pq_encode_matches_numpy_replay(spark, emb):
    """Distributed codebook training + encoding must equal a pure
    numpy replay of the same fixed-round integer Lloyd recipe, and the
    ADC scores must equal table lookups over that replay."""
    import numpy as np

    from transferdb_spark.ext.pq import (
        ITERS,
        KC,
        M,
        QID,
        SUBDIM,
        encode_vectors,
        pq_topk_adc,
        train_codebook,
    )
    from transferdb_spark.ext.similarity import QSCALE

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * QSCALE + 0.5
    ).astype(np.int64)
    n = X.shape[0]
    Xs = X.reshape(n, M, SUBDIM)

    # numpy replay: same seed, same integer argmin, same floor update
    C = np.stack([X[:KC, m * SUBDIM : (m + 1) * SUBDIM] for m in range(M)])
    for _ in range(ITERS):
        CN2 = (C * C).sum(axis=2)
        codes = np.empty((n, M), dtype=np.int64)
        for m in range(M):
            S = CN2[m][None, :] - 2 * (Xs[:, m, :] @ C[m].T)
            codes[:, m] = np.argmin(S, axis=1)
        nxt = C.copy()
        for m in range(M):
            for c in range(KC):
                mask = codes[:, m] == c
                if mask.any():
                    nxt[m, c] = np.floor_divide(Xs[mask, m, :].sum(axis=0), mask.sum())
        C = nxt

    got_cb = train_codebook(emb)
    assert np.array_equal(got_cb, C)

    CN2 = (C * C).sum(axis=2)
    exp_codes = np.empty((n, M), dtype=np.int64)
    for m in range(M):
        S = CN2[m][None, :] - 2 * (Xs[:, m, :] @ C[m].T)
        exp_codes[:, m] = np.argmin(S, axis=1)
    got = {r["vec_id"]: r["codes"] for r in encode_vectors(emb, got_cb).collect()}
    ids = [r["vec_id"] for r in rows]
    for i, vid in enumerate(ids):
        assert got[vid] == exp_codes[i].tolist()
        assert all(0 <= c < KC for c in got[vid])

    # ADC replay for the benchmark query
    q = Xs[ids.index(QID)]
    lut = (C * C).sum(axis=2) - 2 * np.einsum("mkd,md->mk", C, q)
    exp_adc = {
        vid: int(sum(lut[m, exp_codes[i, m]] for m in range(M)))
        for i, vid in enumerate(ids)
        if vid != QID
    }
    top = pq_topk_adc(emb).collect()
    expect_order = sorted(exp_adc.items(), key=lambda kv: (kv[1], kv[0]))[: len(top)]
    assert [(r["vec_id"], r["adc"]) for r in top] == expect_order


def test_pq_histogram_is_total(spark, emb):
    from transferdb_spark.ext.pq import M, pq_codes_histogram

    n = emb.count()
    rows = pq_codes_histogram(emb).collect()
    per_m: dict[int, int] = {}
    for r in rows:
        per_m[r["m"]] = per_m.get(r["m"], 0) + r["n_vectors"]
    assert per_m == {m: n for m in range(M)}


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
