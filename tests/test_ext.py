"""Extension operator tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from transferdb_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from transferdb_spark.sources.registry import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_exact_dedup_finds_planted_dups(spark, docs):
    from transferdb_spark.ext.dedup import exact_dedup_groups

    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    groups = exact_dedup_groups(docs.unionByName(dup)).collect()
    assert len(groups) == 5
    assert all(g["group_size"] == 2 for g in groups)
    # canonical keeps the smallest id (the original)
    assert all(g["canonical_doc"] < 100000 for g in groups)


def test_minhash_lsh_catches_exact_dup(spark, docs):
    from transferdb_spark.ext.dedup import minhash_lsh_candidates

    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    cands = minhash_lsh_candidates(docs.unionByName(dup))
    got = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    originals = [r["doc_id"] for r in docs.limit(3).collect()]
    for o in originals:
        assert (o, o + 100000) in got  # identical docs always collide


def test_minhash_signature_stability(docs):
    from transferdb_spark.ext.dedup import NUM_HASHES, minhash_signatures

    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs.limit(20)).collect()}
    s2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs.limit(20)).collect()}
    assert s1 == s2  # deterministic across runs
    assert all(len(v) == NUM_HASHES for v in s1.values())


def test_ngram_jaccard_identical_is_one(spark, docs):
    from transferdb_spark.ext.dedup import ngram_jaccard_pairs

    dup = docs.limit(2).withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = ngram_jaccard_pairs(docs.limit(2).unionByName(dup), threshold=0.99).collect()
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs} == {
        (r["doc_id"], r["doc_id"] + 100000, 1.0) for r in docs.limit(2).collect()
    }


def test_similarity_self_is_top(spark, emb):
    from transferdb_spark.ext.similarity import topk_bruteforce

    # plant an exact copy of vec 0 under a new id; it must rank #1 with cosine 1.0
    clone = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(999999).cast("long"))
    top = topk_bruteforce(emb.unionByName(clone), query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 999999
    assert top[0]["cosine"] == 1.0


def test_lsh_bucket_determinism_and_recall(emb):
    from transferdb_spark.ext.similarity import lsh_buckets

    b1 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb).collect()}
    assert b1 == b2
    assert all(0 <= v < 16 for v in b1.values())


def test_lang_id_is_deterministic_and_total(docs):
    from transferdb_spark.ext.text import lang_id

    out = lang_id(docs).collect()
    assert len(out) == docs.count()
    assert all(r["lang_pred"] in ("en", "de", "es", "fr", "und") for r in out)


def test_multimodal_feature_extraction(spark):
    from transferdb_spark.ext.multimodal import FEATURE_DIM, extract_features, synthetic_media

    media = synthetic_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    assert all(r["n_bytes"] >= 128 for r in feats)
    # determinism
    again = extract_features(synthetic_media(spark, n=32)).collect()
    assert [r["features"] for r in feats] == [r["features"] for r in again]


def test_multimodal_decode_stub_raises():
    from transferdb_spark.ext.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multimodal_frame_sampling(spark):
    from transferdb_spark.ext.multimodal import sample_frames, synthetic_media

    media = synthetic_media(spark, n=4, kind="video")
    frames = sample_frames(media, every_ms=1000).collect()
    # duration 4000ms @ 1000ms -> 5 offsets (0..4000) per video
    assert len(frames) == 4 * 5
    assert {r["offset_ms"] for r in frames} == {0, 1000, 2000, 3000, 4000}


def test_ann_ivf_matches_bruteforce_topk(spark, sf_dir):
    """IVF with 4-of-16 probes must recover the true top-10 here (the
    fixture's neighbours share cells with the query)."""
    from transferdb_spark.ext.similarity import ann_topk_ivf, topk_bruteforce
    from transferdb_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = {r["vec_id"]: r["cosine"] for r in ann_topk_ivf(emb, 0, 10).collect()}
    brute = {r["vec_id"]: r["cosine"] for r in topk_bruteforce(emb, 0, 10).collect()}
    # recall won't be perfect in general; assert the probed result is a
    # subset of the brute-force ranking extended to 3x depth
    deep = {r["vec_id"] for r in topk_bruteforce(emb, 0, 30).collect()}
    assert set(ivf) <= deep
    # and scores agree exactly where both found the same neighbour
    for v, c in ivf.items():
        if v in brute:
            assert brute[v] == c


def test_multimodal_feature_extraction_shapes(spark):
    from transferdb_spark.ext.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, n=32)
    out = extract_features(media, fake=True).collect()
    assert len(out) == 32
    assert all(len(r["features"]) == 16 for r in out)
    # deterministic: same input bytes -> same features
    again = extract_features(synthetic_media(spark, n=32), fake=True).collect()
    assert [r["features"] for r in out] == [r["features"] for r in again]


def test_recommended_planes_bounds_bucket_occupancy():
    """Data-driven LSH sizing: expected occupancy n/2^p stays ~target,
    clamped to [4, 24] — the 100 TB guard over the fixed test default."""
    from transferdb_spark.ext.similarity import recommended_planes

    assert recommended_planes(1_000) == 4  # tiny: keep test default
    assert recommended_planes(4096 * 16) == 4
    assert recommended_planes(4096 * 1024) == 10
    p = recommended_planes(10_000_000_000)
    assert p == 22 and 10_000_000_000 / 2**p < 4096 * 2
    assert recommended_planes(10**15) == 24  # clamp


def test_lsh_buckets_parameterized_planes(spark, sf_dir):
    """More planes → finer buckets, every vector still assigned."""
    from transferdb_spark.ext.similarity import lsh_buckets
    from transferdb_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    b4 = lsh_buckets(emb)
    b6 = lsh_buckets(emb, n_planes=6)
    assert b4.count() == n and b6.count() == n
    n4 = b4.select("bucket").distinct().count()
    n6 = b6.select("bucket").distinct().count()
    assert n4 <= 16 and n6 <= 64 and n6 > n4
