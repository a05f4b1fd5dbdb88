"""`pipeline` mode — raw corpus in, training-ready token bins out.

One command chaining the engine's LLM-data stages in the order the
data-curation literature runs them:

  1. clean      — exact-dedup canonical election + quality-ratio gate
  2. prune      — quality scoring (bigram-LM or the trained
                  classifier), keep the top score deciles
  3. split      — deterministic 90/5/5 hash split
  4. decontam   — drop TRAIN docs that near-dup (MinHash-LSH) a val or
                  test doc; eval sets are sacred, train pays
  5. tokenize   — byte-level BPE trained ON THE TRAIN SPLIT ONLY
                  (fit-on-train hygiene), applied to every kept doc
  6. pack       — concat-and-chunk into fixed-budget bins per split

Outputs: parquet bins partitioned by split under
<workdir>/training_bins plus a JSON manifest of per-stage counts. All
stage operators are the independently oracle-checked registry ops —
this mode owns only their composition and the persist/unpersist
lifecycle (scores and encoded ids are each read by multiple passes).

Driver-side collections stay model-sized: the BPE merge table
(vocab-bounded) and per-stage counts — never row data."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_training_corpus(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    keep_deciles: int = 3,
    scorer: str = "bigram_lm",
    vocab_size: int = 280,
    budget: int = 512,
    nfc: bool = False,
    max_compressibility: float | None = None,
) -> dict:
    from transferdb_spark.cache import release_query_caches
    from transferdb_spark.ext.bpe import encode_ids_df, train_bytes
    from transferdb_spark.ext.dedup import minhash_lsh_candidates
    from transferdb_spark.ext.packing import pack_token_sequences, split_assign
    from transferdb_spark.ext.text import bigram_lm_score
    from transferdb_spark.modes.prune import _clean_gate
    from transferdb_spark.operators.ranking import global_ntile
    from transferdb_spark.sources.registry import load_table

    docs = load_table(spark, source_dir, "documents")
    manifest: dict = {"mode": "pipeline", "scorer": scorer, "budget": budget}
    manifest["docs_raw"] = docs.count()

    # 0. optional ingest normalization/gating (both default-off so the
    # canonical oracle-checked path is unchanged)
    if nfc:
        from transferdb_spark.ext.text import unicode_nfc

        docs = docs.join(
            unicode_nfc(docs).select("doc_id", "norm_text"), "doc_id"
        ).drop("text").withColumnRenamed("norm_text", "text")
    if max_compressibility is not None:
        # DEFLATE ratio ABOVE the bound = high-entropy noise; boiler-
        # plate sits low, so this gates the top (garbled) end only
        from transferdb_spark.ext.text import compression_ratio

        keep_ids = compression_ratio(docs).where(
            F.col("ratio") <= float(max_compressibility)
        ).select("doc_id")
        docs = docs.join(keep_ids, "doc_id")
        manifest["docs_after_compress_gate"] = docs.count()

    # 1. clean
    clean = docs.join(_clean_gate(docs), "doc_id")
    manifest["docs_clean"] = clean.count()

    # 2. prune (same scorer surface as modes/prune.py)
    if scorer == "classifier":
        from transferdb_spark.ext.classifier import classifier_scores

        scores = classifier_scores(clean).select(
            "doc_id", F.col("score").alias("q_score")
        )
    elif scorer == "bigram_lm":
        scores = bigram_lm_score(clean).select(
            "doc_id", F.col("lm_score").alias("q_score")
        )
    else:
        raise SystemExit(f"unknown --scorer {scorer!r}")
    # every persist below registers here and the single outer finally
    # releases whatever was still held when we leave — normally each
    # stage frees its own cache as soon as the next one is
    # materialized, so the finally is the error path
    caches: list = []

    def _done(df) -> None:
        df.unpersist()
        caches.remove(df)

    try:
        scores = scores.persist()  # global_ntile reads it three times
        caches.append(scores)
        # pruned is persisted THROUGH the downstream stages: its
        # lineage embeds the scorer + the two-phase ntile, which every
        # later action (decontam joins, counts, BPE fit, encode) would
        # otherwise re-execute from the scan
        ranked = global_ntile(scores, ["q_score", "doc_id"], k=10, num_partitions=8)
        kept_ids = ranked.filter(F.col("bucket") > 10 - keep_deciles).select("doc_id")
        pruned = clean.join(kept_ids, "doc_id").persist()
        caches.append(pruned)
        manifest["docs_pruned"] = pruned.count()  # materializes the cache
        _done(scores)

        # 3. split (narrow hash — assigned before decontam so the
        # leakage rule can see which side of a pair is eval)
        with_split = split_assign(pruned)

        # 4. decontam: drop the TRAIN member of any train<->eval
        # near-dup. A val<->test cross-dup has no train side to
        # sacrifice — dropping from an eval set silently changes its
        # composition, so those are REPORTED, never removed.
        pairs = minhash_lsh_candidates(pruned, persist=False)
        assign = with_split.select("doc_id", "split")
        cross = (
            pairs.join(
                assign.withColumnsRenamed({"doc_id": "doc_a", "split": "split_a"}),
                "doc_a",
            )
            .join(
                assign.withColumnsRenamed({"doc_id": "doc_b", "split": "split_b"}),
                "doc_b",
            )
            .filter(F.col("split_a") != F.col("split_b"))
            .persist()  # read twice: the drop set and the report
        )
        caches.append(cross)
        leaky_train = (
            cross.filter(
                (F.col("split_a") == "train") | (F.col("split_b") == "train")
            )
            .select(
                F.when(F.col("split_a") == "train", F.col("doc_a"))
                .otherwise(F.col("doc_b"))
                .alias("doc_id")
            )
            .distinct()
        )
        # final feeds the count below, the BPE fit, and the encode
        # join — persist so the LSH anti-join runs once
        final = with_split.join(leaky_train, "doc_id", "left_anti").persist()
        caches.append(final)
        manifest["docs_decontaminated"] = final.count()  # materializes
        manifest["train_docs_dropped_for_leakage"] = (
            manifest["docs_pruned"] - manifest["docs_decontaminated"]
        )
        manifest["eval_cross_leak_pairs"] = cross.filter(
            (F.col("split_a") != "train") & (F.col("split_b") != "train")
        ).count()
        _done(cross)
        _done(pruned)  # final is materialized; pruned's job is done

        # 5. tokenizer: fit on train only, apply everywhere
        train_docs = final.filter(F.col("split") == "train").select("doc_id", "text")
        merges = train_bytes(train_docs, vocab_size=vocab_size)
        manifest["bpe_vocab"] = 256 + len(merges)

        encoded = (
            encode_ids_df(final.select("doc_id", "text"), merges)
            .join(final.select("doc_id", "split"), "doc_id")
            .persist()  # one packing pass per split below
        )
        caches.append(encoded)
        bins_dir = os.path.join(workdir, "training_bins")
        per_split: dict = {}
        for split in ("train", "val", "test"):
            part = encoded.filter(F.col("split") == split).select(
                "doc_id", "n_tokens", "token_ids"
            )
            bins = pack_token_sequences(part, budget=budget)
            bins.write.mode("overwrite").parquet(
                os.path.join(bins_dir, f"split={split}")
            )
            stats = bins.agg(
                F.count(F.lit(1)).alias("n_bins"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            ).collect()[0]
            per_split[split] = {
                "n_bins": stats["n_bins"],
                "n_tokens": stats["n_tokens"],
            }
            # the packer qpersists its layout base (encode runs once,
            # not once per consumer); this split's bins are fully
            # materialized (write + stats), so release it before the
            # next split builds its own
            release_query_caches()
        manifest["bins"] = per_split
        manifest["bins_dir"] = bins_dir
    finally:
        for df in caches:
            df.unpersist()

    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, "pipeline_manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)
    manifest["manifest_path"] = path
    return manifest
