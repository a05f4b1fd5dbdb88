"""Training-corpus assembly operators: sequence packing and
train/val/test splitting over `documents`.

`pack_plan` is the concat-and-chunk packing step every LLM pretraining
pipeline runs before tokenized text hits the trainer: documents are
laid out in a deterministic pseudo-random order (hash of doc_id — no
RNG state to reproduce), token offsets are assigned by a global prefix
sum, and each document lands in the fixed-size token bin its start
offset falls in.

Scale design (100 TB): a global running total is the textbook
distributed prefix-sum — NOT a single-partition window. Rows are
statically range-bucketed by their 40-bit order hash (`h div
ceil(2^40 / P)` — uniform, no sampled boundaries, so the bucketing is
deterministic across jobs and engines), per-bucket token totals are
aggregated map-side and collected (O(P) rows on the driver — the same
"tiny plan, distributed data" shape as plans/chunker.py), and a second
narrow pass adds `bucket offset + within-bucket running total` in
Arrow batches. Shuffle volume: one 16-byte row per doc for the
re-bucketing, P rows for the totals. No stage ever sees the corpus in
one task, unlike `Window.orderBy(...)` with no partition key.

The DuckDB oracle states the same thing as a plain window cumsum —
fine at oracle scale, exactly what the Spark plan avoids at 100 TB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferdb_spark.ext.text import TOKENS, TOKENS_SQL
from transferdb_spark.functions.hashing import portable_hash64, portable_hash64_sql

# default bin budget (tokens). Fixture docs run ~10-100 tokens, so 512
# packs ~10 docs/bin; production would pass the trainer's context size.
PACK_BUDGET = 512

_HASH_SPACE = 1 << 40  # portable_hash64 range

_ORDER_HASH = "'pack:' || CAST(doc_id AS VARCHAR)"


def _order_hash_col():
    return portable_hash64(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))


def pack_plan(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """doc_id, n_tokens, start_offset, bin_id — the packing layout.

    start_offset = exclusive prefix sum of n_tokens in (h, doc_id)
    order; bin_id = start_offset div budget (a document is charged to
    the bin its first token lands in — the concat-and-chunk contract,
    where documents may straddle bin boundaries).
    """
    spark = docs.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucket_width = math.ceil(_HASH_SPACE / n_buckets)

    base = docs.select(
        "doc_id",
        F.size(F.expr(TOKENS)).alias("n_tokens"),
        _order_hash_col().alias("h"),
    ).withColumn("pid", (F.col("h") / F.lit(bucket_width)).cast("int"))

    # phase 1: per-bucket token totals -> driver-side exclusive cumsum.
    # O(P) rows cross to the driver; the corpus never does.
    totals = {
        r["pid"]: r["tot"]
        for r in base.groupBy("pid").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(n_buckets):
        offsets[pid] = acc
        acc += int(totals.get(pid, 0))

    # phase 2: within-bucket running totals in Arrow batches. Buckets
    # are explicit values (not physical partition ids), so a hash
    # collision placing two buckets in one task is harmless — the
    # cumsum is grouped by pid, and sortWithinPartitions guarantees
    # (pid, h, doc_id) order inside every task.
    part = base.repartition(n_buckets, "pid").sortWithinPartitions("pid", "h", "doc_id")

    def assign(batches):
        consumed: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            excl = pdf.groupby("pid")["n_tokens"].cumsum() - pdf["n_tokens"]
            carry = pdf["pid"].map(lambda p: offsets[p] + consumed.get(p, 0))
            start = (carry + excl).astype(np.int64)
            for p, s in pdf.groupby("pid")["n_tokens"].sum().items():
                consumed[int(p)] = consumed.get(int(p), 0) + int(s)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["n_tokens"].astype(np.int32),
                    "start_offset": start,
                    "bin_id": start // budget,
                }
            )

    return part.mapInPandas(
        assign, schema="doc_id long, n_tokens int, start_offset long, bin_id long"
    )


def pack_plan_sql(budget: int = PACK_BUDGET) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len({TOKENS_SQL}) AS INT) AS n_tokens,
         {portable_hash64_sql(_ORDER_HASH)} AS h
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {budget} AS BIGINT) AS bin_id
FROM o
"""


def pack_bin_stats(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-bin accounting of the packing layout: how many documents
    start in each bin and how many tokens they contribute. The fill
    diagnostic a packing step ships to the training dashboard."""
    return (
        pack_plan(docs, budget)
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_started"),
        )
        .orderBy("bin_id")
    )


def pack_bin_stats_sql(budget: int = PACK_BUDGET) -> str:
    return f"""
WITH plan AS ({pack_plan_sql(budget)})
SELECT bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_started
FROM plan
GROUP BY bin_id
ORDER BY bin_id
"""


# --- train/val/test split ---

_SPLIT_HASH = "'split:' || CAST(doc_id AS VARCHAR)"
TRAIN_PCT = 90
VAL_PCT = 5  # test gets the remainder


def split_assign(docs: DataFrame) -> DataFrame:
    """doc_id, split — deterministic hash split (90/5/5).

    Membership depends only on doc_id, so re-runs, engines, and
    incremental corpus batches agree; a narrow map, no shuffle."""
    h = portable_hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(h < TRAIN_PCT, "train")
        .when(h < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return docs.withColumn("split", split)


def split_summary(docs: DataFrame) -> DataFrame:
    """lang × split accounting: doc and token counts per cell — the
    stratification check that the split is balanced within languages."""
    return (
        split_assign(docs)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.expr(TOKENS))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )


SPLIT_SUMMARY_SQL = f"""
SELECT lang,
       CASE WHEN {portable_hash64_sql(_SPLIT_HASH)} % 100 < {TRAIN_PCT} THEN 'train'
            WHEN {portable_hash64_sql(_SPLIT_HASH)} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len({TOKENS_SQL})) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


def split_leakage(docs: DataFrame) -> DataFrame:
    """Near-dup leakage across train/val/test: MinHash-LSH candidate
    pairs whose two sides landed in different splits — the
    contamination a random (even deterministic-hash) split silently
    bakes into held-out evaluation. Output: per (split_a, split_b)
    cell, how many near-dup pairs straddle it (train/test cells are
    the eval-contamination number; the diagonal is harmless).

    Scale: pairs come from the banded LSH groupBy (never all-pairs);
    split assignment is a narrow hash on each side of the join."""
    from transferdb_spark.ext.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs)
    assign = split_assign(docs.select("doc_id")).select("doc_id", "split")
    out = (
        pairs.join(assign.withColumnsRenamed({"doc_id": "doc_a", "split": "split_a"}), "doc_a")
        .join(assign.withColumnsRenamed({"doc_id": "doc_b", "split": "split_b"}), "doc_b")
        .select(
            F.least("split_a", "split_b").alias("split_a"),
            F.greatest("split_a", "split_b").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn(
            "leaks", (F.col("split_a") != F.col("split_b")).cast("int")
        )
        .orderBy("split_a", "split_b")
    )
    return out


def split_leakage_sql() -> str:
    from transferdb_spark.ext.dedup import minhash_lsh_sql

    split_case = (
        f"CASE WHEN {portable_hash64_sql(_SPLIT_HASH)} % 100 < {TRAIN_PCT} THEN 'train' "
        f"WHEN {portable_hash64_sql(_SPLIT_HASH)} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )
    return f"""
WITH pairs AS ({minhash_lsh_sql()}),
assign AS (SELECT doc_id, {split_case} AS split FROM documents),
tagged AS (
  SELECT LEAST(a.split, b.split) AS split_a, GREATEST(a.split, b.split) AS split_b
  FROM pairs
  JOIN assign a ON pairs.doc_a = a.doc_id
  JOIN assign b ON pairs.doc_b = b.doc_id
)
SELECT split_a, split_b, COUNT(*) AS n_pairs,
       CAST(split_a <> split_b AS INT) AS leaks
FROM tagged
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""
