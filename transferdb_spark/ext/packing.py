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


def _layout(base: DataFrame, budget: int, carry_ids: bool = False) -> DataFrame:
    """Two-phase distributed prefix sum over `base` (doc_id, n_tokens,
    h): start_offset in (h, doc_id) order + bin_id = start div budget.
    With carry_ids=True the token_ids array column rides through the
    shuffle so callers don't pay a second exchange to join it back."""
    spark = base.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucket_width = math.ceil(_HASH_SPACE / n_buckets)
    base = base.withColumn("pid", (F.col("h") / F.lit(bucket_width)).cast("int"))
    if carry_ids:
        # base is consumed TWICE (the phase-1 totals collect and the
        # phase-2 layout pass), and on the carry_ids path it contains
        # the tokenizer-apply Python encode — the most expensive stage
        # of the whole pack pipeline. Persist so the collect fills the
        # cache and phase 2 reads it: encode runs once, not once per
        # consumer (round-9 change-15 mechanism, guide §1.2/§5; the
        # round-10 plan sweep flagged this builder py=2/imr=0).
        # Release contract: transferdb_spark/cache.qpersist.
        from transferdb_spark.cache import qpersist

        base = qpersist(base)

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
            out = {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"].astype(np.int32),
                "start_offset": start,
                "bin_id": start // budget,
            }
            if carry_ids:
                out["token_ids"] = pdf["token_ids"]
            yield pd.DataFrame(out)

    schema = "doc_id long, n_tokens int, start_offset long, bin_id long"
    if carry_ids:
        schema += ", token_ids array<int>"
    return part.mapInPandas(assign, schema=schema)


def pack_plan(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """doc_id, n_tokens, start_offset, bin_id — the packing layout.

    start_offset = exclusive prefix sum of n_tokens in (h, doc_id)
    order; bin_id = start_offset div budget (a document is charged to
    the bin its first token lands in — the concat-and-chunk contract,
    where documents may straddle bin boundaries).
    """
    base = docs.select(
        "doc_id",
        F.size(F.expr(TOKENS)).alias("n_tokens"),
        _order_hash_col().alias("h"),
    )
    return _layout(base, budget)


def _pieces(plan: DataFrame, budget: int, with_ids: bool = False) -> DataFrame:
    """Explode each laid-out document into its per-bin pieces.

    A document whose [start_offset, start_offset + n_tokens) span
    crosses bin boundaries contributes one piece per bin it touches:
    bin_id, offset_in_bin (where the piece begins inside the bin) and
    piece_tokens (how many of the doc's tokens land there). With
    with_ids=True the matching token_ids slice rides along.

    All pure built-in expressions (sequence/explode/slice) — the
    fan-out per document is ceil(n_tokens / budget) + 1 pieces, so a
    100 TB corpus explodes to ~corpus_tokens / budget extra rows, not
    a cross product."""
    b = F.lit(int(budget)).cast("long")
    # `div` (integer division) keeps the arithmetic exact at any
    # offset magnitude — a double round-trip would wobble past 2^53
    last_bin = F.expr(f"(start_offset + n_tokens - 1) div {int(budget)}")
    p = (
        plan.where(F.col("n_tokens") > 0)
        .withColumn("piece_bin", F.explode(F.sequence(F.col("bin_id"), last_bin)))
    )
    lo = F.greatest(F.lit(0).cast("long"), F.col("piece_bin") * b - F.col("start_offset"))
    hi = F.least(
        F.col("n_tokens").cast("long"),
        (F.col("piece_bin") + F.lit(1)) * b - F.col("start_offset"),
    )
    cols = [
        F.col("piece_bin").alias("bin_id"),
        F.col("doc_id"),
        F.greatest(
            F.lit(0).cast("long"), F.col("start_offset") - F.col("piece_bin") * b
        ).alias("offset_in_bin"),
        (hi - lo).alias("piece_tokens"),
    ]
    if with_ids:
        cols.append(
            F.slice(
                F.col("token_ids"), (lo + F.lit(1)).cast("int"), (hi - lo).cast("int")
            ).alias("piece_ids")
        )
    return p.select(*cols)


def pack_token_stats(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Per-bin piece accounting of the packing layout AFTER boundary
    splitting — unlike `pack_bin_stats` (which charges a whole doc to
    its starting bin), this counts what each bin actually contains:
    n_pieces (document fragments), n_starts (docs whose first token is
    here), bin_tokens (must equal the budget for every bin but the
    last — the invariant the trainer relies on)."""
    plan = pack_plan(docs, budget)
    return (
        _pieces(plan, budget)
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.sum((F.col("offset_in_bin") > 0).cast("int"))
            .cast("bigint")
            .alias("n_starts_mid"),
            F.sum("piece_tokens").cast("bigint").alias("bin_tokens"),
        )
        .select(
            "bin_id",
            "n_pieces",
            (F.col("n_pieces") - F.col("n_starts_mid")).alias("n_continuations"),
            "bin_tokens",
        )
        .orderBy("bin_id")
    )


def pack_token_stats_sql(budget: int = PACK_BUDGET) -> str:
    # NOTE n_continuations counts pieces whose offset_in_bin == 0,
    # i.e. pieces starting AT the bin boundary: a doc's own first
    # piece when it happens to start exactly at a boundary, or the
    # continuation of a straddling doc. Same definition both engines.
    return f"""
WITH plan AS ({pack_plan_sql(budget)}),
pieces AS (
  SELECT p.bin_id + g.i - 1 AS bin_id,
         GREATEST(0, p.start_offset - (p.bin_id + g.i - 1) * {budget}) AS offset_in_bin,
         LEAST(CAST(p.n_tokens AS BIGINT), (p.bin_id + g.i) * {budget} - p.start_offset)
           - GREATEST(0, (p.bin_id + g.i - 1) * {budget} - p.start_offset) AS piece_tokens
  FROM plan p,
       UNNEST(generate_series(1,
         ((p.start_offset + p.n_tokens - 1) // {budget}) - p.bin_id + 1)) AS g(i)
  WHERE p.n_tokens > 0
)
SELECT bin_id, COUNT(*) AS n_pieces,
       CAST(COUNT(*) - SUM(CASE WHEN offset_in_bin > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_continuations,
       CAST(SUM(piece_tokens) AS BIGINT) AS bin_tokens
FROM pieces
GROUP BY bin_id
ORDER BY bin_id
"""


def pack_token_sequences(doc_ids: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Materialize the packed training sequences from tokenized docs.

    Input: (doc_id, n_tokens, token_ids) — the output of
    `bpe.encode_ids_df`. Output: (bin_id, n_pieces, n_tokens,
    token_ids) where every bin but the last holds exactly `budget`
    token ids, in (order-hash, doc_id) document order with boundary
    straddles split mid-document — the concat-and-chunk contract.

    Round-trip contract (pytest-pinned): flattening bins in bin_id
    order reproduces the concatenation of the input token_ids in
    (h, doc_id) order exactly.

    Scale: the only corpus-sized shuffle is the groupBy(bin_id) that
    physically assembles the bins (~4 bytes/token — unavoidable for
    materialization, and each group is at most `budget` tokens so no
    task buffers more than one context window per bin)."""
    base = doc_ids.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "token_ids",
        _order_hash_col().alias("h"),
    )
    plan = _layout(base, budget, carry_ids=True)
    pieces = _pieces(plan, budget, with_ids=True)
    return (
        pieces.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("offset_in_bin", "piece_ids"))),
                    lambda s: s["piece_ids"],
                )
            ).alias("token_ids"),
        )
        .select(
            "bin_id",
            "n_pieces",
            F.size("token_ids").alias("n_tokens"),
            "token_ids",
        )
        .orderBy("bin_id")
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


# ---------------------------------------------------------------------------
# RAG / training chunking — split each document into overlapping
# fixed-token windows (the standard retrieval-corpus and long-doc
# training preparation: window W tokens, stride S < W for overlap).


def chunk_documents(
    docs: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — overlapping token
    windows. Chunk k covers tokens [k*stride, k*stride + window); the
    final chunk is the first one whose window reaches the end of the
    document (no degenerate sub-stride tail chunks, no token ever left
    uncovered). Pure narrow explode — each input row fans out to
    ceil(max(n - window, 0) / stride) + 1 rows with no shuffle, so at
    100 TB it rides the scan's own partitioning; output size is
    input * window/stride, a planned constant factor."""
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    toks = docs.select("doc_id", F.expr(TOKENS).alias("t")).withColumn(
        "n", F.size("t")
    )
    # number of chunks: 1 + ceil(max(n - window, 0) / stride)
    n_chunks = (
        f"1 + CAST(ceil(greatest(n - {window}, 0) / CAST({stride} AS DOUBLE)) AS INT)"
    )
    return (
        toks.select(
            "doc_id",
            "t",
            "n",
            F.posexplode(F.expr(f"sequence(1, {n_chunks})")).alias("chunk_id", "_one"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(
                f"size(slice(t, chunk_id * {stride} + 1, {window}))"
            ).cast("long").alias("n_tokens"),
            F.expr(
                f"array_join(slice(t, chunk_id * {stride} + 1, {window}), ' ')"
            ).alias("chunk_text"),
        )
        .where(F.col("n_tokens") > 0)
        .orderBy("doc_id", "chunk_id")
    )


def chunk_documents_sql(window: int = 64, stride: int = 48) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {TOKENS_SQL} AS t, len({TOKENS_SQL}) AS n FROM documents),
chunks AS (
  SELECT doc_id, c.k AS chunk_id,
         t[c.k * {stride} + 1 : c.k * {stride} + {window}] AS w
  FROM toks,
       UNNEST(range(1 + CAST(ceil(greatest(n - {window}, 0) / CAST({stride} AS DOUBLE)) AS INT))) AS c(k))
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       array_to_string(w, ' ') AS chunk_text
FROM chunks
WHERE len(w) > 0
ORDER BY doc_id, chunk_id
"""
