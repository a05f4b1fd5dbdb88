"""Distributed BPE merge training over the `documents` corpus.

The canonical tokenizer-training loop (Sennrich-style byte-pair
encoding): count symbol-pair frequencies over the corpus, merge the
most frequent pair, repeat. Every LLM data pipeline runs some form of
this before tokenized text exists at all — `ext/text.py` counts
BPE-ish tokens, this module TRAINS the merge table those counts
presuppose.

Scale shape (100 TB of text):
- The corpus collapses to a (word, count) frequency table first — ONE
  groupBy over the tokenized corpus; everything after iterates over
  unique words (orders of magnitude smaller, and the classic reason
  word-level BPE training is tractable at all).
- Each merge iteration is: explode adjacent symbol pairs weighted by
  word count → map-side-combined groupBy(pair) → take the argmax row
  (driver sees ONE row, deterministic lexicographic tie-break) →
  apply the merge with an Arrow-batched pandas UDF over the word
  table. localCheckpoint truncates lineage per iteration (the same
  iterative-plan discipline as dedup's connected components).
- Merges are deterministic: ties break on the lexicographically
  smallest (left, right) pair, so two engines (and re-runs) produce
  identical merge tables.

No SQL oracle: the loop is iterative/driver-coordinated (the driver
gate records the weaker rows-only check); correctness is pinned by a
differential pytest against a pure-Python reference implementation on
the same corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from transferdb_spark.ext.text import TOKENS


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt) frequency table — the one corpus-wide shuffle."""
    return (
        docs.select(F.explode(F.expr(TOKENS)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@pandas_udf("array<string>")
def _chars_udf(words: pd.Series) -> pd.Series:
    return words.map(list)


def _merge_udf(left: str, right: str):
    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        merged = left + right
        def m(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out
        return syms.map(m)

    return apply_merge


def train_merges(
    docs: DataFrame, n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)].

    Stops early when no pair reaches ``min_freq``.
    """
    words = (
        word_counts(docs)
        .select(_chars_udf("word").alias("syms"), "cnt")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = words.select(
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (s, i) -> struct(s AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
            "cnt",
        ).groupBy("p.l", "p.r").agg(F.sum("cnt").alias("freq"))
        top = pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r")).first()
        if top is None or top["freq"] < min_freq:
            break
        merges.append((top["l"], top["r"], int(top["freq"])))
        words = words.select(
            _merge_udf(top["l"], top["r"])(F.col("syms")).alias("syms"), "cnt"
        ).localCheckpoint()
    return merges


def merges_frame(docs: DataFrame, n_merges: int = 10) -> DataFrame:
    """train_merges as a DataFrame (rank, left, right, freq) — the
    queries() surface for the driver's rows-only check."""
    spark = docs.sparkSession
    rows = [
        (i, l, r, f) for i, (l, r, f) in enumerate(train_merges(docs, n_merges))
    ]
    return spark.createDataFrame(
        rows, schema="rank int, left string, right string, freq long"
    ).orderBy("rank")
