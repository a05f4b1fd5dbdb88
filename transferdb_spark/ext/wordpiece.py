"""Distributed WordPiece trainer — the third tokenizer-training rung.

BPE (ext/bpe.py) merges the most FREQUENT pair; the unigram LM
(ext/unigram_lm.py) prunes a seed vocabulary top-down; WordPiece
(Schuster & Nakajima 2012, the BERT tokenizer) merges the pair with
the highest LIKELIHOOD GAIN:

    score(l, r) = count(l·r) / (count(l) · count(r))

over the current segmentation, with non-initial subwords carrying the
``##`` continuation prefix. Every BERT-family pipeline trains this;
an engine with two tokenizer trainers and not this one has a hole.

Cross-engine exactness (the lesson of bpe_train_merges vs
unigram_vocab): the score is a RATIONAL number, so instead of float
division the argmax orders by the integer-quantized

    score_q = (freq · 10^12) DIV (count(l) · count(r))

— integer floor division is bit-identical on Spark and DuckDB, so the
oracle is a full unrolled-CTE replay like BPE's, not a rows-only row.
Ties break (score_q DESC, freq DESC, l, r). BIGINT bounds: freq·10^12
needs freq < 9.2·10^6 — fine for the gate corpus; at 100-TB corpus
scale the same expression moves to DECIMAL(38,0) unchanged in both
engines (documented here rather than paid everywhere).

Scale shape = the BPE trainer's (the audited one): corpus → (word,
cnt) once, then per merge: pair explode → map-side-combined groupBy,
plus one symbol-count groupBy for the denominators; the driver sees
ONE argmax row per iteration; merge application is an Arrow-batched
pandas UDF over the distinct-word table with per-iteration
localCheckpoint and explicit block freeing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from transferdb_spark.ext.bpe import (
    _free_checkpoint,
    _tracked_local_checkpoint,
    word_counts,
)

_ARR_STR = T.ArrayType(T.StringType())

SCORE_SCALE = 10**12


@pandas_udf(_ARR_STR)
def _wp_chars_udf(words: pd.Series) -> pd.Series:
    def split(w):
        return [w[0]] + ["##" + c for c in w[1:]]

    return words.map(split)


def _wp_merge_udf(left: str, right: str):
    merged = left + (right[2:] if right.startswith("##") else right)

    @pandas_udf(_ARR_STR)
    def apply_merge(syms: pd.Series) -> pd.Series:
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


def train_wordpiece(
    docs: DataFrame, n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str, int, int]]:
    """Learn ``n_merges`` WordPiece merges over the documents corpus;
    returns [(left, right, freq, score_q)] in merge order."""
    words, ckpt = _tracked_local_checkpoint(
        word_counts(docs).select(_wp_chars_udf("word").alias("syms"), "cnt")
    )
    merges: list[tuple[str, str, int, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (s, i) -> struct(s AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("freq"))
        )
        # vocabulary-sized (≤ seed chars + merges so far): broadcast
        # both denominator joins so the only shuffle per iteration is
        # the two map-side-combined groupBys
        sym_counts = (
            words.select(F.explode("syms").alias("sym"), "cnt")
            .groupBy("sym")
            .agg(F.sum("cnt").alias("scnt"))
        )
        scored = (
            pairs.join(F.broadcast(sym_counts.withColumnRenamed("sym", "l")), "l")
            .withColumnRenamed("scnt", "lcnt")
            .join(F.broadcast(sym_counts.withColumnRenamed("sym", "r")), "r")
            .withColumnRenamed("scnt", "rcnt")
            .where(F.col("freq") >= min_freq)
            # integer-quantized likelihood score — exact in both engines
            .withColumn(
                "score_q",
                F.expr(f"CAST(freq * {SCORE_SCALE}L DIV (lcnt * rcnt) AS BIGINT)"),
            )
        )
        top = scored.orderBy(
            F.desc("score_q"), F.desc("freq"), F.asc("l"), F.asc("r")
        ).first()
        if top is None:
            break
        merges.append((top["l"], top["r"], int(top["freq"]), int(top["score_q"])))
        words, new_ckpt = _tracked_local_checkpoint(
            words.select(
                _wp_merge_udf(top["l"], top["r"])(F.col("syms")).alias("syms"), "cnt"
            )
        )
        _free_checkpoint(words, ckpt)
        ckpt = new_ckpt
    _free_checkpoint(words, ckpt)
    return merges


def train_wordpiece_df(
    docs: DataFrame, n_merges: int = 10, min_freq: int = 2
) -> DataFrame:
    """queries() shape: (rank, left, right, freq, score_q)."""
    spark = docs.sparkSession
    merges = train_wordpiece(docs, n_merges, min_freq)
    rows = [(i, l, r, f, s) for i, (l, r, f, s) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, freq long, score_q long"
    ).orderBy("rank")


def wordpiece_vocab(merges: list[tuple[str, str, int, int]]) -> list[str]:
    """Merge table → added vocabulary tokens, in merge order."""
    return [l + (r[2:] if r.startswith("##") else r) for l, r, _, _ in merges]


def encode_wordpiece(word: str, vocab: set[str], unk: str = "[UNK]") -> list[str]:
    """BERT's greedy longest-match-first encoding (public reference:
    google-research/bert tokenization.py WordpieceTokenizer)."""
    out: list[str] = []
    i = 0
    while i < len(word):
        end = len(word)
        cur = None
        while end > i:
            piece = word[i:end]
            if i > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [unk]
        out.append(cur)
        i = end
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle — the BPE unrolled-CTE replay with the WordPiece score


def train_wordpiece_sql(n_merges: int = 10, min_freq: int = 2) -> str:
    """Full training replay as chained CTEs: per iteration, pair
    frequencies JOIN per-symbol counts, argmax by the SAME quantized
    integer score, greedy run-parity merge application (the
    gaps-and-islands encoding proven in bpe.train_merges_sql)."""
    parts = _wp_ctes(n_merges, min_freq)
    unions = "\nUNION ALL ".join(
        f'SELECT {k - 1} AS rank, l AS "left", r AS "right", '
        f"CAST(freq AS BIGINT) AS freq, CAST(score_q AS BIGINT) AS score_q FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY rank"


def _wp_ctes(n_merges: int, min_freq: int) -> list[str]:
    from transferdb_spark.ext.text import TOKENS_SQL

    parts = [
        f"""wc AS (
  SELECT tok AS word, COUNT(*) AS cnt
  FROM (SELECT unnest({TOKENS_SQL}) AS tok FROM documents)
  WHERE length(tok) > 0 GROUP BY tok),
w0 AS MATERIALIZED (
  SELECT word AS wid, cnt, CAST(g.i AS INT) AS pos,
         CASE WHEN g.i = 1 THEN substr(word, 1, 1)
              ELSE '##' || substr(word, CAST(g.i AS INT), 1) END AS sym
  FROM wc, UNNEST(generate_series(1, length(word))) AS g(i))"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        # w{k-1} is referenced THREE times per level (s/f/m) — DuckDB
        # inlines multi-referenced CTEs unless MATERIALIZED, which
        # would recompute the whole chain 3^k times
        parts.append(
            f"""s{k} AS (SELECT sym, SUM(cnt) AS scnt FROM {prev} GROUP BY sym),
f{k} AS (
  SELECT l, r, SUM(cnt) AS freq FROM (
    SELECT sym AS l, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS r, cnt
    FROM {prev})
  WHERE r IS NOT NULL GROUP BY l, r),
t{k} AS (
  SELECT f.l, f.r, f.freq,
         (CAST(f.freq AS BIGINT) * {SCORE_SCALE}) // (sl.scnt * sr.scnt) AS score_q
  FROM f{k} f JOIN s{k} sl ON f.l = sl.sym JOIN s{k} sr ON f.r = sr.sym
  WHERE f.freq >= {min_freq}
  ORDER BY score_q DESC, f.freq DESC, f.l, f.r LIMIT 1),
m{k} AS (
  SELECT w.wid, w.cnt, w.pos, w.sym,
         COALESCE(w.sym = t.l AND
           lead(w.sym) OVER (PARTITION BY w.wid ORDER BY w.pos) = t.r, FALSE) AS mt
  FROM {prev} w LEFT JOIN t{k} t ON TRUE),
k{k} AS (
  SELECT wid, cnt, pos, sym, mt,
         CASE WHEN mt THEN
           CAST(pos - MIN(pos) OVER (PARTITION BY wid, mt, grp) AS INT) % 2 = 0
         ELSE FALSE END AS keepm
  FROM (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY wid, mt ORDER BY pos) AS grp
        FROM m{k})),
w{k} AS MATERIALIZED (
  SELECT wid, cnt, CAST(ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS INT) AS pos,
         CASE WHEN keepm THEN
           sym || (CASE WHEN nxt LIKE '##%' THEN substr(nxt, 3) ELSE nxt END)
         ELSE sym END AS sym
  FROM (SELECT *, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt,
               COALESCE(lag(keepm) OVER (PARTITION BY wid ORDER BY pos), FALSE) AS pkeep
        FROM k{k})
  WHERE NOT pkeep)"""
        )
    return parts
