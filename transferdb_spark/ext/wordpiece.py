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
ONE argmax row per iteration; merge application is a lazy JVM fold
over the distinct-word table (round 9 — no Python round-trip), with
localCheckpoint every 8 merges bounding the lineage and explicit
block freeing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferdb_spark.ext.bpe import (
    _free_checkpoint,
    _tracked_local_checkpoint,
    word_counts,
)

SCORE_SCALE = 10**12


# initial segmentation as a JVM expression (round-9, guide §4.1): one
# character per symbol with the ##-continuation prefix — substring and
# length are code-point based on both engines, matching the Python
# w[0]/w[1:] split the pandas UDF used to do, without the Arrow
# round-trip on the training table's build pass.
_WP_CHARS = (
    "transform(sequence(1, length(word)),"
    " i -> IF(i = 1, substring(word, 1, 1), '##' || substring(word, i, 1)))"
)


def _wp_merge_col(left: str, right: str):
    """Greedy left-to-right non-overlapping merge application as a
    JVM fold (round-9, guide §4.1 — replaces the per-iteration pandas
    UDF and its Python-worker round-trip). State = (out, pend): each
    symbol either completes the (left, right) pair with the pending
    symbol, or flushes the pending symbol and becomes pending itself —
    exactly the two-pointer loop of the old UDF (merged pairs consume
    both symbols, so an emitted merge can never re-merge with the next
    symbol this round). left/right bind via F.lit, not SQL literals,
    so arbitrary token bytes need no escaping."""
    merged = left + (right[2:] if right.startswith("##") else right)

    def step(acc, s):
        out, pend = acc["out"], acc["pend"]
        return (
            F.when(pend.isNull(), F.struct(out.alias("out"), s.alias("pend")))
            .when(
                (pend == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.array_append(out, F.lit(merged)).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(F.array_append(out, pend).alias("out"), s.alias("pend"))
            )
        )

    def fin(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["pend"])
        )

    zero = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(F.col("syms"), zero, step, fin)


def train_wordpiece(
    docs: DataFrame, n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str, int, int]]:
    """Learn ``n_merges`` WordPiece merges over the documents corpus;
    returns [(left, right, freq, score_q)] in merge order."""
    # initial checkpoint LAZY (round-10, same as the BPE trainers):
    # the first argmax job doubles as its materializing action — one
    # fewer driver job per train; the un-checkpointed word_counts
    # lineage is recomputable, so laziness is safe
    words, ckpt = _tracked_local_checkpoint(
        word_counts(docs).select(F.expr(_WP_CHARS).alias("syms"), "cnt"),
        eager=False,
    )
    merges: list[tuple[str, str, int, int]] = []
    # checkpoint CADENCE (round-9): merge application is now a lazy JVM
    # fold, so a per-iteration localCheckpoint (one extra job each
    # merge) is overkill — lineage still needs truncating for long
    # trainings, but every 8 merges bounds the chain at ≤8 stacked
    # folds (narrow, per-row, no Python) recomputed at most twice per
    # argmax job. Measured at sf0.1: the per-iteration checkpoint was
    # ~0.2 s/merge of pure job overhead on a vocabulary-sized table.
    ckpt_every = 8
    pending = 0
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
        # the two map-side-combined groupBys. (A round-9 A/B replaced
        # the two broadcasts with one one-row map broadcast — it
        # measured ~0.2 s SLOWER per train: the collect_list funnel
        # adds a single-partition stage that costs more than the
        # second broadcast build saves.)
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
        words = words.select(
            _wp_merge_col(top["l"], top["r"]).alias("syms"), "cnt"
        )
        pending += 1
        if pending >= ckpt_every:
            words, new_ckpt = _tracked_local_checkpoint(words)
            _free_checkpoint(words, ckpt)
            ckpt = new_ckpt
            pending = 0
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
