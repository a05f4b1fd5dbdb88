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
  apply the merge as a JVM aggregate fold over the word table (no
  Python boundary in the loop — round 9, guide §4.1). A per-merge
  LAZY localCheckpoint truncates lineage; the next argmax job doubles
  as its materializing action (the same iterative-plan discipline as
  dedup's connected components).
- Merges are deterministic: ties break on the lexicographically
  smallest (left, right) pair, so two engines (and re-runs) produce
  identical merge tables.

Oracle: the merge loop is unrolled into chained DuckDB CTEs
(train_merges_sql — full hash-checked parity in the driver gate);
correctness is additionally pinned by a differential pytest against a
pure-Python reference implementation on the same corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from transferdb_spark.ext.text import TOKENS
from transferdb_spark.ext.text import spread_narrow as _spread

def word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt) frequency table — the one corpus-wide shuffle."""
    return (
        _spread(docs).select(F.explode(F.expr(TOKENS)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Initial char split as a JVM transform (round-9, guide §4.1): no
# Python boundary in the trainer seed pass. word_counts filters empty
# words, so sequence(1, length(word)) is always ascending.
_CHARS_EXPR = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"


def _merge_strs_col(left: str, right: str):
    """Greedy left-to-right non-overlapping merge application as a JVM
    fold (round-9, guide §4.1 — the same machine as
    wordpiece._wp_merge_col; replaces the per-iteration pandas UDF and
    its Python-worker round-trip). State = (out, pend): each symbol
    either completes the (left, right) pair with the pending symbol,
    or flushes the pending symbol and becomes pending itself — exactly
    the two-pointer loop of the old UDF (a merged pair consumes both
    symbols, so an emitted merge can never re-merge with the next
    symbol within the same pass). left/right bind via F.lit, not SQL
    literals, so arbitrary symbol bytes need no escaping."""
    merged = left + right

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


def train_merges(
    docs: DataFrame, n_merges: int = 10, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)].

    Stops early when no pair reaches ``min_freq``.
    """
    merges, words, live = _train_merges_with_words(docs, n_merges, min_freq)
    # the word table is discarded here, so BOTH still-pinned
    # checkpoints can be freed (the final one may be unmaterialized —
    # freeing it just drops the persist mark). Fixes the round-9
    # advice: this path used to leak two pinned RDDs per call.
    for ids in live:
        _free_checkpoint(words, ids)
    return merges


def _tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> tuple[DataFrame, set]:
    """localCheckpoint plus the ids of the RDD blocks it pinned, so the
    iterative trainers can FREE superseded checkpoints via
    _free_checkpoint: Dataset.unpersist() only talks to the SQL cache
    manager and leaves checkpoint blocks resident for the whole
    session — every training run would otherwise leak one cached RDD
    per merge iteration. Driver code here is single-threaded, so the
    before/after id diff cannot sweep someone else's cache.

    eager=False registers the checkpoint (persist happens at marking
    time, so the id diff still sees it) but defers materialization to
    the next job over the relation — used by the merge loops so the
    following argmax job doubles as the materializing action. Callers
    must NOT free a lazy checkpoint's PARENT until some job has
    materialized it (localCheckpoint is non-reliable: dropped parent
    blocks cannot be recomputed)."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=eager)
    ids = set(sc._jsc.getPersistentRDDs().keySet().toArray()) - before
    return out, ids


def _free_checkpoint(df: DataFrame, ids: set) -> None:
    scala_map = df.sparkSession.sparkContext._jsc.sc().getPersistentRDDs()
    for rid in ids:
        ref = scala_map.get(rid)
        if ref.isDefined():
            ref.get().unpersist(False)


def _train_merges_with_words(
    docs: DataFrame, n_merges: int, min_freq: int
) -> tuple[list[tuple[str, str, int]], DataFrame, list[set]]:
    """Training loop that also returns the fully-merged (syms, cnt)
    word table — the apply stage (encoded_length_histogram) consumes
    it directly instead of re-running every merge pass — plus the
    list of still-pinned checkpoint id sets. A caller that consumes
    the word table must keep them alive (the final checkpoint may be
    unmaterialized and its parent is non-reliable); a caller that
    discards the table should free them all."""
    # initial checkpoint LAZY too (round-10): the first iteration's
    # argmax job doubles as its materializing action — one fewer
    # driver job per trainer call; the un-checkpointed word_counts
    # lineage is recomputable, so laziness is safe even if nothing
    # ever materializes it (n_merges=0)
    words, ckpt = _tracked_local_checkpoint(
        word_counts(docs).select(F.expr(_CHARS_EXPR).alias("syms"), "cnt"),
        eager=False,
    )
    merges: list[tuple[str, str, int]] = []
    # Per-merge LAZY localCheckpoint (round-9, the star-contraction
    # discipline): lineage truncation is structural either way, and
    # the next iteration's argmax job doubles as the materializing
    # action — no extra checkpoint job per merge (the old eager form
    # paid one), and every argmax reads a depth-≤1 fold over
    # materialized blocks (a cadence-8 variant was A/B-measured: the
    # recompute + codegen of 8-deep fold chains cost MORE cold than
    # the per-merge materialize job it saved). Freeing is DEFERRED one
    # iteration: a lazy checkpoint's parent blocks must stay alive
    # until the argmax job has materialized it (localCheckpoint is
    # non-reliable — dropped parent blocks cannot be recomputed).
    old_ckpt: set | None = None
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
        # the argmax job above materialized the current lazy
        # checkpoint, so its parent (two checkpoints back) is now
        # safely recomputation-free to drop
        if old_ckpt is not None:
            _free_checkpoint(words, old_ckpt)
            old_ckpt = None
        if top is None or top["freq"] < min_freq:
            break
        merges.append((top["l"], top["r"], int(top["freq"])))
        words, new_ckpt = _tracked_local_checkpoint(
            words.select(
                _merge_strs_col(top["l"], top["r"]).alias("syms"), "cnt"
            ),
            eager=False,
        )
        old_ckpt = ckpt
        ckpt = new_ckpt
    # the FINAL checkpoint stays alive: callers consume the word table
    # (plus its parent when the last merge's checkpoint is still
    # unmaterialized — the consumer's first job materializes it)
    live = [ids for ids in (old_ckpt, ckpt) if ids is not None]
    return merges, words, live


def encoded_length_histogram(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """Tokenizer APPLY: symbolize the corpus vocabulary under the
    trained merge table and histogram symbols-per-word — the
    compression curve a tokenizer team reads before shipping a vocab
    (n_syms → distinct words at that length, corpus occurrences).

    Same scale shape as training — and the same WORK: the training
    loop's final word table IS the fully-merged symbolization, so the
    apply stage reuses it instead of re-tokenizing and re-running
    every merge pass."""
    # still-pinned trainer checkpoints deliberately stay alive: the
    # returned lazy DataFrame consumes the word table, and a lazy
    # final checkpoint's parent must survive until the consumer's
    # first job materializes it (localCheckpoint is non-reliable).
    # ContextCleaner frees both once the result is garbage.
    _, words, _live = _train_merges_with_words(docs, n_merges, min_freq=2)
    return (
        words.select(F.size("syms").alias("n_syms"), "cnt")
        .groupBy("n_syms")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("cnt").alias("n_occurrences"),
        )
        .orderBy("n_syms")
    )


def encoded_length_histogram_sql(n_merges: int = 5, min_freq: int = 2) -> str:
    """Oracle twin: the same unrolled merge CTEs, final select grouped
    on per-word symbol counts instead of the merge list."""
    parts = _merge_ctes(n_merges, min_freq)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(n_syms AS INT) AS n_syms,
       COUNT(*) AS n_words,
       CAST(SUM(cnt) AS BIGINT) AS n_occurrences
FROM (SELECT wid, MAX(pos) AS n_syms, MAX(cnt) AS cnt FROM w{n_merges} GROUP BY wid)
GROUP BY n_syms ORDER BY n_syms
"""
    )


def train_merges_sql(n_merges: int = 10, min_freq: int = 2) -> str:
    """DuckDB oracle for train_merges: the merge loop UNROLLED into
    chained CTEs (one pair-count + argmax + merge-apply block per
    iteration — n_merges is small, so full unrolling keeps the oracle
    pure SQL where a recursive CTE could not carry the per-step argmax).

    The greedy left-to-right pair merge is expressed relationally:
    symbols live as (word, pos, sym) rows; matched positions form
    gaps-and-islands runs, and greedy consumption = keeping alternating
    positions within each run (a kept match consumes its right symbol,
    which un-consumes the next, etc. — exactly run-parity). The merged
    rows concatenate sym||next, rows consumed by a kept left neighbour
    drop out, and positions re-densify for the next round. Ties break
    (freq DESC, l, r) in both engines."""
    parts = _merge_ctes(n_merges, min_freq)
    unions = "\nUNION ALL ".join(
        f'SELECT {k - 1} AS rank, l AS "left", r AS "right", '
        f"CAST(freq AS BIGINT) AS freq FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY rank"


def _merge_ctes(n_merges: int, min_freq: int) -> list[str]:
    """Shared CTE chain: wc, w0, then (f/t/m/k/w){1..n}. m{k} LEFT
    JOINs the (possibly empty) argmax so an early-stopped training
    leaves w{k} = w{k-1} instead of an empty relation — parity with
    the Spark loop's break."""
    from transferdb_spark.ext.text import TOKENS_SQL

    parts = [
        f"""wc AS (
  SELECT tok AS word, COUNT(*) AS cnt
  FROM (SELECT unnest({TOKENS_SQL}) AS tok FROM documents)
  WHERE length(tok) > 0 GROUP BY tok),
w0 AS (
  SELECT word AS wid, cnt, CAST(g.i AS INT) AS pos,
         substr(word, CAST(g.i AS INT), 1) AS sym
  FROM wc, UNNEST(generate_series(1, length(word))) AS g(i))"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"w{k - 1}"
        parts.append(
            f"""f{k} AS (
  SELECT l, r, SUM(cnt) AS freq FROM (
    SELECT sym AS l, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS r, cnt
    FROM {prev})
  WHERE r IS NOT NULL GROUP BY l, r),
t{k} AS (SELECT l, r, freq FROM f{k} WHERE freq >= {min_freq}
         ORDER BY freq DESC, l, r LIMIT 1),
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
w{k} AS (
  SELECT wid, cnt, CAST(ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS INT) AS pos,
         CASE WHEN keepm THEN sym || nxt ELSE sym END AS sym
  FROM (SELECT *, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt,
               COALESCE(lag(keepm) OVER (PARTITION BY wid ORDER BY pos), FALSE) AS pkeep
        FROM k{k})
  WHERE NOT pkeep)"""
        )
    return parts


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2-style): symbols are ints — 0..255 are raw
# UTF-8 bytes, merged symbols take ids 256, 257, ... in merge order.
# Training stops at ``vocab_size`` (the real tokenizer-training stop
# condition) or when no pair reaches ``min_freq``. Compared to the
# word-level trainer above, every shuffle carries 8-byte int pairs
# instead of strings, and there is no out-of-vocabulary symbol by
# construction (any byte sequence is encodable).
# ---------------------------------------------------------------------------

_ARR_INT = T.ArrayType(T.IntegerType())

# GPT-2's pre-tokenization pattern (public: Radford et al. 2019 /
# openai-gpt2 encoder.py): contractions, space-prefixed letter runs,
# space-prefixed number runs, space-prefixed punctuation runs, then
# whitespace (trailing-run lookahead keeps a final newline separate).
# Two renderings of the SAME pattern: Java regex for the Spark side
# (\p{L}/\p{Nd} property classes), Python stdlib re for the encode /
# differential side ([^\W\d_] is re's unicode-letter idiom). Parity
# notes: the punct class must explicitly re-admit '_' in Python
# (\w contains it, so a bare [^\s\w] silently DROPS underscores —
# characters matching no alternative vanish from re.findall); digits
# align on \p{Nd} == \d (upstream GPT-2 uses \p{N}, whose extra
# Nl/No members would land in different branches across the two
# engines — a deliberate, documented deviation on those rare chars).
GPT2_PRETOK_JAVA = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{Nd}+| ?[^\s\p{L}\p{Nd}]+|\s+(?!\S)|\s+"
GPT2_PRETOK_PY = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def gpt2_pre_tokenize(text: str) -> list[str]:
    """Python-side GPT-2 pre-tokenization (covers every character:
    the alternatives partition the string)."""
    import re

    return re.findall(GPT2_PRETOK_PY, text)


# UTF-8 byte split as a JVM transform (round-9, guide §4.1): hex() of
# a 1-byte binary slice conv'd back to decimal is the exact byte value
# — verified equal to list(word.encode('utf-8')) including multi-byte
# code points. No Python boundary in the trainer seed pass.
_BYTES_EXPR = (
    "transform(sequence(1, octet_length(encode(word, 'UTF-8'))),"
    " i -> CAST(conv(hex(substring(encode(word, 'UTF-8'), i, 1)), 16, 10) AS INT))"
)


def word_counts_gpt2(docs: DataFrame) -> DataFrame:
    """(token, cnt) under GPT-2 pre-tokenization — case-preserving and
    whitespace-carrying (' word' tokens), unlike the lowercased
    whitespace TOKENS split. JVM-side regexp_extract_all: the one
    corpus-wide shuffle, no Python in the scan."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(GPT2_PRETOK_JAVA), F.lit(0))
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_ints_col(left: int, right: int, new_id: int):
    """Integer-symbol variant of _merge_strs_col: the same greedy
    non-overlapping (left, right) → new_id fold as a JVM aggregate
    (round-9, guide §4.1 — replaces the per-merge pandas UDF)."""

    def step(acc, s):
        out, pend = acc["out"], acc["pend"]
        return (
            F.when(pend.isNull(), F.struct(out.alias("out"), s.alias("pend")))
            .when(
                (pend == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.array_append(out, F.lit(new_id)).alias("out"),
                    F.lit(None).cast("int").alias("pend"),
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
        F.expr("CAST(array() AS ARRAY<INT>)").alias("out"),
        F.lit(None).cast("int").alias("pend"),
    )
    return F.aggregate(F.col("syms"), zero, step, fin)


def train_bytes(
    docs: DataFrame,
    vocab_size: int = 280,
    min_freq: int = 2,
    pre_tokenizer: str = "whitespace",
) -> list[tuple[int, int, int, int]]:
    """Byte-level BPE training; returns [(left_id, right_id, new_id,
    freq)] with new_id assigned 256, 257, ... in merge order.

    Stops when the vocabulary (256 base bytes + merges) reaches
    ``vocab_size``, or earlier when no adjacent pair reaches
    ``min_freq`` — the stopping rule production tokenizer training
    uses (target vocab, not target merge count). Ties break on the
    numerically smallest (left, right), so re-runs and the pure-Python
    differential reference agree exactly.

    pre_tokenizer='whitespace' (default) trains over the lowercased
    whitespace word table; 'gpt2' trains over GPT-2 regex pre-tokens
    (case-preserving, leading-space-carrying — the real tokenizer
    training domain)."""
    if vocab_size <= 256:
        return []
    wc = word_counts_gpt2(docs) if pre_tokenizer == "gpt2" else word_counts(docs)
    # initial checkpoint lazy — same argument as _train_merges_with_words
    words, ckpt = _tracked_local_checkpoint(
        wc.select(F.expr(_BYTES_EXPR).alias("syms"), "cnt"),
        eager=False,
    )
    merges: list[tuple[int, int, int, int]] = []
    # per-merge LAZY checkpoint with one-iteration deferred freeing —
    # see _train_merges_with_words for the full argument
    old_ckpt: set | None = None
    for step in range(vocab_size - 256):
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
        if old_ckpt is not None:  # materialized by the argmax job above
            _free_checkpoint(words, old_ckpt)
            old_ckpt = None
        if top is None or top["freq"] < min_freq:
            break
        new_id = 256 + step
        merges.append((int(top["l"]), int(top["r"]), new_id, int(top["freq"])))
        words, new_ckpt = _tracked_local_checkpoint(
            words.select(
                _merge_ints_col(top["l"], top["r"], new_id).alias("syms"), "cnt"
            ),
            eager=False,
        )
        old_ckpt = ckpt
        ckpt = new_ckpt
    # merges are collected; nothing reads the table — free BOTH live
    # checkpoints (the last one may be unmaterialized; freeing an
    # unmaterialized lazy checkpoint is just dropping its persist mark)
    if old_ckpt is not None:
        _free_checkpoint(words, old_ckpt)
    _free_checkpoint(words, ckpt)
    return merges


def vocab_tokens(merges: list[tuple[int, int, int, int]]) -> dict[int, bytes]:
    """symbol id -> byte string it expands to (base bytes + learned)."""
    vocab: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    for left, right, new_id, _ in merges:
        vocab[new_id] = vocab[left] + vocab[right]
    return vocab


def special_token_ids(
    merges: list[tuple[int, int, int, int]], special_tokens: list[str]
) -> dict[str, int]:
    """Assign ids to ADDED special tokens above the learned vocab
    (tokenizers-library convention): next free id after 256 base bytes
    and every merge-produced symbol, in the given order."""
    base = max([255] + [new_id for _, _, new_id, _ in merges]) + 1
    return {tok: base + i for i, tok in enumerate(special_tokens)}


def _make_text_encoder(
    ranks: dict,
    pre_tokenizer: str,
    specials: list[str],
    special_ids: dict[str, int] | None,
):
    """text -> list[int] encoder closure shared by the count and the
    id-sequence apply paths (one algorithm, two projections).

    ``ranks``: {(left, right): (rank, new_id)} from the merge table.
    ``specials`` must already be sorted longest-first; ``special_ids``
    maps each to its added-token id (required when specials given).
    """
    import re as _re

    def encode_word(word: bytes) -> list[int]:
        syms = list(word)
        while len(syms) > 1:
            best, at = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r[0] < best[0]):
                    best, at = r, i
            if best is None:
                break
            # replace EVERY occurrence of this pair left-to-right
            # (matches training's greedy full-pass application)
            left, right = syms[at], syms[at + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def encode_ws(text: str) -> list[int]:
        # training merges never span whitespace (word_counts
        # pre-tokenizes), so rank-greedy over the full byte stream
        # decomposes exactly into per-word encoding + one base-byte
        # token per whitespace byte — same result, O(word) working
        # sets. lower() matches word_counts' TOKENS normalization, so
        # the apply path sees the distribution training saw. The
        # capturing split keeps each whitespace byte as its own
        # segment, preserving stream order for the id sequence.
        b = text.lower().encode("utf-8")
        out: list[int] = []
        for seg in _re.split(rb"(\s)", b):
            if not seg:
                continue
            if len(seg) == 1 and seg in b"\t\n\x0b\x0c\r ":
                out.append(seg[0])
            else:
                out.extend(encode_word(seg))
        return out

    def encode_gpt2(text: str) -> list[int]:
        # GPT-2 pre-tokens partition the text exactly; each token
        # is the training unit, so per-token encoding IS the
        # full-stream segmentation
        out: list[int] = []
        for t in gpt2_pre_tokenize(text):
            out.extend(encode_word(t.encode("utf-8")))
        return out

    encode = encode_gpt2 if pre_tokenizer == "gpt2" else encode_ws
    if not specials:
        return encode

    spec_re = "(" + "|".join(_re.escape(s) for s in specials) + ")"
    pat = _re.compile(spec_re)
    sids = special_ids or {}

    def encode_with_specials(text: str) -> list[int]:
        # alternation tries specials longest-first; capturing split
        # keeps the matched literals as segments
        out: list[int] = []
        for seg in pat.split(text):
            if not seg:
                continue
            if seg in sids:
                out.append(sids[seg])
            else:
                out.extend(encode(seg))
        return out

    return encode_with_specials


def encode_bytes_df(
    docs: DataFrame,
    merges: list[tuple[int, int, int, int]],
    pre_tokenizer: str = "whitespace",
    special_tokens: list[str] | None = None,
) -> DataFrame:
    """Tokenizer APPLY at corpus scale: (doc_id, n_bytes, n_tokens)
    under the trained byte-level merge table.

    The merge list is broadcast once (tokenizer tables are KBs); each
    Arrow batch encodes with the standard rank-greedy BPE algorithm —
    repeatedly merge the LOWEST-RANK pair present — which for a merge
    list produced by greedy training yields the same segmentation as
    replaying every merge in order, in O(word · merges-present) instead
    of O(word · total-merges).

    `special_tokens` are ADDED tokens (tokenizers-library semantics):
    the text splits on their literal occurrences FIRST (longest match
    wins when one special is a prefix of another), each occurrence
    costs exactly one token (`special_token_ids` maps them above the
    learned vocab), and BPE never merges across a special-token
    boundary — the split happens before pre-tokenization, so a
    document ending "…text<|endoftext|>" cannot leak the marker's
    bytes into a neighbouring merge."""
    spark = docs.sparkSession
    ranks_b = spark.sparkContext.broadcast(
        {(left, right): (i, new_id) for i, (left, right, new_id, _) in enumerate(merges)}
    )
    specials = sorted(special_tokens or [], key=len, reverse=True)
    sids = special_token_ids(merges, specials) if specials else None

    @pandas_udf(T.IntegerType())
    def n_tokens(texts: pd.Series) -> pd.Series:
        encode = _make_text_encoder(ranks_b.value, pre_tokenizer, specials, sids)
        return texts.map(lambda t: len(encode(t))).astype("int32")

    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("int").alias("n_bytes"),
        n_tokens(F.col("text")).alias("n_tokens"),
    ).orderBy("doc_id")


def encode_ids_df(
    docs: DataFrame,
    merges: list[tuple[int, int, int, int]],
    pre_tokenizer: str = "whitespace",
    special_tokens: list[str] | None = None,
) -> DataFrame:
    """Tokenizer apply that EMITS the token-id sequence per document —
    (doc_id, n_tokens, token_ids array<int>) — the input the sequence
    packer consumes. Same broadcast merge table and rank-greedy
    algorithm as `encode_bytes_df` (one shared encoder closure), with
    the sequence kept instead of its length.

    Round-trip contract (pytest-pinned): concatenating
    `vocab_tokens(merges)[id]` over token_ids reconstructs the
    pre-tokenized byte stream exactly — `text.lower().encode()` for
    whitespace mode, `text.encode()` for gpt2 mode; added special
    tokens map to their single added id.

    Scale: token ids are ~4 bytes/token of Arrow batch traffic — the
    same order as the text itself; no shuffle is introduced (narrow
    projection)."""
    spark = docs.sparkSession
    ranks_b = spark.sparkContext.broadcast(
        {(left, right): (i, new_id) for i, (left, right, new_id, _) in enumerate(merges)}
    )
    specials = sorted(special_tokens or [], key=len, reverse=True)
    sids = special_token_ids(merges, specials) if specials else None

    @pandas_udf(_ARR_INT)
    def token_ids(texts: pd.Series) -> pd.Series:
        encode = _make_text_encoder(ranks_b.value, pre_tokenizer, specials, sids)
        return texts.map(encode)

    # per-row Python encode on an under-partitioned scan is the
    # textbook spread case (guide §2.5/§4 — same as the image-decode
    # pass): the sf-fixture documents scan is ONE row group, so the
    # encode otherwise runs on one core of 32. No-op when the scan
    # already has enough splits.
    docs = _spread(docs)
    return docs.select(
        "doc_id",
        token_ids(F.col("text")).alias("token_ids"),
    ).select(
        "doc_id",
        F.size("token_ids").alias("n_tokens"),
        "token_ids",
    )


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
