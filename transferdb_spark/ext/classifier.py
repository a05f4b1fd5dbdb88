"""Distributed quality-classifier training over the documents table.

The discriminative counterpart to ext/dsir.py's generative importance
weights: a CCNet/RefinedWeb-style quality filter — hashed unigram
features, a linear model trained to separate the curated target slice
(source == 'src0', the same weak label DSIR uses) from the rest of the
corpus, then a corpus-wide scoring pass. fastText's quality-filter role,
re-expressed as DataFrame algebra.

Training is full-batch gradient descent with an ALGEBRAIC sigmoid
s(z) = 0.5 + z / (2·(1 + |z|)) — same shape and gradient sign structure
as the logistic curve, but built only from correctly-rounded IEEE ops
(+, ×, /, abs). That choice is load-bearing: exp() is not correctly
rounded, so a true logistic model could not be replayed bit-exactly by
the DuckDB oracle; the algebraic sigmoid can, making the TRAINED WEIGHTS
themselves hash-checkable (the same trick as the k-means replay in
ext/semdedup.py and the unrolled-CTE BPE-trainer oracle).

Cross-engine exactness of every order-sensitive reduction follows the
house rules (functions/canonical.py): per-row contributions are
stable_round(·, 9)-quantized and summed as DECIMAL(28,9) — dot products
z = w·x and per-feature gradient sums both — so Spark's and DuckDB's
different addition orders cannot diverge.

Scale design (100 TB):
- The feature pass is one explode + groupBy(doc_id, bucket) with
  map-side combine; D (=256) bounds the model, not the corpus.
- Each GD iteration: weights broadcast-join onto the hits (D rows),
  one shuffle keyed on doc_id for the logit, one groupBy(bucket)
  collapsing to ≤D+1 rows per task before the exchange. The driver
  collects exactly D+1 gradient floats per iteration — a legal small
  aggregate, never row data (the k-means precedent).
- A production run would persist the hits relation across the T
  iterations; a query-registry callable has no unpersist point, so the
  callable recomputes it (same reasoning as quality_prune_deciles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferdb_spark.ext.text import TOKENS, TOKENS_SQL
from transferdb_spark.functions.canonical import stable_round, stable_round_sql
from transferdb_spark.functions.hashing import portable_hash64, portable_hash64_sql

D = 256  # hashed feature buckets; bucket D is the bias (x=1 per doc)
ITERS = 5
LR = 0.5
TARGET_SOURCE = "src0"  # same weak label as ext/dsir.py
_Q = 9  # contribution quantization digits (DECIMAL(28,9) headroom)


# bigram rung: unigram buckets live in [0, D), bigram buckets in
# [D, 2D), bias at 2D — disjoint hash spaces so a unigram and a bigram
# never collide into the same weight. The bigram list is built with
# zip_with over two slices of a bound `toks` column (O(n); see the
# dsir.py note — element_at(<split>, i) inside a lambda re-evaluates
# the split per index).
_BIGRAMS = (
    "zip_with(slice(toks, 1, size(toks) - 1), "
    "slice(toks, 2, size(toks) - 1), (a, b) -> concat(a, ' ', b))"
)


def _dim(bigrams: bool) -> int:
    """Bias bucket index == feature-space size."""
    return 2 * D if bigrams else D


def _hits(docs: DataFrame, bigrams: bool = False) -> DataFrame:
    """(doc_id, y, bucket, x): hashed n-gram counts + the bias row."""
    dim = _dim(bigrams)
    base = docs.select(
        "doc_id",
        (F.col("source") == TARGET_SOURCE).cast("int").alias("y"),
    )
    uni = docs.select("doc_id", F.explode(F.expr(TOKENS)).alias("term")).select(
        "doc_id",
        F.pmod(portable_hash64(F.col("term")), F.lit(D)).cast("int").alias("bucket"),
    )
    grams = uni
    if bigrams:
        bi = (
            docs.select("doc_id", F.expr(TOKENS).alias("toks"))
            .select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("term"))
            .select(
                "doc_id",
                (F.pmod(portable_hash64(F.col("term")), F.lit(D)) + F.lit(D))
                .cast("int")
                .alias("bucket"),
            )
        )
        grams = uni.unionByName(bi)
    tf = grams.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("x"))
    feats = base.join(tf, "doc_id").select("doc_id", "y", "bucket", "x")
    bias = base.select(
        "doc_id", "y", F.lit(dim).alias("bucket"), F.lit(1).cast("long").alias("x")
    )
    return feats.unionByName(bias)


def _dec(col):
    return stable_round(col, _Q).cast(f"decimal(28,{_Q})")


def train_weights(
    docs: DataFrame, iters: int = ITERS, lr: float = LR, bigrams: bool = False
) -> DataFrame:
    """T full-batch GD iterations; returns (bucket, weight) — dim+1 rows.

    weight is stable_round(·, 6)-quantized at the output boundary."""
    spark = docs.sparkSession
    # materialize the feature relation ONCE: every GD iteration reads
    # it twice (forward pass + gradient), so the lazy explode+groupBy
    # over all tokens would otherwise recompute 2*ITERS times — at
    # sf0.1 that was ~8 s of pure rework for a 5-iteration train
    # pre-partition by doc_id and persist: both per-iteration
    # aggregations key on doc_id (forward-pass z, and the err join
    # feeding the gradient), and InMemoryRelation RETAINS output
    # partitioning — so the 2*ITERS recomputes AND their doc_id
    # exchanges collapse into this single pass. persist (not
    # localCheckpoint) so the unpersist in the finally keeps the
    # prune-mode lifecycle contract: no cache entries survive the call.
    # NOTE (round-9 A/B): chaining all iterations into ONE lazy DAG —
    # the Spark mirror of the oracle's w0..wT CTE chain — measured 5×
    # SLOWER (14.4 s vs 2.95 s at sf0.1): each w_i is referenced by
    # both z_i and w_{i+1}, and without a materialization point the
    # whole subtree re-executes per reference (the exact CTE-inlining
    # blowup the oracle fixes with AS MATERIALIZED). Per-iteration
    # driver steps with literal weights ARE the materialization points,
    # at the cost of one model-sized collect per iteration.
    n_docs = docs.count()  # scalar, driver-side like the SQL twin's CROSS JOIN n
    # partition grain: per-iteration jobs are scheduling-bound at small
    # SF (2 stages × parts tasks × ITERS); ~3k docs per partition keeps
    # tasks meaningful while still using the full cluster once the
    # corpus is large (min 8, capped by defaultParallelism).
    parts = max(8, min(docs.sparkSession.sparkContext.defaultParallelism,
                       int(n_docs) // 3000 + 1))
    hits = _hits(docs, bigrams).repartition(parts, "doc_id").persist()
    w = {b: 0.0 for b in range(_dim(bigrams) + 1)}
    # try/finally so the prune-mode lifecycle contract actually holds:
    # an exception mid-loop (or a failed collect) must not leak the
    # persisted feature relation for the session lifetime
    try:
        for _ in range(iters):
            # weights as a LITERAL array lookup, not a broadcast join: the
            # model is dim+1 doubles, so element_at(array(...), bucket+1)
            # embeds it in the plan — one job, zero exchanges on the
            # pre-partitioned feature relation. repr() round-trips IEEE
            # doubles exactly through Spark's literal parser, so the
            # arithmetic is bit-identical to the joined form. A non-finite
            # weight has no SQL-literal round-trip (CAST('inf' AS DOUBLE)
            # fails to parse) and means the train diverged — fail loudly.
            if any(w[b] != w[b] or w[b] in (float("inf"), float("-inf")) for b in w):
                raise ArithmeticError(
                    f"train_weights diverged to non-finite weights: "
                    f"{ {b: v for b, v in w.items() if v != v or abs(v) == float('inf')} }"
                    f" — lower lr (= {lr})"
                )
            warr = "array(" + ", ".join(
                f"CAST({float(w[b])!r} AS DOUBLE)" for b in range(_dim(bigrams) + 1)
            ) + ")"
            z = (
                hits.withColumn("w", F.expr(f"element_at({warr}, bucket + 1)"))
                .groupBy("doc_id", "y")
                .agg(F.sum(_dec(F.col("w") * F.col("x"))).cast("double").alias("z"))
            )
            err = z.select(
                "doc_id",
                (
                    F.lit(0.5)
                    + F.col("z") / (F.lit(2.0) * (F.lit(1.0) + F.abs(F.col("z"))))
                    - F.col("y").cast("double")
                ).alias("err"),
            )
            grads = (
                hits.join(err, "doc_id")
                .groupBy("bucket")
                .agg(F.sum(_dec(F.col("err") * F.col("x"))).cast("double").alias("g"))
                .collect()  # <= dim+1 rows: model-sized, corpus-independent
            )
            for r in grads:
                if r["g"] is None:
                    # decimal(28) accumulator overflowed — the train
                    # diverged past ~1e19 before weights reached IEEE inf
                    raise ArithmeticError(
                        "train_weights diverged: non-finite/overflowed "
                        f"gradient for bucket {r['bucket']} — lower lr (= {lr})"
                    )
                w[r["bucket"]] = w[r["bucket"]] - lr * (r["g"] / float(n_docs))
    finally:
        hits.unpersist()
    rows = [(b, float(v)) for b, v in sorted(w.items())]
    out = spark.createDataFrame(rows, "bucket int, weight double")
    return out.select(
        "bucket", stable_round("weight", 6).alias("weight")
    ).orderBy("bucket")


def classifier_scores(
    docs: DataFrame, iters: int = ITERS, lr: float = LR, bigrams: bool = False
) -> DataFrame:
    """(doc_id, y, score) for EVERY document: the trained-classifier
    logit. The logit (not the sigmoid) is the exposed score — monotone
    in it, and exact across engines without touching exp()."""
    w = train_weights(docs, iters, lr, bigrams)
    scored = (
        _hits(docs, bigrams)
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "y")
        .agg(
            F.sum(_dec(F.col("weight") * F.col("x"))).cast("double").alias("score")
        )
    )
    return scored.select("doc_id", "y", stable_round("score", 6).alias("score"))


def score_topk(
    docs: DataFrame,
    iters: int = ITERS,
    lr: float = LR,
    k: int = 20,
    bigrams: bool = False,
) -> DataFrame:
    """(doc_id, y, score): top-k docs by trained-classifier logit."""
    return (
        classifier_scores(docs, iters, lr, bigrams)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins: training unrolled as one CTE chain per iteration


def _bucket_sql(expr: str) -> str:
    return f"CAST({portable_hash64_sql(expr)} % {D} AS INT)"


def _dec_sql(expr: str) -> str:
    return f"CAST({stable_round_sql(expr, _Q)} AS DECIMAL(28,{_Q}))"


def _train_ctes(iters: int = ITERS, lr: float = LR, bigrams: bool = False) -> str:
    """hits/n + w0..w{iters} CTEs; w{iters} is the trained model."""
    dim = _dim(bigrams)
    bigram_branch = ""
    if bigrams:
        # bigram grams offset into [D, 2D) — DuckDB twin of _BIGRAMS
        bigram_branch = f"""
    UNION ALL
    SELECT doc_id,
           CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END AS y,
           {_bucket_sql("u.tok")} + {D} AS bucket
    FROM (SELECT doc_id, source,
                 CASE WHEN len({TOKENS_SQL}) >= 2 THEN
                   list_transform(generate_series(1, len({TOKENS_SQL}) - 1),
                                  i -> ({TOKENS_SQL})[i] || ' ' || ({TOKENS_SQL})[i + 1])
                 ELSE [] END AS t
          FROM documents),
         UNNEST(t) AS u(tok)"""
    parts = [
        f"""hits AS MATERIALIZED (
  SELECT doc_id, y, bucket, COUNT(*) AS x FROM (
    SELECT doc_id,
           CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END AS y,
           {_bucket_sql("u.tok")} AS bucket
    FROM (SELECT doc_id, source, {TOKENS_SQL} AS t FROM documents),
         UNNEST(t) AS u(tok){bigram_branch}
  ) GROUP BY 1, 2, 3
  UNION ALL
  SELECT doc_id, CASE WHEN source = '{TARGET_SOURCE}' THEN 1 ELSE 0 END, {dim}, 1
  FROM documents
),
n AS (SELECT COUNT(*) AS n FROM documents),
w0 AS MATERIALIZED (SELECT u.b AS bucket, 0.0::DOUBLE AS w
       FROM UNNEST(generate_series(0, {dim})) AS u(b))"""
    ]
    for i in range(iters):
        parts.append(f"""z{i} AS (
  SELECT h.doc_id, h.y,
         CAST(SUM({_dec_sql("w.w * h.x")}) AS DOUBLE) AS z
  FROM hits h JOIN w{i} w USING (bucket) GROUP BY 1, 2
),
e{i} AS (
  SELECT doc_id,
         (0.5 + z / (2.0 * (1.0 + abs(z)))) - CAST(y AS DOUBLE) AS err
  FROM z{i}
),
g{i} AS (
  SELECT h.bucket, CAST(SUM({_dec_sql("e.err * h.x")}) AS DOUBLE) AS g
  FROM hits h JOIN e{i} e USING (doc_id) GROUP BY 1
),
w{i + 1} AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: w{i} is referenced by both z{i} and
  -- this CTE; DuckDB inlines multiply-referenced CTEs, which would
  -- recompute the whole chain 2^T times (see functions/canonical.py
  -- cluster-oracle note).
  SELECT w.bucket, w.w - {lr} * (COALESCE(g.g, 0.0) / CAST(n.n AS DOUBLE)) AS w
  FROM w{i} w LEFT JOIN g{i} g USING (bucket) CROSS JOIN n
)""")
    return ",\n".join(parts)


def train_weights_sql(
    iters: int = ITERS, lr: float = LR, bigrams: bool = False
) -> str:
    return f"""
WITH {_train_ctes(iters, lr, bigrams)}
SELECT bucket, CAST({stable_round_sql("w", 6)} AS DOUBLE) AS weight
FROM w{iters}
ORDER BY bucket
"""


def score_topk_sql(
    iters: int = ITERS, lr: float = LR, k: int = 20, bigrams: bool = False
) -> str:
    return f"""
WITH {_train_ctes(iters, lr, bigrams)},
sc AS (
  SELECT h.doc_id, h.y,
         CAST(SUM({_dec_sql("w.w * h.x")}) AS DOUBLE) AS s
  FROM hits h JOIN (
    SELECT bucket, CAST({stable_round_sql("w", 6)} AS DOUBLE) AS w FROM w{iters}
  ) w USING (bucket)
  GROUP BY 1, 2
)
SELECT doc_id, y, CAST({stable_round_sql("s", 6)} AS DOUBLE) AS score
FROM sc
ORDER BY score DESC, doc_id
LIMIT {k}
"""
