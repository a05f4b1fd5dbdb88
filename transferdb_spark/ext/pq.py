"""Product-quantization ANN over the `embeddings` table — PQ (Jégou
et al. 2011, "Product Quantization for Nearest Neighbor Search",
public literature): split each vector into M subspaces, k-means each
subspace into KC codes, store each vector as M one-byte codes, and
answer
queries with asymmetric distance computation (ADC) — a per-query
lookup table of query-subvector↔codeword distances summed by table
lookup per stored code.

Completes the engine's ANN triad: hyperplane LSH (recall via bucket
probing), IVF (recall via cell routing), and PQ (memory-bandwidth
compression: 64 float64 dims → M small ints per vector, so a 100 TB
embedding corpus scans as ~1.6 TB of codes).

Spark-first plan shape (the 100 TB case):
- TRAINING runs all M subspaces in ONE pass per Lloyd round: a single
  Arrow UDF assigns every subvector to its nearest codeword (the
  codebook — M×KC×SUBDIM int64s — ships in the task closure), then a
  posexplode + groupBy(m, cluster, dim) with map-side combine
  collapses the update to M·KC·SUBDIM rows per task before the
  exchange; the driver collects exactly M·KC·SUBDIM integers per
  round. Subspace count multiplies nothing but the (tiny) codebook.
- ENCODING is a stateless narrow Arrow pass: (vec_id, codes[M]).
- ADC SCORING is pure built-in expressions: the per-query lookup
  table (M·KC int64s) is a LITERAL nested array, so the scan is
  project + aggregate-expression + TakeOrderedAndProject — no join,
  no shuffle, whole-stage codegen end to end.

Numeric contract (engine-exact, same scheme as ext/semdedup.py):
elements quantize to floor(x·2^20 + 0.5) int64; distances use
argmin‖x−c‖² = argmin(‖c‖² − 2x·c) in exact integer arithmetic;
centroid updates are floor integer division; ties break to the lowest
code id (numpy argmin-first == ROW_NUMBER tie-break). |q|≤2^20,
SUBDIM=16 → per-subspace scores ≤ 2^45; the M-term ADC sum ≤ 2^47 —
int64-exact everywhere, so Spark and the DuckDB oracle agree bit for
bit.

Reference parity: no reference analogue — LLM-data-pipeline surface
(brief: similarity search, IVF/LSH-bucketed scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from transferdb_spark.ext.semdedup import _XQ, _floordiv
from transferdb_spark.ext.similarity import DIM, QSCALE, _qmat

M = 4  # subspaces
SUBDIM = DIM // M  # dims per subspace
KC = 16  # codewords per subspace (production: 256 → 1 byte/code)
ITERS = 2  # fixed Lloyd rounds — the oracle unrolls them
QID = 0  # benchmark query vector (same convention as similarity_topk)
TOPK = 10

_ARR_INT = ArrayType(IntegerType())


def _init_codebook(emb: DataFrame) -> np.ndarray:
    """(M, KC, SUBDIM) int64 seed: subvectors of the first KC stored
    vectors — deterministic, no RNG, so the DuckDB oracle replays
    training exactly (same tradeoff as semdedup/IVF seeding)."""
    rows = (
        emb.filter(F.col("vec_id") < KC)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    if len(rows) < KC:
        raise ValueError(f"need at least {KC} vectors to seed {KC} codes")
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * QSCALE + 0.5
    ).astype(np.int64)
    return np.stack([X[:, m * SUBDIM : (m + 1) * SUBDIM] for m in range(M)])


def _encode_udf(codebook: np.ndarray):
    """codes[M] per vector — nearest codeword per subspace, exact
    integer argmin, first-minimum tie-break."""
    C = np.asarray(codebook, dtype=np.int64)  # (M, KC, SUBDIM)
    CN2 = (C * C).sum(axis=2)  # (M, KC)

    @pandas_udf(_ARR_INT)
    def encode(e: pd.Series) -> pd.Series:
        X = _qmat(e)
        if X.shape[0] == 0:
            return pd.Series([], dtype=object)
        Xs = X.reshape(X.shape[0], M, SUBDIM)
        codes = np.empty((X.shape[0], M), dtype=np.int32)
        for m in range(M):
            S = CN2[m][None, :] - 2 * (Xs[:, m, :] @ C[m].T)
            codes[:, m] = np.argmin(S, axis=1)
        return pd.Series(list(codes))

    return encode


def train_codebook(emb: DataFrame, iters: int = ITERS) -> np.ndarray:
    """Fixed-round Lloyd over every subspace simultaneously.

    Per round: one narrow Arrow pass emits (codes[M], q[DIM]); a
    posexplode keyed by (m = dim div SUBDIM, cluster = codes[m],
    dim % SUBDIM) feeds a partially-aggregated groupBy; the driver
    collects M·KC·SUBDIM sums and floor-divides. Empty codes keep
    their previous centroid."""
    from pyspark.sql.types import LongType, StructField, StructType

    cb = _init_codebook(emb)
    out_t = StructType(
        [
            StructField("codes", _ARR_INT),
            StructField("q", ArrayType(LongType())),
        ]
    )
    for _ in range(iters):
        C = np.asarray(cb, dtype=np.int64)
        CN2 = (C * C).sum(axis=2)

        @pandas_udf(out_t)
        def assign_q(e: pd.Series) -> pd.DataFrame:
            X = _qmat(e)
            if X.shape[0] == 0:
                return pd.DataFrame({"codes": [], "q": []})
            Xs = X.reshape(X.shape[0], M, SUBDIM)
            codes = np.empty((X.shape[0], M), dtype=np.int32)
            for m in range(M):
                S = CN2[m][None, :] - 2 * (Xs[:, m, :] @ C[m].T)
                codes[:, m] = np.argmin(S, axis=1)
            return pd.DataFrame({"codes": list(codes), "q": list(X)})

        sums = (
            emb.select(assign_q(F.col("embedding")).alias("a"))
            .select(F.col("a.codes").alias("codes"), F.posexplode("a.q").alias("d", "v"))
            .select(
                F.expr(f"d div {SUBDIM}").cast("int").alias("m"),
                F.expr(f"element_at(codes, CAST(d div {SUBDIM} AS INT) + 1)").alias(
                    "cluster"
                ),
                F.pmod("d", F.lit(SUBDIM)).alias("dim"),
                "v",
            )
            .groupBy("m", "cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = C.copy()
        for r in sums:
            nxt[r["m"], r["cluster"], r["dim"]] = r["s"] // r["n"]
        cb = nxt
    return cb


def encode_vectors(emb: DataFrame, codebook: np.ndarray) -> DataFrame:
    """vec_id, codes[M] — the compressed representation (narrow)."""
    return emb.select(
        "vec_id", _encode_udf(codebook)(F.col("embedding")).alias("codes")
    )


def pq_codes_histogram(emb: DataFrame, iters: int = ITERS) -> DataFrame:
    """(m, code, n_vectors) — codeword occupancy per subspace, the
    balance diagnostic for codebook quality (a dead codeword wastes
    1/KC of that subspace's representational budget)."""
    cb = train_codebook(emb, iters)
    # the posexplode's implicit (size > 0 AND isnotnull) filter gets
    # pushed below the projection and DUPLICATES the encode UDF —
    # every vector encoded twice (two ArrowEvalPython nodes in the
    # round-10 before-plan). Marking this call's UDF nondeterministic
    # (guide §4.4) pins a single evaluation; the object is built fresh
    # per call, so no shared UDF is mutated. vec_id is dropped from
    # the scan — the histogram never reads it.
    enc = emb.select(
        _encode_udf(cb).asNondeterministic()(F.col("embedding")).alias("codes")
    )
    return (
        enc.select(F.posexplode("codes").alias("m", "code"))
        .groupBy("m", "code")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("m", "code")
    )


def pq_topk_adc(
    emb: DataFrame, query_vec_id: int = QID, k: int = TOPK, iters: int = ITERS
) -> DataFrame:
    """Top-k approximate neighbours of a stored vector by ADC.

    The per-query lookup table lut[m][c] = ‖c_mc‖² − 2·q_m·c_mc is
    M·KC integers built on the driver (one collected query row — a
    scalar, not row data) and inlined as a nested array literal, so
    scoring is a pure expression over the codes column: no join, no
    Python, TakeOrderedAndProject for the top-k."""
    cb = train_codebook(emb, iters)
    qrow = emb.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
    if not qrow:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = np.floor(
        np.array(qrow[0]["embedding"], dtype=np.float64) * QSCALE + 0.5
    ).astype(np.int64)
    C = np.asarray(cb, dtype=np.int64)
    lut = (C * C).sum(axis=2) - 2 * np.einsum(
        "mkd,md->mk", C, q.reshape(M, SUBDIM)
    )  # (M, KC) int64-exact

    lut_lit = F.array(
        *[F.array(*[F.lit(int(v)) for v in row]) for row in lut.tolist()]
    )
    enc = encode_vectors(emb, cb).filter(F.col("vec_id") != query_vec_id)
    score = F.aggregate(
        F.zip_with(
            lut_lit,
            "codes",
            lambda row, c: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        enc.select("vec_id", score.alias("adc"))
        .orderBy(F.asc("adc"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — unrolled fixed-round per-subspace k-means over the
# SAME integer contract (the semdedup precedent, with (m, cluster) as
# the composite codeword key).


def _pq_ctes(iters: int) -> str:
    """CTE chain ending in `aF` = (vec_id, m, cluster) final codes,
    with `sub` = (vec_id, m, sq) available."""
    parts = [
        f"eq AS MATERIALIZED (SELECT vec_id, {_XQ} AS xq FROM embeddings)",
        f"""sub AS MATERIALIZED (
  SELECT e.vec_id, g.i - 1 AS m,
         list_slice(e.xq, (g.i - 1) * {SUBDIM} + 1, g.i * {SUBDIM}) AS sq
  FROM eq e, UNNEST(generate_series(1, {M})) g(i)
)""",
        f"c0 AS (SELECT m, CAST(vec_id AS INT) AS cluster, sq AS q FROM sub WHERE vec_id < {KC})",
    ]

    def assign(name: str, prev: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, m, cluster FROM (
    SELECT d.vec_id, d.m, d.cluster,
           row_number() OVER (PARTITION BY d.vec_id, d.m
                              ORDER BY d.cn2 - 2 * d.dot ASC, d.cluster) AS rn
    FROM (
      SELECT s.vec_id, s.m, c.cluster,
             SUM(s.sq[g.i] * c.q[g.i]) AS dot,
             MIN(cn.n2c) AS cn2
      FROM sub s JOIN {prev} c ON c.m = s.m
      JOIN (SELECT m, cluster, SUM(q[g2.i] * q[g2.i]) AS n2c
            FROM {prev}, UNNEST(generate_series(1, {SUBDIM})) g2(i)
            GROUP BY m, cluster) cn ON cn.m = c.m AND cn.cluster = c.cluster,
      UNNEST(generate_series(1, {SUBDIM})) g(i)
      GROUP BY s.vec_id, s.m, c.cluster
    ) d
  ) WHERE rn = 1
)"""

    prev = "c0"
    for it in range(iters):
        a, s, c = f"a{it}", f"s{it}", f"c{it + 1}"
        parts.append(assign(a, prev))
        parts.append(
            f"""{s} AS (
  SELECT a.m, a.cluster, g.i AS dim,
         SUM(s.sq[g.i]) AS s, COUNT(*) AS n
  FROM sub s JOIN {a} a ON a.vec_id = s.vec_id AND a.m = s.m,
       UNNEST(generate_series(1, {SUBDIM})) g(i)
  GROUP BY a.m, a.cluster, g.i
)"""
        )
        parts.append(
            f"""{c} AS (
  SELECT p.m, p.cluster, COALESCE(u.q, p.q) AS q
  FROM {prev} p LEFT JOIN (
    SELECT m, cluster,
           list(CAST({_floordiv('s', 'n')} AS BIGINT) ORDER BY dim) AS q
    FROM {s} GROUP BY m, cluster
  ) u ON u.m = p.m AND u.cluster = p.cluster
)"""
        )
        prev = c
    parts.append(assign("aF", prev))
    parts.append(f"cF AS (SELECT * FROM {prev})")
    return ",\n".join(parts)


def pq_codes_histogram_sql(iters: int = ITERS) -> str:
    return f"""
WITH {_pq_ctes(iters)}
SELECT CAST(m AS INT) AS m, CAST(cluster AS INT) AS code,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM aF
GROUP BY m, cluster
ORDER BY m, code
"""


def pq_topk_adc_sql(query_vec_id: int = QID, k: int = TOPK, iters: int = ITERS) -> str:
    return f"""
WITH {_pq_ctes(iters)},
lut AS (
  SELECT c.m, c.cluster,
         SUM(c.q[g.i] * c.q[g.i] - 2 * q.sq[g.i] * c.q[g.i]) AS v
  FROM cF c JOIN sub q ON q.vec_id = {query_vec_id} AND q.m = c.m,
       UNNEST(generate_series(1, {SUBDIM})) g(i)
  GROUP BY c.m, c.cluster
)
SELECT a.vec_id, CAST(SUM(l.v) AS BIGINT) AS adc
FROM aF a JOIN lut l ON l.m = a.m AND l.cluster = a.cluster
WHERE a.vec_id <> {query_vec_id}
GROUP BY a.vec_id
ORDER BY adc ASC, a.vec_id
LIMIT {k}
"""
