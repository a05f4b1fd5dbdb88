"""Similarity search over the `embeddings` table (array<float>, d=64).

Baseline: brute-force cosine top-k — one narrow pass when the query is
a broadcast row. Scale path: hyperplane-LSH bucketing — deterministic
pseudo-random planes derived from the portable hash so buckets (and the
DuckDB oracle) are reproducible; candidate generation is a bucket-equi
join instead of an O(n²) cross.

Dot products run as JVM array expressions (zip_with + aggregate) in
DOUBLE with left-to-right summation — the DuckDB twin sums in the same
order, so rounded scores match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
# 4 planes = 16 buckets: sized so local-test buckets hold enough
# candidates for top-k; at production scale raise planes (buckets ≈ 2^p)
# to keep per-bucket candidate counts bounded.
N_PLANES = 4
ROUND = 5

# --- cosine as expression (Spark + DuckDB dialects) ---

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
    "cast(0 as double), (acc, v) -> acc + v))"
)

DOT_SQL = "list_sum(list_transform(range(len({a})), i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
NORM_SQL = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def cosine_expr(a: str, b: str):
    return F.expr(
        f"round({DOT.format(a=a, b=b)} / ({NORM.format(a=a)} * {NORM.format(a=b)}), {ROUND})"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"round({DOT_SQL.format(a=a, b=b)} / ({NORM_SQL.format(a=a)} * {NORM_SQL.format(a=b)}), {ROUND})"
    )


def embedding_norms(emb: DataFrame) -> DataFrame:
    """vec_id, l2_norm — cheap sanity operator over the vector column."""
    return emb.select(
        "vec_id", F.expr(f"round({NORM.format(a='embedding')}, {ROUND})").alias("l2_norm")
    )


EMBEDDING_NORMS_SQL = f"""
SELECT vec_id, CAST(round({NORM_SQL.format(a='embedding')}, {ROUND}) AS DOUBLE) AS l2_norm
FROM embeddings
"""


def topk_bruteforce(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Top-k cosine neighbours of one stored vector (excluding itself).

    The query row is broadcast — the scan stays a single narrow pass;
    ordering ties break on vec_id for determinism."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            cosine_expr("embedding", "qvec").cast("double").alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def topk_bruteforce_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id, CAST({cosine_sql('embedding', 'qvec')} AS DOUBLE) AS cosine
FROM embeddings, q
WHERE vec_id <> {query_vec_id}
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


# --- hyperplane LSH ---
# plane(i, j) ∈ {-1, +1} from the parity of the portable hash of "i,j":
# deterministic, no stored plane matrix, reproducible in SQL.

_PLANE = "(1 - 2 * (cast(conv(substr(md5(concat(cast({i} as string), ',', cast(j as string))), 1, 10), 16, 10) as bigint) % 2))"


def _bucket_expr() -> str:
    """Spark SQL: LSH bucket id = Σ bit_i · 2^i over N_PLANES sign bits."""
    bits = []
    for i in range(N_PLANES):
        dot = (
            f"aggregate(sequence(0, {DIM - 1}), cast(0 as double), "
            f"(acc, j) -> acc + cast(element_at(embedding, j + 1) as double) * {_PLANE.format(i=i)})"
        )
        bits.append(f"(case when {dot} >= 0 then {1 << i} else 0 end)")
    return " + ".join(bits)


def _bucket_sql() -> str:
    bits = []
    for i in range(N_PLANES):
        plane = f"(1 - 2 * (CAST(('0x' || substr(md5('{i}' || ',' || j), 1, 10)) AS BIGINT) % 2))"
        dot = (
            f"list_sum(list_transform(range({DIM}), "
            f"j -> CAST(embedding[j + 1] AS DOUBLE) * {plane}))"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(bits)


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """vec_id, bucket — one narrow pass, no shuffle."""
    return emb.select("vec_id", F.expr(_bucket_expr()).cast("int").alias("bucket"))


def lsh_bucket_histogram(emb: DataFrame) -> DataFrame:
    """Bucket occupancy — the health check for the LSH index."""
    return (
        lsh_buckets(emb).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).orderBy("bucket")
    )


def lsh_bucket_histogram_sql() -> str:
    return f"""
SELECT CAST(({_bucket_sql()}) AS INT) AS bucket, COUNT(*) AS cnt
FROM embeddings
GROUP BY 1 ORDER BY 1
"""


def ann_topk_lsh(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """ANN top-k: exact cosine *within the query's LSH bucket* only.

    The bucket join replaces the full scan — at 100 TB with B buckets
    the candidate set is ~n/B; recall is tuned by N_PLANES (and can be
    extended to multi-probe by unioning neighbouring buckets)."""
    b = lsh_buckets(emb)
    with_b = emb.join(b, "vec_id")
    q = with_b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    return (
        with_b.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", cosine_expr("embedding", "qvec").cast("double").alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def ann_topk_lsh_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH b AS (SELECT vec_id, embedding, CAST(({_bucket_sql()}) AS INT) AS bucket FROM embeddings),
q AS (SELECT embedding AS qvec, bucket AS qbucket FROM b WHERE vec_id = {query_vec_id})
SELECT vec_id, CAST({cosine_sql('embedding', 'qvec')} AS DOUBLE) AS cosine
FROM b, q
WHERE bucket = qbucket AND vec_id <> {query_vec_id}
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH prefilter:
    pairs sharing a bucket, kept when exact cosine ≥ threshold.

    Norms are computed once per vector before the pair join — the
    per-pair work is a single dot product (the pair count, not the
    vector count, dominates at scale)."""
    b = lsh_buckets(emb)
    with_b = emb.join(b, "vec_id").withColumn(
        "nrm", F.expr(NORM.format(a="embedding"))
    )
    a, c = with_b.alias("a"), with_b.alias("b")
    dot = F.expr(DOT.format(a="a.embedding", b="b.embedding"))
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), ROUND)
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.cast("double").alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_sql(threshold: float = 0.95) -> str:
    dot = DOT_SQL.format(a="x.embedding", b="y.embedding")
    return f"""
WITH bk AS (SELECT vec_id, embedding, CAST(({_bucket_sql()}) AS INT) AS bucket,
                   {NORM_SQL.format(a='embedding')} AS nrm
            FROM embeddings)
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       CAST(round({dot} / (x.nrm * y.nrm), {ROUND}) AS DOUBLE) AS cosine
FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round({dot} / (x.nrm * y.nrm), {ROUND}) >= {threshold}
"""
