"""Lexical retrieval over the documents table: distributed BM25 top-k.

The LLM-pipeline counterpart to the embedding ANN stack in
ext/similarity.py — keyword retrieval for decontamination lookups,
targeted corpus probes ("find training docs about X"), and hybrid
(lexical + vector) dedup candidates. The reference engine has no text
retrieval; this is engine-depth beyond its surface, built Spark-first.

Scale design (100 TB):
- Postings are built per-row with an ARRAY filter BEFORE explode, so
  only query-term hits leave the scan — the shuffle is bounded by the
  query's posting lists, never the corpus. Document length rides along
  from the same row; no join back to a full-corpus length relation.
- tf aggregation keys on (doc_id, term): doc_id is high-cardinality,
  so a stopword-ish query term produces a large but UNSKEWED partial
  aggregation (map-side combine collapses per-doc duplicates first).
- Corpus scalars (N, total token count) are one broadcast row; per-term
  document frequencies are |q| rows, broadcast-joined.
- Top-k compiles to TakeOrderedAndProject (no global sort).

Cross-engine exactness (the oracle gate hash-compares values): ln() is
the only non-correctly-rounded operation, so — same discipline as
ext/dsir.py — idf is quantized ONCE to BIGINT micro-units right at the
ln boundary. Every other step (integer tf/dl/df, IEEE divides and
multiplies written in the same expression shape on both engines,
stable_round → DECIMAL(18,6) before the order-sensitive SUM) is
bit-deterministic across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from transferdb_spark.functions.canonical import stable_round, stable_round_sql

# default query: three common terms + one rare ('dup') so the idf term
# visibly reorders results vs raw tf
DEFAULT_QUERY = ("spark", "window", "merge", "dup")
K1 = 1.2
B = 0.75
IDF_SCALE = 1_000_000


def _tokens(docs: DataFrame) -> DataFrame:
    # identical tokenization to ext/text.py TOKENS_SQL
    return docs.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )


def _idf_micro(n_docs: Column, df: Column) -> Column:
    """Lucene-style BM25 idf ln(1 + (N-df+0.5)/(df+0.5)), quantized to
    BIGINT micro-units at the ln boundary (see module docstring)."""
    raw = F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
    )
    return F.floor(raw * F.lit(float(IDF_SCALE)) + F.lit(0.5)).cast("long")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25(k1=1.2, b=0.75) for a bag of query terms.

    Returns (doc_id, n_terms, score) ordered by score DESC, doc_id —
    the doc_id tiebreak makes the LIMIT boundary deterministic."""
    terms = list(dict.fromkeys(query_terms))
    toks = _tokens(docs)

    # corpus scalars: one row, broadcast via the 1-row cross join
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("sum_dl"),
    )

    term_set = F.array(*[F.lit(w) for w in terms])
    hits = toks.select(
        "doc_id",
        F.size("t").alias("dl"),
        F.explode(
            F.filter("t", lambda x: F.array_contains(term_set, x))
        ).alias("term"),
    )
    tf = hits.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_micro", _idf_micro(F.col("n_docs"), F.col("df")))
        .withColumn(
            "w",
            (F.col("tf").cast("double") * F.lit(K1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(K1)
                * (
                    F.lit(1.0 - B)
                    + F.lit(B)
                    * (
                        F.col("dl").cast("double")
                        / (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"))
                    )
                )
            ),
        )
        .withColumn(
            "contrib",
            stable_round(
                F.col("idf_micro").cast("double") * F.col("w") / F.lit(float(IDF_SCALE)),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum("contrib").cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def bm25_topk_sql(query_terms: tuple[str, ...] = DEFAULT_QUERY, k: int = 20) -> str:
    """DuckDB oracle twin of bm25_topk (same expression shapes)."""
    terms = list(dict.fromkeys(query_terms))
    in_list = ", ".join(f"'{w}'" for w in terms)
    w_expr = (
        f"(CAST(tf AS DOUBLE) * {K1 + 1.0}) / "
        f"(CAST(tf AS DOUBLE) + {K1} * ({1.0 - B} + {B} * "
        f"(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    )
    idf_expr = (
        "CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        f" / (CAST(df AS DOUBLE) + 0.5)) * {float(IDF_SCALE)} + 0.5) AS BIGINT)"
    )
    contrib = stable_round_sql(
        f"CAST({idf_expr} AS DOUBLE) * {w_expr} / {float(IDF_SCALE)}", 6
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(len(t)) AS sum_dl FROM toks),
hits AS (
  SELECT doc_id, len(t) AS dl, u.tok AS term
  FROM toks, UNNEST(list_filter(t, x -> x IN ({in_list}))) AS u(tok)
),
tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_terms,
       CAST(SUM(CAST({contrib} AS DECIMAL(18,6))) AS DOUBLE) AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def hybrid_search_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    n_candidates: int = 50,
    k: int = 10,
) -> DataFrame:
    """Hybrid retrieval: lexical recall, semantic precision.

    Stage 1 takes the BM25 top-N as a candidate set (cheap, posting-
    list-bounded); stage 2 re-ranks the N survivors by embedding cosine
    to the query vector. Only N rows ever touch the vector kernel — at
    100 TB the candidate stage is what scales (or swaps for the LSH/IVF
    ANN index in ext/similarity.py), while the re-rank is a broadcast
    join over a model-sized set. Returns (doc_id, bm25, cosine) ordered
    by cosine DESC, doc_id."""
    from transferdb_spark.ext.similarity import cosine_expr

    cands = bm25_topk(docs, query_terms, k=n_candidates).where(
        F.col("doc_id") != query_vec_id
    )
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    return (
        emb.join(F.broadcast(cands), emb["vec_id"] == cands["doc_id"])
        .join(F.broadcast(q))
        .select(
            "doc_id",
            F.col("score").alias("bm25"),
            cosine_expr("embedding", "qvec").cast("double").alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(k)
    )


def hybrid_search_topk_sql(
    query_terms: tuple[str, ...] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    n_candidates: int = 50,
    k: int = 10,
) -> str:
    from transferdb_spark.ext.similarity import cosine_sql

    return f"""
WITH bm AS MATERIALIZED (
  SELECT * FROM ({bm25_topk_sql(query_terms, n_candidates)}) WHERE doc_id <> {query_vec_id}
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_vec_id})
SELECT bm.doc_id,
       bm.score AS bm25,
       CAST({cosine_sql('e.embedding', 'qvec')} AS DOUBLE) AS cosine
FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id CROSS JOIN q
ORDER BY cosine DESC, doc_id
LIMIT {k}
"""


def _phrase_count_expr(m: int, eqs: str) -> str:
    """Row-local phrase occurrence count over token array `t` — an
    array expression, so phrase matching never shuffles positions:
    count of i where toks[i..i+m-1] == phrase. Guarded for docs shorter
    than the phrase (Spark's sequence(1, 0) DESCENDS; DuckDB's
    generate_series(1, 0) is empty — the CASE keeps both at 0)."""
    return (
        f"CASE WHEN size(t) >= {m} THEN "
        f"size(filter(sequence(1, size(t) - {m - 1}), i -> {eqs})) "
        "ELSE 0 END"
    )


def bm25_phrase_topk(
    docs: DataFrame,
    phrase: tuple[str, ...] = ("table", "scan"),
    k: int = 20,
) -> DataFrame:
    """Exact-phrase retrieval: the phrase scores as ONE BM25 term whose
    tf is the row-local occurrence count (consecutive-token match) —
    positional matching costs zero shuffle; only docs containing the
    phrase reach the df aggregation and the ordered take.

    Returns (doc_id, tf, score) ordered by score DESC, doc_id."""
    m = len(phrase)
    eqs = " AND ".join(
        f"element_at(t, i + {j}) = '{w}'" for j, w in enumerate(phrase)
    )
    toks = _tokens(docs)
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("sum_dl"),
    )
    hits = toks.select(
        "doc_id",
        F.size("t").alias("dl"),
        F.expr(_phrase_count_expr(m, eqs)).alias("tf"),
    ).where(F.col("tf") > 0)
    dfreq = hits.agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.crossJoin(F.broadcast(dfreq))
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_micro", _idf_micro(F.col("n_docs"), F.col("df")))
        .withColumn(
            "w",
            (F.col("tf").cast("double") * F.lit(K1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(K1)
                * (
                    F.lit(1.0 - B)
                    + F.lit(B)
                    * (
                        F.col("dl").cast("double")
                        / (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"))
                    )
                )
            ),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("tf").cast("int").alias("tf"),
            stable_round(
                F.col("idf_micro").cast("double") * F.col("w") / F.lit(float(IDF_SCALE)),
                6,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def bm25_phrase_topk_sql(
    phrase: tuple[str, ...] = ("table", "scan"), k: int = 20
) -> str:
    m = len(phrase)
    eqs = " AND ".join(f"t[i + {j}] = '{w}'" for j, w in enumerate(phrase))
    count_expr = (
        f"CASE WHEN len(t) >= {m} THEN "
        f"len(list_filter(generate_series(1, len(t) - {m - 1}), i -> {eqs})) "
        "ELSE 0 END"
    )
    w_expr = (
        f"(CAST(tf AS DOUBLE) * {K1 + 1.0}) / "
        f"(CAST(tf AS DOUBLE) + {K1} * ({1.0 - B} + {B} * "
        f"(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    )
    idf_expr = (
        "CAST(floor(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        f" / (CAST(df AS DOUBLE) + 0.5)) * {float(IDF_SCALE)} + 0.5) AS BIGINT)"
    )
    score = stable_round_sql(
        f"CAST({idf_expr} AS DOUBLE) * {w_expr} / {float(IDF_SCALE)}", 6
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(len(t)) AS sum_dl FROM toks),
hits AS (
  SELECT doc_id, len(t) AS dl, {count_expr} AS tf
  FROM toks
),
ph AS (SELECT * FROM hits WHERE tf > 0),
dfreq AS (SELECT COUNT(*) AS df FROM ph)
SELECT doc_id, CAST(tf AS INT) AS tf, CAST({score} AS DOUBLE) AS score
FROM ph CROSS JOIN dfreq CROSS JOIN stats
ORDER BY score DESC, doc_id
LIMIT {k}
"""
