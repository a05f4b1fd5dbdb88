"""`search` CLI mode — corpus retrieval over the documents table.

Engine-depth the reference has no analogue for: BM25 lexical search
(ext/retrieval.py) with an optional hybrid re-rank by embedding cosine
when an embeddings table sits beside the documents. Results return as
a JSON summary (driver rows are k model-sized records, never corpus
data) and optionally land as parquet under the workdir for downstream
joins."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def search_corpus(
    spark: SparkSession,
    source_dir: str,
    terms: list[str],
    k: int = 10,
    hybrid: bool = False,
    rm3: bool = False,
    query_vec_id: int = 0,
    workdir: str | None = None,
) -> dict:
    from transferdb_spark.ext.retrieval import (
        bm25_topk,
        hybrid_search_topk,
        rm3_bm25_topk,
        rm3_expansion_terms,
    )
    from transferdb_spark.sources.registry import load_table

    if not terms:
        raise SystemExit("search mode requires --terms (comma-separated)")
    if hybrid and rm3:
        raise SystemExit("--hybrid and --rm3 are mutually exclusive")
    docs = load_table(spark, source_dir, "documents")
    expanded: list[str] = []
    if hybrid:
        emb = load_table(spark, source_dir, "embeddings")
        df = hybrid_search_topk(
            docs, emb, tuple(terms), query_vec_id=query_vec_id, k=k
        )
    elif rm3:
        expanded = rm3_expansion_terms(docs, tuple(terms))
        df = rm3_bm25_topk(docs, tuple(terms), k=k)
    else:
        df = bm25_topk(docs, tuple(terms), k=k)
    rows = [r.asDict() for r in df.collect()]  # k rows: model-sized
    out: dict = {
        "mode": "search",
        "terms": terms,
        "k": k,
        "hybrid": hybrid,
        "rm3": rm3,
        "expanded_terms": expanded,
        "hits": len(rows),
        "results": rows,
    }
    if workdir:
        dest = os.path.join(workdir, "search_results")
        df.write.mode("overwrite").parquet(dest)
        out["results_path"] = dest
    return out
