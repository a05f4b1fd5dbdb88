"""Auto-tuned ANN index construction over the `embeddings` table.

The raw operators in ext/similarity.py pin test-scale constants
(N_PLANES=4, N_CELLS=16) so their DuckDB oracle twins stay literal.
This module is the production entry point: it SAMPLES THE CORPUS SIZE
FIRST, then sizes the index from it —

- LSH: recommended_planes(n) bounds expected bucket occupancy, and
  recommended_probes(n, planes, k) picks how many Hamming-1 neighbour
  buckets a query must union to keep the candidate pool at
  ~oversample×k rows (more planes → smaller buckets → more probes).
- IVF: recommended_cells(n) bounds per-cell candidate work the same
  way.

Multi-probe here is MARGIN-RANKED (the standard multi-probe LSH
refinement): the flip order is the query's |signed dot| per plane,
ascending — the planes the query sits closest to are the ones most
likely to have split true neighbours away, so they are probed first.

At 100 TB: the only driver-side work is one count() (metadata-only for
parquet) and one query-row collect; index assignment stays a narrow
Arrow pass, and the probe set is a literal IN filter the scan prunes
on.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferdb_spark.ext.similarity import (
    N_PLANES,
    ROUND,
    _pivot_matrix,
    _quantize,
    _signs,
    cosine_expr,
    ivf_assign,
    make_bucket_udf,
    recommended_cells,
    recommended_planes,
    topk_bruteforce,
)


@dataclass(frozen=True)
class AnnIndexSpec:
    """The tuned shape of one ANN index build."""

    kind: str  # "lsh" | "ivf"
    n_rows: int
    n_planes: int = 0  # lsh
    n_cells: int = 0  # ivf
    n_probe: int = 1


def recommended_probes(
    n_rows: int, n_planes: int, k: int = 10, oversample: int = 50
) -> int:
    """Probe count that keeps the expected candidate pool at
    ~oversample×k rows: probes · n/2^p ≥ k·oversample, clamped to
    [1, 1 + n_planes] (the exact bucket plus every Hamming-1 flip).
    With recommended_planes' occupancy target this lands at 1-2 probes;
    raising planes beyond it (smaller buckets) buys probes back."""
    if n_rows <= 0:
        return 1
    expected_bucket = max(1.0, n_rows / float(1 << n_planes))
    return max(1, min(1 + n_planes, math.ceil(k * oversample / expected_bucket)))


def build_lsh_index(
    emb: DataFrame,
    k: int = 10,
    target_bucket_rows: int = 4096,
    oversample: int = 50,
) -> tuple[DataFrame, AnnIndexSpec]:
    """(bucketed relation, spec): samples |corpus| once, sizes planes
    and probe count from it, and returns the vec_id/embedding/bucket
    relation ready for candidate joins. The bucketed relation is what
    production would persist (partitioned by bucket) as the index."""
    n = emb.count()
    planes = recommended_planes(n, target_bucket_rows)
    probes = recommended_probes(n, planes, k, oversample)
    indexed = emb.select(
        "vec_id",
        "embedding",
        make_bucket_udf(planes)(F.col("embedding")).alias("bucket"),
    )
    return indexed, AnnIndexSpec("lsh", n_rows=n, n_planes=planes, n_probe=probes)


def build_ivf_index(
    emb: DataFrame, target_cell_rows: int = 4096, n_probe: int = 4
) -> tuple[DataFrame, AnnIndexSpec]:
    """(cell-assigned relation, spec) — IVF twin of build_lsh_index."""
    n = emb.count()
    cells = recommended_cells(n, target_cell_rows, n_probe)
    pivots = _pivot_matrix(emb, min(cells, n))
    indexed = ivf_assign(emb, pivots)
    return indexed, AnnIndexSpec("ivf", n_rows=n, n_cells=cells, n_probe=n_probe)


def query_probe_buckets(
    emb: DataFrame, query_vec_id: int, n_planes: int, n_probe: int
) -> list[int]:
    """The query's bucket plus its margin-ranked Hamming-1 flips.

    One driver-side collect of the query row; the flip order is the
    per-plane |signed integer dot| ascending — smallest margin first."""
    row = emb.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
    if not row:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = _quantize(np.array([row[0]["embedding"]], dtype=np.float64))[0]
    signs = _signs(n_planes).astype(np.int64)
    dots = signs @ q  # (n_planes,) exact int64
    base = int(sum((1 << i) for i in range(n_planes) if dots[i] >= 0))
    flip_order = np.argsort(np.abs(dots), kind="stable")
    out = [base]
    for i in flip_order[: max(0, n_probe - 1)]:
        out.append(base ^ (1 << int(i)))
    return out


def ann_topk_indexed(
    indexed: DataFrame, spec: AnnIndexSpec, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k over a built index: exact cosine within the probed
    buckets/cells only. The probe set is a literal IN filter, so the
    candidate scan prunes before any pair work."""
    if spec.kind == "lsh":
        probe = query_probe_buckets(indexed, query_vec_id, spec.n_planes, spec.n_probe)
        key = "bucket"
    else:
        # IVF probing: rank cells by query·pivot (driver-side, exact)
        row = (
            indexed.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
        )
        if not row:
            raise ValueError(f"query vec_id {query_vec_id} not found")
        q = _quantize(np.array([row[0]["embedding"]], dtype=np.float64))[0]
        pivots = _quantize(_pivot_matrix(indexed, spec.n_cells))
        qdots = [(int((q * pivots[p]).sum()), p) for p in range(len(pivots))]
        probe = [p for _, p in sorted(qdots, key=lambda t: (-t[0], t[1]))[: spec.n_probe]]
        key = "cell"
    qrow = indexed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    return (
        indexed.filter(F.col(key).isin([int(b) for b in probe]))
        .filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qrow))
        .select("vec_id", cosine_expr("embedding", "qvec").cast("double").alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def lsh_probe_sweep(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, n_planes: int = N_PLANES
) -> DataFrame:
    """Recall-vs-cost sweep: for each probe count 1..1+planes, the
    candidate-set size and the recall against brute-force top-k.

    Analysis tool (drives the n_probe default choice); the driver loop
    runs 1+planes SMALL jobs — each probes a shrinking candidate set —
    so it is an offline tuning pass, not a per-query cost."""
    spark = emb.sparkSession
    truth = {r["vec_id"] for r in topk_bruteforce(emb, query_vec_id, k).collect()}
    indexed = emb.select(
        "vec_id",
        "embedding",
        make_bucket_udf(n_planes)(F.col("embedding")).alias("bucket"),
    )
    rows = []
    for n_probe in range(1, n_planes + 2):
        spec = AnnIndexSpec("lsh", n_rows=0, n_planes=n_planes, n_probe=n_probe)
        probe = query_probe_buckets(indexed, query_vec_id, n_planes, n_probe)
        candidates = indexed.filter(F.col("bucket").isin(probe)).count()
        got = {
            r["vec_id"]
            for r in ann_topk_indexed(indexed, spec, query_vec_id, k).collect()
        }
        rows.append(
            (
                n_probe,
                int(candidates),
                round(len(got & truth) / float(k), ROUND),
            )
        )
    return spark.createDataFrame(rows, "n_probe int, candidates bigint, recall double")
