"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q18_large_orders",
    "normalize_lineitem",
    "chunk_counts",
    "compare_chunk_checksum",
    "compare_diff_inserts",
    "compare_summary",
    "split_key_candidates",
    "window_topk_orders",
    "listagg_nation_customers",
    "events_hourly_rollup",
    "sessionize_events",
    "asof_last_purchase",
    "multires_rollup",
    "range_join_windows",
    "text_token_stats",
    "text_lang_id",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_topk",
    "ann_topk_lsh",
    "embedding_neardup",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from transferdb_spark.session import get_spark

    spark = get_spark("transferdb-bench")
    qs = entry_mod.queries()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # warmup: JVM + parquet footer caches, so timings measure the plans
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    total = 0.0
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        # best of 2: the second run reuses JVM/codegen/file-listing
        # caches, so this measures the plan, not warmup jitter
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        total += best

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
