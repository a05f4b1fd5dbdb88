"""Generate a larger-SF dataset for SCALING measurements by replicating
the sf0.1 fixture K times with deterministic key remapping.

Round-9 verdict item 6: at sf0.1 every 8-vs-32-core ratio is fixed-
overhead noise (0.47-1.37 where ideal is ~4), so scaling claims need a
bigger input. The driver's generator is not available (testdata is
read-only); this replication preserves schemas and per-copy structure
while keeping cross-copy interactions non-degenerate:

- documents: doc_id offset per copy; every TOKEN gets a per-copy
  suffix for copies >0, so the per-copy duplicate/shingle structure is
  preserved but copies do not alias into 10x exact duplicates (which
  would square the pair-join workloads into a different problem).
- embeddings: vec_id offset; a small deterministic per-copy,
  per-dimension additive perturbation breaks exact-duplicate vectors
  (scaling alone would keep cosine == 1 across copies).
- events: user_id/event_id offsets (same time range — 10x density is
  what a grown feed looks like).
- TPC-H facts (lineitem, orders, customer, part, supplier): all keys
  offset consistently; region/nation are dimensions and stay as-is.

Usage: python scripts/gen_scale_data.py [K] [out_dir]
Defaults: K=5 (≈ sf0.5), out_dir=/tmp/sfscale (the bench reads it via
SPARK_GRAFT_SF_DIR). Measurement-only tooling: nothing in the engine
or bench depends on this script.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    k_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"

    from pyspark.sql import functions as F

    from transferdb_spark.session import get_spark
    from transferdb_spark.sources.registry import load_table

    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)

    def offsets(df, cols, k):
        for c in cols:
            step = 10_000_000
            df = df.withColumn(c, (F.col(c) + F.lit(k * step)).cast("long"))
        return df

    def write(name, build):
        parts = [build(k) for k in range(k_copies)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionAll(p)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"wrote {name}", flush=True)

    docs = load_table(spark, SRC, "documents")
    doc_cols = docs.columns

    def build_docs(k):
        d = offsets(docs, ["doc_id"], k)
        if k > 0:
            # suffix every token: per-copy dup structure preserved,
            # no cross-copy aliasing. TOKENS splits on [\s\x00-\x1f]+
            # so an alnum suffix keeps token boundaries.
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.when(F.length(x) > 0, F.concat(x, F.lit(f"x{k}"))).otherwise(x),
                    ),
                    " ",
                ),
            )
        return d.select(*doc_cols)

    write("documents", build_docs)

    emb = load_table(spark, SRC, "embeddings")
    emb_cols = emb.columns

    def build_emb(k):
        e = offsets(emb, ["vec_id"], k)
        if k > 0:
            e = e.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda v, i: v
                    + (F.lit(k) * (i + F.lit(1)) % F.lit(7) - F.lit(3)) * F.lit(0.013),
                ),
            )
        return e.select(*emb_cols)

    write("embeddings", build_emb)

    ev = load_table(spark, SRC, "events")
    ev_cols = ev.columns
    id_like = [c for c in ("user_id", "event_id") if c in ev_cols]
    write("events", lambda k: offsets(ev, id_like, k).select(*ev_cols))

    remap = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
    }
    for name, cols in remap.items():
        t = load_table(spark, SRC, name)
        tc = t.columns
        write(name, lambda k, t=t, cols=cols, tc=tc: offsets(t, cols, k).select(*tc))

    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    main()
