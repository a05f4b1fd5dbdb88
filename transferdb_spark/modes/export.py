"""`export` mode — corpus-assembly sink for training pipelines.

The migrate modes land *tables*; this mode lands a *training corpus*:
every document tagged with its train/val/test split and its packing
position (bin + start offset), written as parquet partitioned by
split, with files laid out in training order and a driver-side
manifest for the trainer to consume.

Scale design (100 TB):
- split/pack assignment are the ext/packing.py operators (narrow map +
  distributed prefix sum — no single-partition stage);
- the write is `repartitionByRange(bin_id)` + sortWithinPartitions, so
  each output file covers a contiguous bin range and global training
  order is (file order, row order) — a trainer streams files
  sequentially without any shuffle-read;
- the manifest holds per-split accounting rows (O(splits)), never data.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferdb_spark.ext.packing import PACK_BUDGET, pack_plan, split_assign


@dataclass
class ExportManifest:
    path: str
    budget: int
    n_docs: int = 0
    n_tokens: int = 0
    n_bins: int = 0
    splits: dict = field(default_factory=dict)  # split -> {n_docs, n_tokens}

    def to_json(self) -> str:
        return json.dumps(
            {
                "path": self.path,
                "budget": self.budget,
                "n_docs": self.n_docs,
                "n_tokens": self.n_tokens,
                "n_bins": self.n_bins,
                "splits": self.splits,
            },
            indent=2,
            sort_keys=True,
        )


def export_corpus(
    spark: SparkSession,
    docs: DataFrame,
    outdir: str,
    budget: int = PACK_BUDGET,
) -> ExportManifest:
    """Write the corpus as parquet partitioned by split, packed in
    training order; returns the manifest (also written as
    manifest.json next to the data).

    Output schema: original doc columns + split, bin_id, start_offset,
    n_tokens. Within each split-partition, files cover contiguous
    bin_id ranges and rows are sorted by (bin_id, start_offset)."""
    assigned = (
        split_assign(docs)
        .join(pack_plan(docs, budget), "doc_id")
    )
    data_dir = os.path.join(outdir, "data")
    (
        assigned.repartitionByRange("split", "bin_id")
        .sortWithinPartitions("split", "bin_id", "start_offset")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(data_dir)
    )

    # accounting from the WRITTEN data (one scan of the output), so the
    # manifest cannot drift from what landed
    out = spark.read.parquet(data_dir)
    split_rows = (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    )
    top = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count_distinct("bin_id").alias("n_bins"),
    ).first()
    manifest = ExportManifest(
        path=data_dir,
        budget=budget,
        n_docs=int(top["n_docs"]),
        n_tokens=int(top["n_tokens"] or 0),
        n_bins=int(top["n_bins"]),
        splits={
            r["split"]: {"n_docs": int(r["n_docs"]), "n_tokens": int(r["n_tokens"] or 0)}
            for r in split_rows
        },
    )
    with open(os.path.join(outdir, "manifest.json"), "w") as fh:
        fh.write(manifest.to_json())
    return manifest


def read_manifest(outdir: str) -> dict:
    with open(os.path.join(outdir, "manifest.json")) as fh:
        return json.load(fh)
