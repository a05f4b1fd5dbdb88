"""`compare` mode — two-phase chunked data verification (SURVEY.md §3.2).

Phase 1 (fast): per-chunk COUNT + commutative checksum on both sides,
joined — only mismatching chunks continue (report.go:74-166, 168-304).
Phase 2 (slow): two-sided exceptAll on just those chunk ranges →
INSERT/DELETE repair rows → fix-SQL file (report.go:236-302).

At 100 TB the phase-2 scan is bounded by the damaged key ranges
(predicate pushdown on the split key), not the table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from transferdb_spark.operators.checksum import compare_chunks
from transferdb_spark.operators.diff import dataset_diff, repair_sql
from transferdb_spark.plans.chunker import elect_split_key, plan_chunks


@dataclass
class CompareReport:
    table: str
    total_chunks: int = 0
    mismatched_chunks: list[int] = field(default_factory=list)
    insert_rows: int = 0
    delete_rows: int = 0
    fix_sql_path: str = ""

    @property
    def is_equal(self) -> bool:
        return not self.mismatched_chunks


def compare_tables(
    spark: SparkSession,
    src: DataFrame,
    tgt: DataFrame,
    table: str,
    workdir: str,
    key: str | None = None,
    n_chunks: int = 32,
    only_rows: bool = False,
    incremental: bool = False,
) -> CompareReport:
    """Compare src vs tgt; emit fix-SQL for divergent rows.

    only_rows=True is the reference's `only-check-rows` fast path
    (COUNT(1) per chunk, no checksum).
    incremental=True persists per-chunk (src, tgt) checksums under
    workdir and, on the next run, skips phase 2 for chunks whose BOTH
    checksums are unchanged since the last verified run — re-verify
    cost tracks the changed fraction, the way the reference's
    data_compare_meta lets a re-run touch only unfinished chunks."""
    import json

    report = CompareReport(table=table, total_chunks=n_chunks)
    key = key or elect_split_key(src)

    summary = compare_chunks(src, tgt, key, n_chunks)
    if only_rows:
        mism = summary.filter("src_cnt <> tgt_cnt").select("chunk_id").collect()
    else:
        mism = summary.filter("NOT is_match").select("chunk_id").collect()
    report.mismatched_chunks = sorted(r["chunk_id"] for r in mism)

    if incremental:
        state_path = os.path.join(workdir, f"compare_state_{table}.json")
        rows = summary.select(
            "chunk_id", "src_checksum", "tgt_checksum"
        ).collect()
        current = {
            str(r["chunk_id"]): [r["src_checksum"], r["tgt_checksum"]] for r in rows
        }
        previous = {}
        if os.path.exists(state_path):
            with open(state_path) as fh:
                previous = json.load(fh)
        # a mismatched chunk whose both-side checksums are identical to
        # the previous run would re-derive the identical repair rows
        report.mismatched_chunks = [
            c for c in report.mismatched_chunks if current.get(str(c)) != previous.get(str(c))
        ]
        os.makedirs(workdir, exist_ok=True)
        with open(state_path, "w") as fh:
            json.dump(current, fh)

    if not report.mismatched_chunks:
        return report

    # phase 2 — restrict both sides to damaged chunk ranges only
    chunks = plan_chunks(src, key, n_chunks)
    preds = [chunks[i].predicate for i in report.mismatched_chunks]
    where = " OR ".join(f"({p})" for p in preds)
    ins_df, del_df = dataset_diff(src.filter(where), tgt.filter(where))

    ins = ins_df.collect()
    dele = del_df.collect()
    report.insert_rows, report.delete_rows = len(ins), len(dele)

    os.makedirs(workdir, exist_ok=True)
    report.fix_sql_path = os.path.join(workdir, f"compare_{table}.sql")
    cols = src.columns
    with open(report.fix_sql_path, "w") as f:
        f.write(f"-- fix SQL for {table}: {len(ins)} inserts, {len(dele)} deletes\n")
        for stmt in repair_sql(ins, dele, cols, table):
            f.write(stmt + "\n")
    return report
