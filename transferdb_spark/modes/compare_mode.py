"""`compare` mode — two-phase chunked data verification (SURVEY.md §3.2).

Phase 1 (fast): per-chunk COUNT + commutative checksum on both sides
over ONE shared chunk grid, joined — only mismatching chunks continue
(report.go:74-166, 168-304).
Phase 2 (slow): two-sided exceptAll on just those chunk ranges →
INSERT/DELETE repair rows → fix-SQL file (report.go:236-302).

At 100 TB the phase-2 scan is bounded by the damaged key ranges
(predicate pushdown on the split key), not the table — and the repair
statements are rendered executor-side (operators.diff.repair_statements)
so the driver never holds repair rows, only counts.
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transferdb_spark.operators.checksum import compare_chunks, shared_chunk_bounds
from transferdb_spark.operators.diff import dataset_diff, repair_statements
from transferdb_spark.plans.chunker import elect_split_key, plan_chunks


@dataclass
class CompareReport:
    table: str
    total_chunks: int = 0
    # raw phase-1 mismatch set: every chunk whose (cnt, checksum) differs
    mismatched_chunks: list[int] = field(default_factory=list)
    # incremental runs: mismatched chunks whose BOTH-side checksums are
    # unchanged since the previous run (phase 2 skipped, still unequal)
    skipped_chunks: list[int] = field(default_factory=list)
    insert_rows: int = 0
    delete_rows: int = 0
    fix_sql_path: str = ""

    @property
    def is_equal(self) -> bool:
        """Derived from the RAW mismatch set — a chunk skipped as
        'unchanged since last run' is still unequal."""
        return not self.mismatched_chunks

    @property
    def rescan_chunks(self) -> list[int]:
        """Chunks phase 2 actually re-derived repairs for."""
        return [c for c in self.mismatched_chunks if c not in self.skipped_chunks]


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
    dialect: str = "mysql",
) -> CompareReport:
    """Compare src vs tgt; emit fix-SQL for divergent rows.

    only_rows=True is the reference's `only-check-rows` fast path
    (COUNT(1) per chunk, no checksum).
    incremental=True persists per-chunk (src, tgt) checksums under
    workdir and, on the next run, skips phase 2 for chunks whose BOTH
    checksums are unchanged since the last run — re-verify cost tracks
    the changed fraction, the way the reference's data_compare_meta
    lets a re-run touch only unfinished chunks. Skipped chunks stay in
    mismatched_chunks (they are still divergent); see skipped_chunks.
    """
    import json

    report = CompareReport(table=table, total_chunks=n_chunks)
    key = key or elect_split_key(src)

    # one grid for both sides — the reference applies one chunk plan's
    # WHERE ranges to both databases (chunk.go:108-399)
    bounds = shared_chunk_bounds(src, tgt, key)
    summary = compare_chunks(src, tgt, key, n_chunks, bounds=bounds)
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
        # the previous run would re-derive the identical repair rows —
        # skip its phase 2, but it remains counted as unequal
        report.skipped_chunks = [
            c
            for c in report.mismatched_chunks
            if current.get(str(c)) == previous.get(str(c))
        ]
        os.makedirs(workdir, exist_ok=True)
        with open(state_path, "w") as fh:
            json.dump(current, fh)

    todo = report.rescan_chunks
    if not todo:
        return report

    # phase 2 — restrict both sides to damaged chunk ranges only,
    # using the SAME grid phase 1 aggregated over
    chunks = plan_chunks(src, key, n_chunks, bounds=bounds)
    preds = [chunks[i].predicate for i in todo]
    where = " OR ".join(f"({p})" for p in preds)
    ins_df, del_df = dataset_diff(src.filter(where), tgt.filter(where))

    # render INSERT/DELETE statements executor-side; the driver sees
    # only the (kind → count) rollup — never the repair rows
    stmts = repair_statements(ins_df, del_df, table, dialect=dialect).persist()
    counts = {
        r["kind"]: r["n"]
        for r in stmts.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    report.insert_rows = int(counts.get("INSERT", 0))
    report.delete_rows = int(counts.get("DELETE", 0))

    os.makedirs(workdir, exist_ok=True)
    stmt_dir = os.path.join(workdir, f"compare_{table}_stmts")
    stmts.select("stmt").write.mode("overwrite").text(stmt_dir)
    stmts.unpersist()

    # assemble the single fix file the reference emits
    # (module/compare/file.go) by streaming the part files — constant
    # driver memory, no py4j row transfer
    report.fix_sql_path = os.path.join(workdir, f"compare_{table}.sql")
    with open(report.fix_sql_path, "w") as out:
        out.write(
            f"-- fix SQL for {table}: {report.insert_rows} inserts, "
            f"{report.delete_rows} deletes\n"
        )
        for part in sorted(glob.glob(os.path.join(stmt_dir, "part-*"))):
            with open(part) as src_fh:
                shutil.copyfileobj(src_fh, out)
    shutil.rmtree(stmt_dir, ignore_errors=True)
    return report
