"""A1/A2 — chunked row-count and commutative checksum compare.

The reference's fast compare path: per chunk, COUNT(1) on both sides
(/root/reference/module/compare/oracle/o2m/report.go:74-166) or a
CRC32-per-row summed over the chunk
(/root/reference/database/oracle/compare.go:146-274). The sum is
commutative, so no ordering is needed — on Spark this is a single
groupBy with map-side partial aggregation; the shuffle moves exactly
n_chunks rows per partition.

Scale note (100 TB): the only wide operation is groupBy(chunk_id) over
~n_chunks distinct keys — partial aggregation reduces each input
partition to n_chunks rows before the shuffle, so the exchanged data is
O(partitions × chunks), independent of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transferdb_spark.functions.hashing import portable_hash64
from transferdb_spark.functions.canonical import row_string
from transferdb_spark.plans.chunker import with_chunk_id


def chunk_checksums(df: DataFrame, key: str, n_chunks: int, cols: list[str] | None = None) -> DataFrame:
    """Per-chunk (cnt, checksum) — columns: chunk_id, cnt, checksum."""
    tagged, _, _ = with_chunk_id(df, key, n_chunks)
    h = portable_hash64(row_string(df.schema, cols))
    return (
        tagged.select("chunk_id", h.alias("h"))
        .groupBy("chunk_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("h").alias("checksum"))
    )


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Whole-table (cnt, checksum) — one row."""
    h = portable_hash64(row_string(df.schema, cols))
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("h").alias("checksum")
    )


def compare_chunks(src: DataFrame, tgt: DataFrame, key: str, n_chunks: int) -> DataFrame:
    """Join per-chunk summaries of both sides; flag mismatching chunks.

    Full-outer join on chunk_id (tiny — n_chunks rows/side, broadcast).
    Output: chunk_id, src_cnt, tgt_cnt, src_checksum, tgt_checksum,
    is_match. Mismatching chunks are the candidates for the row-level
    diff slow path (operators.diff), exactly the reference's two-phase
    design (report.go:168-304).
    """
    s = chunk_checksums(src, key, n_chunks).withColumnsRenamed(
        {"cnt": "src_cnt", "checksum": "src_checksum"}
    )
    t = chunk_checksums(tgt, key, n_chunks).withColumnsRenamed(
        {"cnt": "tgt_cnt", "checksum": "tgt_checksum"}
    )
    joined = s.join(t, "chunk_id", "full_outer")
    return joined.select(
        "chunk_id",
        F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
        F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
        "src_checksum",
        "tgt_checksum",
        (
            (F.coalesce("src_cnt", F.lit(0)) == F.coalesce("tgt_cnt", F.lit(0)))
            & (F.coalesce("src_checksum", F.lit(0)) == F.coalesce("tgt_checksum", F.lit(0)))
        ).alias("is_match"),
    )
