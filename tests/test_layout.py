"""Z-order layout: code correctness, clustering benefit, plan shape."""

from __future__ import annotations

import pytest

from transferdb_spark.plans.layout import (
    column_ranges,
    file_span_stats,
    morton_expr,
    zorder_layout,
)


def _py_bucket(v: int, lo: int, hi: int, bits: int) -> int:
    rng = hi - lo
    if rng < (1 << bits):
        return (v - lo) * ((1 << bits) - 1) // max(1, rng)
    return (v - lo) // (rng // (1 << bits) + 1)


def _py_spread2(x: int) -> int:
    for shift, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
        x = (x | (x << shift)) & mask
    return x


def _py_morton2(x: int, y: int) -> int:
    return _py_spread2(x) | (_py_spread2(y) << 1)


def test_zorder_code_matches_python_reference(spark, lineitem):
    from pyspark.sql import functions as F

    cols = ["l_partkey", "l_suppkey"]
    ranges = column_ranges(lineitem, cols)
    expr = morton_expr(cols, ranges, idiv="div")
    rows = (
        lineitem.select("l_partkey", "l_suppkey", F.expr(expr).alias("z"))
        .limit(500)
        .collect()
    )
    for r in rows:
        bx = _py_bucket(r["l_partkey"], *ranges["l_partkey"], 16)
        by = _py_bucket(r["l_suppkey"], *ranges["l_suppkey"], 16)
        assert r["z"] == _py_morton2(bx, by)


def test_zorder_code_matches_duckdb(spark, lineitem, sf_dir):
    """The '//'-idiv rendering of the SAME expression is bit-equal on DuckDB."""
    import duckdb
    from pyspark.sql import functions as F

    cols = ["l_partkey", "l_suppkey"]
    ranges = column_ranges(lineitem, cols)
    spark_rows = {
        (r["l_partkey"], r["l_suppkey"]): r["z"]
        for r in lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.expr(morton_expr(cols, ranges, idiv="div")).alias("z"),
        ).collect()
    }
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT l_partkey, l_suppkey, {morton_expr(cols, ranges, idiv='//')} AS z "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    assert len(duck) == len(spark_rows) or len(duck) >= 1
    for pk, sk, z in duck:
        assert spark_rows[(pk, sk)] == z


def test_morton_multidim_within_int64(spark, lineitem):
    from pyspark.sql import functions as F

    cols = ["l_partkey", "l_suppkey", "l_orderkey"]
    ranges = column_ranges(lineitem, cols)
    expr = morton_expr(cols, ranges, idiv="div")
    row = (
        lineitem.select(F.expr(expr).alias("z"))
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .first()
    )
    assert 0 <= row["lo"] <= row["hi"] < 1 << 48


def test_zorder_layout_improves_span_locality(spark, lineitem, tmp_path):
    """Every output file covers a small rectangle of (partkey, suppkey).

    Natural lineitem order is ~sorted by orderkey, so each file spans
    nearly the FULL partkey/suppkey range (span fraction ~1, no file
    ever skipped). The Z-ordered layout must cut the mean span on BOTH
    dimensions — that fraction is exactly the share of files a point
    filter has to read.
    """
    cols = ["l_partkey", "l_suppkey"]
    nat = str(tmp_path / "natural")
    zed = str(tmp_path / "zorder")
    lineitem.repartition(16).write.mode("overwrite").parquet(nat)
    zorder_layout(lineitem, cols, n_files=16).write.mode("overwrite").parquet(zed)

    nat_score = file_span_stats(nat, cols)
    z_score = file_span_stats(zed, cols)
    assert nat_score.n_files >= 8 and z_score.n_files >= 8
    for c in cols:
        assert nat_score.span_fraction[c] > 0.8  # unclustered: scan everything
        assert z_score.span_fraction[c] < 0.5 * nat_score.span_fraction[c]


def test_zorder_layout_single_exchange(spark, lineitem):
    plan = zorder_layout(lineitem, ["l_partkey", "l_suppkey"])._jdf.queryExecution().toString()
    assert plan.lower().count("exchange") <= 2  # range partitioner (+AQE read)
    assert "rangepartitioning" in plan.lower()


def test_zorder_layout_preserves_rows(spark, lineitem):
    out = zorder_layout(lineitem.limit(1000), ["l_partkey", "l_suppkey"], n_files=4)
    assert out.count() == 1000
    assert out.columns == lineitem.columns


def test_zorder_requires_two_columns():
    with pytest.raises(ValueError):
        morton_expr(["only_one"], {"only_one": (0, 10)})


def test_morton_bucket_fuzz_python_vs_duckdb():
    """Property fuzz: for random (lo, hi, v, bits), the '//' rendering
    of bucket/morton expressions evaluates on DuckDB to exactly the
    Python reference — the cross-engine contract zorder_code rests on."""
    import random

    import duckdb

    from transferdb_spark.plans.layout import bucket_expr, morton_expr

    rng = random.Random(20260814)
    con = duckdb.connect()
    for _ in range(200):
        bits = rng.choice([4, 8, 12, 16])
        lo = rng.randint(-(10**9), 10**9)
        hi = lo + rng.randint(0, 2 ** rng.randint(0, 40))
        v = rng.randint(lo, hi)
        got = con.execute(
            f"SELECT {bucket_expr(str(v), lo, hi, bits, '//')}"
        ).fetchone()[0]
        assert got == _py_bucket(v, lo, hi, bits), (v, lo, hi, bits)
        assert 0 <= got < (1 << bits)

    for _ in range(50):
        lo1, lo2 = rng.randint(-(10**6), 10**6), rng.randint(-(10**6), 10**6)
        hi1 = lo1 + rng.randint(1, 10**7)
        hi2 = lo2 + rng.randint(1, 10**7)
        v1, v2 = rng.randint(lo1, hi1), rng.randint(lo2, hi2)
        expr = morton_expr(
            ["x", "y"], {"x": (lo1, hi1), "y": (lo2, hi2)}, idiv="//"
        )
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {v1} AS x, {v2} AS y)"
        ).fetchone()[0]
        want = _py_morton2(
            _py_bucket(v1, lo1, hi1, 16), _py_bucket(v2, lo2, hi2, 16)
        )
        assert got == want, (v1, v2, lo1, hi1, lo2, hi2)


def test_recommend_layout_prefers_frequent_selective_columns(spark, lineitem):
    from transferdb_spark.plans.layout import recommend_layout

    workload = [
        (["l_partkey"], 10.0),          # frequent + high NDV
        (["l_suppkey"], 8.0),           # frequent + decent NDV
        (["l_returnflag"], 12.0),       # frequent but only 3 distinct values
        (["l_orderkey"], 0.5),          # rare
        (["not_a_column"], 99.0),       # ignored
    ]
    rec = recommend_layout(lineitem, workload, max_cols=2)
    assert rec == ["l_partkey", "l_suppkey"]
    assert recommend_layout(lineitem, [], max_cols=2) == []
    # single-earner workloads recommend a single (plain-sort) column
    assert recommend_layout(lineitem, [(["l_partkey"], 1.0)]) == ["l_partkey"]


def test_workload_log_relation_drives_layout_advice(spark, lineitem, tmp_path):
    """--layout-cols auto end to end: a query-log RELATION folds into
    the advisor's workload shape (weights summed per filter set) and
    the advised columns drive the compaction CLI path."""
    import json
    import subprocess
    import sys

    from transferdb_spark.plans.layout import advise_layout_from_log, workload_from_log

    log = spark.createDataFrame(
        [
            (["l_shipdate", "l_discount"], 5.0),
            (["l_discount", "l_shipdate"], 3.0),  # same set, other order
            (["l_partkey"], 1.0),
            (["not_a_column"], 100.0),  # unknown columns score nothing
        ],
        "filter_cols array<string>, weight double",
    )
    wl = dict((tuple(c), w) for c, w in workload_from_log(log))
    assert wl[("l_discount", "l_shipdate")] == 8.0  # order-insensitive fold
    assert wl[("l_partkey",)] == 1.0

    rec = advise_layout_from_log(lineitem, log, max_cols=2)
    # shipdate+discount carry 8x the weight of partkey
    assert set(rec) == {"l_shipdate", "l_discount"}

    # a string filter_cols column (one col per row) also works
    log1 = spark.createDataFrame([("l_partkey",)], "filter_cols string")
    assert advise_layout_from_log(lineitem, log1) == ["l_partkey"]

    # CLI: optimize --layout-cols auto --workload <json log>
    src = str(tmp_path / "li")
    lineitem.limit(2000).coalesce(4).write.parquet(src)
    logp = str(tmp_path / "wl.jsonl")
    with open(logp, "w") as f:
        for cols, w in [(["l_orderkey", "l_partkey"], 4.0)]:
            f.write(json.dumps({"filter_cols": cols, "weight": w}) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "transferdb_spark", "--mode", "optimize",
         "--path", src, "--layout-cols", "auto", "--workload", logp,
         "--target-mb", "1"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(payload["advised_layout_cols"]) == {"l_orderkey", "l_partkey"}
    assert payload["rows"] == 2000 or payload.get("files_after")


def test_compact_writes_parquet_bloom_filters(spark, tmp_path):
    """--bloom-cols: the rewritten files physically carry parquet bloom
    filters (neither pyarrow 16 nor duckdb expose the offset, so the
    evidence is a size differential on otherwise-identical writes) and
    an equality probe still returns the right rows."""
    import glob
    import os

    from transferdb_spark.modes.optimize import compact_files

    def build(path, bloom):
        # the probe column must BUST dictionary encoding (dict bigger
        # than the 1 MB page cap): parquet-mr silently drops the bloom
        # on fully-dictionary-encoded chunks, where the dictionary
        # already answers membership
        spark.range(60000).selectExpr(
            "id AS k",
            "concat(md5(cast(id as string)), md5(cast(id+1 as string))) AS probe",
        ).repartition(4).write.mode("overwrite").parquet(path)
        return compact_files(
            spark, path, n_files=1, bloom_cols=["probe"] if bloom else None
        )

    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    assert build(plain, False).files_after == 1
    assert build(bloomed, True).files_after == 1

    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(p + "/part-*.parquet")
    )
    # the bloom filter is real bytes in the file: same rows, same
    # layout, same codec — only the enabled filter differs
    assert size(bloomed) > size(plain) + 10_000

    import hashlib

    probe = (
        hashlib.md5(b"131").hexdigest() + hashlib.md5(b"132").hexdigest()
    )
    got = spark.read.parquet(bloomed).where(f"probe = '{probe}'").count()
    assert got == 1


def test_compact_partitioned_table(spark, tmp_path):
    """Partitioned layout: each leaf compacts independently, partition
    dirs and pruning survive, and row counts are preserved."""
    from transferdb_spark.modes.optimize import compact_partitioned

    path = str(tmp_path / "pt")
    spark.range(8000).selectExpr(
        "id AS k", "cast(id % 3 AS int) AS p", "repeat('y', 20) AS pad"
    ).repartition(6).write.partitionBy("p").parquet(path)

    res = compact_partitioned(spark, path, target_mb=128)
    assert res["partitions"] == 3
    assert res["files_after"] == 3 < res["files_before"]

    after = spark.read.parquet(path)
    assert after.count() == 8000
    assert after.where("p = 1").count() == len([i for i in range(8000) if i % 3 == 1])
