"""CLI dispatcher, JDBC plan construction, and scalar-function tests."""

from __future__ import annotations

import json

import pytest


def run_cli(argv, capsys):
    from transferdb_spark.__main__ import main

    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_prepare_and_reverse(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd")
    out = run_cli(["--mode", "prepare", "--workdir", wd], capsys)
    assert out["mode"] == "prepare"

    out = run_cli(["--mode", "reverse", "--workdir", wd, "--tables", "lineitem,orders"], capsys)
    assert out["tables"] == 2 and not out["errors"]
    assert "PRIMARY KEY" in open(out["ddl"]).read()


def test_cli_compare_corrupted(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd")
    out = run_cli(["--mode", "compare", "--workdir", wd, "--chunks", "8"], capsys)
    assert out["equal"] is False
    assert out["insert_rows"] > 0 and out["delete_rows"] > 0


def test_jdbc_reader_plan(spark):
    from transferdb_spark.plans.chunker import Chunk
    from transferdb_spark.sources.jdbc import JdbcSink, JdbcSource

    chunks = [
        Chunk(0, 1, 100, "id <= 100"),
        Chunk(1, 101, 200, "id >= 101"),
    ]
    src = JdbcSource(url="jdbc:mysql://host/db", table="s.t", user="u", fetch_size=5000)
    reader, preds = src.reader(spark, chunks)
    assert preds == ["id <= 100", "id >= 101"]

    sink = JdbcSink(url="jdbc:mysql://host/db", table="t")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    stmt = sink.upsert_batch(df, key_cols=["id"])
    assert stmt == (
        "INSERT INTO t (id, v) VALUES (?, ?) ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )


def test_escape_mysql_contract():
    """256-byte sweep (the reference's own test shape,
    common/strings_test.go:11-38): every punct/symbol except % _ gets a
    backslash; alnum/space/control pass through."""
    import unicodedata

    from transferdb_spark.functions.escaping import escape_mysql

    for code in range(256):
        ch = chr(code)
        out = escape_mysql(ch)
        is_ps = unicodedata.category(ch)[0] in ("P", "S")
        if is_ps and ch not in ("%", "_"):
            assert out == "\\" + ch, repr(ch)
        else:
            assert out == ch, repr(ch)


def test_escape_oracle_and_csv_binary():
    from transferdb_spark.functions.escaping import escape_csv_binary, escape_oracle

    assert escape_oracle("it's") == "it''s"
    assert escape_csv_binary(b"\x00\xff") == "0x00ff"
    assert escape_csv_binary(None) == ""


@pytest.mark.parametrize(
    "a,b,expected",
    [("5.7.26", "5.7.9", 1), ("8.0", "8.0.0", 0), ("10.4.6-MariaDB", "10.4.7", -1)],
)
def test_version_compare(a, b, expected):
    from transferdb_spark.functions.escaping import compare_version

    assert compare_version(a, b) == expected


def test_simhash_near_duplicates_close(spark, sf_dir):
    """SimHash of a doc vs itself with one token changed: small Hamming
    distance; unrelated docs: larger."""
    from pyspark.sql import functions as F

    from transferdb_spark.ext.dedup import simhash_fingerprints
    from transferdb_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    tweaked = docs.withColumn("text", F.concat(F.col("text"), F.lit(" zzz"))).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs.unionByName(tweaked)).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    ids = sorted(k for k in fp if k < 100000)
    near = [ham(fp[i], fp[i + 100000]) for i in ids]
    assert max(near) <= 6  # one extra token flips few bits


def test_charset_transcode_roundtrip(spark):
    from transferdb_spark.functions.charset import (
        canonical_charset,
        convert_bytes,
        decode_from,
        encode_as,
        transcode_bytes,
    )

    assert canonical_charset("utf8mb4") == "UTF-8"
    assert canonical_charset("ZHS16GBK") == "GBK"
    with pytest.raises(ValueError):
        canonical_charset("EBCDIC")

    s = "数据迁移"
    assert convert_bytes(s.encode("gbk"), "GBK", "UTF8MB4") == s.encode("utf-8")

    df = spark.createDataFrame([(s.encode("gbk"),), (None,)], "raw binary")
    got = df.select(decode_from("raw", "GBK").alias("v")).collect()
    assert {r["v"] for r in got} == {s, None}

    # full byte transcode GBK -> UTF-8 and back
    rt = df.select(
        transcode_bytes(transcode_bytes("raw", "GBK", "UTF8MB4"), "UTF8MB4", "GBK").alias("v")
    ).collect()
    assert {bytes(r["v"]) if r["v"] is not None else None for r in rt} == {s.encode("gbk"), None}

    # sink-side encode of a native string column
    t = "資料遷移"  # traditional: representable in Big5
    enc = spark.createDataFrame([(t,)], ["v"]).select(encode_as("v", "BIG5").alias("b")).collect()
    assert bytes(enc[0]["b"]) == t.encode("big5")


def test_subset_ops(spark):
    from transferdb_spark.functions.scalars import df_is_subset, is_subset

    assert is_subset(["a"], ["a", "b"])
    assert not is_subset(["a", "c"], ["a", "b"])

    a = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    b = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    assert df_is_subset(a, b)
    # multiplicity matters: 'a' has two 1s, b2 only one
    b2 = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    assert not df_is_subset(a, b2)


def test_full_migrate_user_range(tmp_path, spark, lineitem):
    from transferdb_spark.modes.full import full_migrate_table

    wd = str(tmp_path / "wd")
    target = full_migrate_table(
        spark,
        lineitem,
        "lineitem",
        wd,
        n_chunks=4,
        user_range="l_quantity < 10",
    )
    out = spark.read.parquet(target)
    assert out.filter("l_quantity >= 10").count() == 0
    expected = lineitem.filter("l_quantity < 10").count()
    assert out.count() == expected


def test_cli_assess_csv_full_check(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd2")
    out = run_cli(["--mode", "assess", "--workdir", wd], capsys)
    assert out["mode"] == "assess" and out["tables"] > 0
    assert "<html" in open(out["report"]).read().lower()

    out = run_cli(["--mode", "csv", "--workdir", wd, "--tables", "nation"], capsys)
    assert out["mode"] == "csv"

    out = run_cli(["--mode", "orc", "--workdir", wd, "--tables", "nation"], capsys)
    assert out["mode"] == "orc"
    back = spark.read.orc(out["paths"]["nation"])
    assert back.count() == 25 and "n_name" in back.columns

    out = run_cli(["--mode", "full", "--workdir", wd, "--tables", "nation,region"], capsys)
    assert len(out["targets"]) == 2

    out = run_cli(["--mode", "check", "--workdir", wd], capsys)
    assert out["mode"] == "check"


def test_cli_all_mode_runs_full_plus_incremental(tmp_path, capsys, spark):
    """The reference's hallmark mode: full load then CDC consumption."""
    wd = str(tmp_path / "wd3")
    out = run_cli(
        ["--mode", "all", "--workdir", wd, "--tables", "nation", "--chunks", "4"],
        capsys,
    )
    assert out["mode"] == "all"
    assert out["targets"]  # full phase landed tables
    assert out["incr_rows"] > 0  # incremental phase consumed the stream


def test_cli_export_mode(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd")
    out = run_cli(["--mode", "export", "--workdir", wd], capsys)
    assert out["n_docs"] > 0
    assert set(out["splits"]) == {"train", "val", "test"}
    assert sum(v["n_docs"] for v in out["splits"].values()) == out["n_docs"]
    back = spark.read.parquet(out["path"])
    assert back.count() == out["n_docs"]
    assert {"split", "bin_id", "start_offset", "n_tokens"} <= set(back.columns)


def test_cli_retry_mode(tmp_path, spark, lineitem):
    """--mode retry re-runs exactly the FAILED chunks and reports the
    error-log size (the reference's resume-failed operational surface)."""
    import json

    from transferdb_spark.__main__ import main
    from transferdb_spark.plans.chunker import plan_chunks
    from transferdb_spark.state.store import FAILED, SUCCESS, StateStore

    wd = str(tmp_path / "wd")
    store = StateStore(wd, "full")
    chunks = plan_chunks(lineitem, "l_orderkey", 4)
    store.init_table("lineitem", chunks)
    for c in chunks:
        store.mark("lineitem", c.chunk_id, SUCCESS)
    store.mark("lineitem", 2, FAILED, "simulated")

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--mode", "retry", "--workdir", wd, "--tables", "lineitem"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["retried"]["lineitem"]["retried"] == 1
    assert out["retried"]["lineitem"]["succeeded"] == 1
    assert out["still_failed"] == []
    assert out["error_log_entries"] == 1


def test_cli_optimize_mode(tmp_path, capsys, spark, lineitem):
    frag = str(tmp_path / "frag")
    lineitem.repartition(12).write.mode("overwrite").parquet(frag)
    out = run_cli(["--mode", "optimize", "--path", frag, "--target-mb", "64"], capsys)
    assert out["files_before"] == 12
    assert out["files_after"] <= 4
    assert out["rows"] == lineitem.count()


def test_cli_explain_mode(capsys, spark):
    out = run_cli(["--mode", "explain"], capsys)
    assert "q1_pricing_summary" in out["queries"]
    out2 = run_cli(["--mode", "explain", "--query", "q1_pricing_summary"], capsys)
    assert out2["query"] == "q1_pricing_summary"


def test_cli_search_mode(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd")
    out = run_cli(
        ["--mode", "search", "--workdir", wd, "--terms", "spark,dup", "--topk", "5"],
        capsys,
    )
    assert out["hits"] == 5 and len(out["results"]) == 5
    scores = [r["score"] for r in out["results"]]
    assert scores == sorted(scores, reverse=True)
    assert spark.read.parquet(out["results_path"]).count() == 5

    out = run_cli(
        ["--mode", "search", "--workdir", wd, "--terms", "spark,dup", "--hybrid"],
        capsys,
    )
    assert out["hybrid"] is True and out["hits"] == 10
    assert {"doc_id", "bm25", "cosine"} <= set(out["results"][0])

    out = run_cli(
        ["--mode", "search", "--workdir", wd, "--terms", "spark,dup", "--rm3"],
        capsys,
    )
    assert out["rm3"] is True and out["hits"] == 10
    assert 0 < len(out["expanded_terms"]) <= 5
    assert all(t not in ("spark", "dup") for t in out["expanded_terms"])


def test_cli_pipeline_mode(tmp_path, capsys, spark):
    wd = str(tmp_path / "wd")
    out = run_cli(
        ["--mode", "pipeline", "--workdir", wd, "--budget", "64"], capsys
    )
    assert out["docs_raw"] >= out["docs_clean"] >= out["docs_pruned"] > 0
    assert set(out["bins"]) == {"train", "val", "test"}
    import os

    assert os.path.isdir(os.path.join(out["bins_dir"], "split=train"))
    assert os.path.exists(out["manifest_path"])


def test_cli_corpus_report_mode(tmp_path, capsys, spark):
    import os

    wd = str(tmp_path / "wd")
    out = run_cli(["--mode", "corpus-report", "--workdir", wd], capsys)
    assert out["volume"]["docs"] == 500 and out["volume"]["tokens"] > 0
    assert sum(out["languages"].values()) == 500
    assert set(out["pii"]) == {"n_emails", "n_phones", "n_ips"}
    assert len(out["quality"]["lm_score_deciles"]) == 10
    # deciles are ordered: bucket k's floor <= bucket k+1's floor
    d = out["quality"]["lm_score_deciles"]
    floors = [d[str(k)] if str(k) in d else d[k] for k in range(1, 11)]
    assert floors == sorted(floors)
    # round-7 facets: Gopher n-gram repetition means + PMI collocations
    assert set(out["repetition"]) == {
        *(f"rep_top{n}" for n in (2, 3, 4)),
        *(f"rep_dup{n}" for n in range(5, 11)),
    }
    assert all(v >= 0 for v in out["repetition"].values())
    assert out["collocations"] and all(c["count"] >= 5 for c in out["collocations"])
    assert os.path.exists(out["html_path"]) and os.path.exists(out["json_path"])
    html = open(out["html_path"]).read()
    assert "Corpus report" in html and "Gopher pass rate" in html
    assert "Repetition" in html and "collocations" in html
