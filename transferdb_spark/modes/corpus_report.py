"""`corpus-report` CLI mode — one-command corpus quality assessment.

The LLM-corpus analogue of the reference's `assess` mode (HTML schema
report, /root/reference/module/assess — same sink shape S10, applied
to the training-data domain): every number a data curator checks
before a training run, computed in ONE pass per family over the
documents table and emitted as a JSON summary + an HTML report file.

Sections (all composing operators that are individually oracle-checked
in the registry):
- volume: docs, tokens, bytes, per-language mix (ext/text.py)
- quality: Gopher-rule pass rate, bigram-LM score deciles
- duplication: exact-dup rate, cross-source lead-fingerprint matrix
- risk: PII match counts per class
Everything aggregates driver-side only at model size (per-language
rows, 10 deciles, source pairs) — corpus rows never collect.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def corpus_report(spark: SparkSession, source_dir: str, workdir: str) -> dict:
    from transferdb_spark.ext.dedup import cross_source_overlap, exact_dedup_groups
    from transferdb_spark.ext.text import (
        bigram_lm_score,
        gopher_quality,
        lang_id,
        pii_scrub,
        token_stats,
    )
    from transferdb_spark.operators.ranking import global_ntile
    from transferdb_spark.sources.registry import load_table

    docs = load_table(spark, source_dir, "documents")
    report: dict = {"mode": "corpus-report", "source_dir": source_dir}

    # -- volume
    stats = token_stats(docs)
    vol = stats.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_chars").alias("chars"),
    ).first()
    report["volume"] = {
        "docs": int(vol["docs"]),
        "tokens": int(vol["tokens"]),
        "chars": int(vol["chars"]),
    }
    report["languages"] = {
        r["lang_pred"]: int(r["n"])
        for r in lang_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # -- quality
    n_pass = gopher_quality(docs).agg(F.sum("keep")).first()[0] or 0
    report["quality"] = {
        "gopher_pass_rate": round(int(n_pass) / max(int(vol["docs"]), 1), 4),
        "lm_score_deciles": {
            int(r["bucket"]): round(float(r["lo"]), 6)
            for r in global_ntile(bigram_lm_score(docs), ["lm_score", "doc_id"], 10)
            .groupBy("bucket")
            .agg(F.min("lm_score").alias("lo"))
            .collect()
        },
    }

    # -- duplication
    dup_docs = exact_dedup_groups(docs).agg(
        F.coalesce(F.sum(F.col("group_size") - 1), F.lit(0)).alias("redundant")
    ).first()
    report["duplication"] = {
        "exact_redundant_docs": int(dup_docs["redundant"]),
        "exact_dup_rate": round(int(dup_docs["redundant"]) / max(int(vol["docs"]), 1), 6),
        "cross_source_pairs": [
            {
                "a": r["source_a"],
                "b": r["source_b"],
                "shared": int(r["n_shared"]),
                "pct": float(r["overlap_pct"]),
            }
            for r in cross_source_overlap(docs).orderBy(
                F.col("overlap_pct").desc(), "source_a", "source_b"
            ).limit(20).collect()
        ],
    }

    # -- repetition (Gopher n-gram battery, round 7) + collocations
    from transferdb_spark.ext.text import ngram_repetition, pmi_collocations

    rep = ngram_repetition(docs)
    rep_row = rep.agg(
        *[
            F.avg(c).alias(c)
            for c in rep.columns
            if c.startswith("rep_")
        ]
    ).first()
    report["repetition"] = {
        c: round(float(rep_row[c] or 0.0), 5) for c in rep_row.asDict()
    }
    report["collocations"] = [
        {"pair": f"{r['left']} {r['right']}", "count": int(r["pair_cnt"])}
        for r in pmi_collocations(docs, top=10).collect()
    ]

    # -- risk
    pii = pii_scrub(docs)
    pii_cols = [c for c in pii.columns if c.startswith("n_")]
    pii_row = pii.agg(*[F.sum(c).alias(c) for c in pii_cols]).first()
    report["pii"] = {c: int(pii_row[c] or 0) for c in pii_cols}

    os.makedirs(workdir, exist_ok=True)
    html_path = os.path.join(workdir, "corpus_report.html")
    with open(html_path, "w") as f:
        f.write(render_corpus_html(report))
    json_path = os.path.join(workdir, "corpus_report.json")
    with open(json_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    report["html_path"] = html_path
    report["json_path"] = json_path
    return report


def render_corpus_html(report: dict) -> str:
    """S10-shape driver-side template render (model-sized data only)."""

    def table(rows, headers):
        head = "".join(f"<th>{h}</th>" for h in headers)
        body = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows
        )
        return f'<table border="1"><tr>{head}</tr>{body}</table>'

    langs = table(sorted(report["languages"].items()), ["lang", "docs"])
    deciles = table(
        sorted(report["quality"]["lm_score_deciles"].items()),
        ["decile", "min lm_score"],
    )
    pairs = table(
        [
            (p["a"], p["b"], p["shared"], p["pct"])
            for p in report["duplication"]["cross_source_pairs"]
        ],
        ["source a", "source b", "shared leads", "overlap pct"],
    )
    pii = table(sorted(report["pii"].items()), ["class", "matches"])
    rep = table(sorted(report["repetition"].items()), ["signal", "corpus mean"])
    colls = table(
        [(c["pair"], c["count"]) for c in report["collocations"]],
        ["collocation", "count"],
    )
    v = report["volume"]
    return f"""<!DOCTYPE html><html><head><title>Corpus report</title></head>
<body><h1>Corpus report: {report["source_dir"]}</h1>
<h2>Volume</h2><p>{v["docs"]} docs, {v["tokens"]} tokens, {v["chars"]} chars</p>
<h2>Languages</h2>{langs}
<h2>Quality</h2><p>Gopher pass rate: {report["quality"]["gopher_pass_rate"]}</p>{deciles}
<h2>Duplication</h2>
<p>exact redundant docs: {report["duplication"]["exact_redundant_docs"]}
(rate {report["duplication"]["exact_dup_rate"]})</p>{pairs}
<h2>Repetition (Gopher n-gram battery)</h2>{rep}
<h2>Top collocations (PMI)</h2>{colls}
<h2>PII</h2>{pii}
</body></html>"""
