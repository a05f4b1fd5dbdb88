"""`assess` mode — schema-wide aggregation report (A4-A9).

The reference runs ~25 catalog aggregations (storage overview, top-N
segments, object/type counts, over-limit checks) and folds per-object
compatibility counters into a summary rendered as HTML
(/root/reference/database/oracle/assess.go:162-668,
/root/reference/module/assess/oracle/o2m/assess.go:177-236).

Here the catalog is the fixture catalog; sizes come from parquet file
bytes; compatibility scoring runs every column through the R1 rule
engine. All aggregation is driver-side over tiny metadata; the only
Spark jobs are row counts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from transferdb_spark.catalog.fixture import fixture_catalog
from transferdb_spark.catalog.meta import TableMeta
from transferdb_spark.rules.datatypes import map_oracle_type


@dataclass
class AssessReport:
    schema_name: str
    overview: list[dict] = field(default_factory=list)  # A4: per-table size/rows
    top_tables: list[dict] = field(default_factory=list)  # A5: top-N by bytes
    type_distribution: dict[str, int] = field(default_factory=dict)  # A6
    over_limits: list[str] = field(default_factory=list)  # A7
    compatible_columns: int = 0  # A9
    convertible_columns: int = 0
    incompatible_columns: int = 0
    # A6 breadth (assess.go:560-668): object/kind distributions
    object_counts: dict[str, int] = field(default_factory=dict)
    constraint_kinds: dict[str, int] = field(default_factory=dict)
    index_kinds: dict[str, int] = field(default_factory=dict)
    table_types: dict[str, int] = field(default_factory=dict)
    # A9 per-object rollup (assess_result.go): one verdict row per table
    per_object: list[dict] = field(default_factory=list)

    @property
    def compatibility_pct(self) -> float:
        total = self.compatible_columns + self.convertible_columns + self.incompatible_columns
        return round(100.0 * self.compatible_columns / total, 2) if total else 100.0


# MySQL hard limits the reference checks (assess.go:362-481)
MAX_COLUMNS = 512
MAX_INDEXES = 64
MAX_NAME_LEN = 64

# types that convert with semantic change (convertible, not 1:1)
CONVERTIBLE_TYPES = {"XMLTYPE", "BFILE", "ROWID", "UROWID"} | {
    f"INTERVAL YEAR({i}) TO MONTH" for i in range(10)
}


def assess_schema(
    spark: SparkSession, sf_dir: str, schema_name: str = "TPCH", top_n: int = 10
) -> AssessReport:
    catalog = fixture_catalog(spark, sf_dir, schema_name, with_counts=True)
    report = AssessReport(schema_name=schema_name)

    for name, t in sorted(catalog.items()):
        path = os.path.join(sf_dir, f"{name}.parquet")
        size = os.path.getsize(path) if os.path.exists(path) else 0
        report.overview.append(
            {
                "table": t.name,
                "rows": t.row_count,
                "bytes": size,
                "columns": len(t.columns),
                "indexes": len(t.indexes),
                "constraints": len(t.constraints),
            }
        )
        obj_compat = obj_convert = obj_incompat = 0
        for c in t.columns:
            base = c.data_type.upper()
            report.type_distribution[base] = report.type_distribution.get(base, 0) + 1
            if base in CONVERTIBLE_TYPES or base.startswith("INTERVAL") or c.source_hint:
                report.convertible_columns += 1
                obj_convert += 1
            else:
                try:
                    map_oracle_type(c)
                    report.compatible_columns += 1
                    obj_compat += 1
                except Exception:
                    report.incompatible_columns += 1
                    obj_incompat += 1

        # per-object verdict rollup (reference assess_result.go folds
        # per-object Y/N counters, not just schema-wide tallies)
        verdict = (
            "BLOCKED"
            if obj_incompat or not t.is_compatible
            else ("PARTIAL" if obj_convert else "CLEAN")
        )
        report.per_object.append(
            {
                "table": t.name,
                "table_type": t.table_type,
                "columns": len(t.columns),
                "compatible": obj_compat,
                "convertible": obj_convert,
                "incompatible": obj_incompat,
                "verdict": verdict,
            }
        )

        # object/kind distributions (assess.go:560-668)
        report.object_counts["TABLE"] = report.object_counts.get("TABLE", 0) + 1
        report.object_counts["INDEX"] = report.object_counts.get("INDEX", 0) + len(t.indexes)
        report.object_counts["CONSTRAINT"] = report.object_counts.get("CONSTRAINT", 0) + len(
            t.constraints
        )
        for c in t.constraints:
            report.constraint_kinds[c.ctype] = report.constraint_kinds.get(c.ctype, 0) + 1
        for ix in t.indexes:
            kind = "UNIQUE" if ix.unique else ix.index_type
            report.index_kinds[kind] = report.index_kinds.get(kind, 0) + 1
        report.table_types[t.table_type] = report.table_types.get(t.table_type, 0) + 1

        if len(t.columns) > MAX_COLUMNS:
            report.over_limits.append(f"{t.name}: {len(t.columns)} columns > {MAX_COLUMNS}")
        if len(t.indexes) > MAX_INDEXES:
            report.over_limits.append(f"{t.name}: {len(t.indexes)} indexes > {MAX_INDEXES}")
        for c in t.columns:
            if len(c.name) > MAX_NAME_LEN:
                report.over_limits.append(f"{t.name}.{c.name}: name length > {MAX_NAME_LEN}")

    report.top_tables = sorted(report.overview, key=lambda r: -r["bytes"])[:top_n]
    return report


def render_html(report: AssessReport) -> str:
    """S10 — driver-side template render (report.go:1-79 equivalent)."""
    rows = "".join(
        f"<tr><td>{r['table']}</td><td>{r['rows']}</td><td>{r['bytes']}</td>"
        f"<td>{r['columns']}</td><td>{r['indexes']}</td></tr>"
        for r in report.overview
    )
    types = "".join(
        f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in sorted(report.type_distribution.items())
    )
    limits = "".join(f"<li>{x}</li>" for x in report.over_limits) or "<li>none</li>"

    def kind_table(d: dict[str, int]) -> str:
        body = "".join(f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in sorted(d.items()))
        return f'<table border="1"><tr><th>kind</th><th>count</th></tr>{body}</table>'

    objects = "".join(
        f"<tr><td>{r['table']}</td><td>{r['table_type']}</td><td>{r['columns']}</td>"
        f"<td>{r['compatible']}</td><td>{r['convertible']}</td>"
        f"<td>{r['incompatible']}</td><td>{r['verdict']}</td></tr>"
        for r in report.per_object
    )
    return f"""<!DOCTYPE html><html><head><title>Assess {report.schema_name}</title></head>
<body><h1>Schema assessment: {report.schema_name}</h1>
<h2>Compatibility: {report.compatibility_pct}%</h2>
<p>{report.compatible_columns} compatible, {report.convertible_columns} convertible,
{report.incompatible_columns} incompatible columns</p>
<h2>Tables</h2><table border="1">
<tr><th>table</th><th>rows</th><th>bytes</th><th>columns</th><th>indexes</th></tr>{rows}</table>
<h2>Object compatibility</h2><table border="1">
<tr><th>table</th><th>type</th><th>columns</th><th>compatible</th><th>convertible</th>
<th>incompatible</th><th>verdict</th></tr>{objects}</table>
<h2>Object counts</h2>{kind_table(report.object_counts)}
<h2>Constraint kinds</h2>{kind_table(report.constraint_kinds)}
<h2>Index kinds</h2>{kind_table(report.index_kinds)}
<h2>Table types</h2>{kind_table(report.table_types)}
<h2>Type distribution</h2><table border="1"><tr><th>type</th><th>count</th></tr>{types}</table>
<h2>Over-limit findings</h2><ul>{limits}</ul>
</body></html>"""


def assess_to_file(spark: SparkSession, sf_dir: str, out_path: str) -> AssessReport:
    report = assess_schema(spark, sf_dir)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(render_html(report))
    return report
