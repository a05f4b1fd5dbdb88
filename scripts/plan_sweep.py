"""Duplicated-subtree plan sweep over EVERY queries() entry.

The round-9 change-15 detector, promoted to a committed script (the
round-10 entry gate per the round-9 verdict): for each query, build
the DataFrame (no execution) and count in the formatted physical plan

- py:    Python-boundary nodes (ArrowEvalPython / BatchEvalPython /
         MapInPandas / MapInArrow / FlatMapGroupsInPandas)
- imr:   InMemoryRelation / InMemoryTableScan references
- rex:   ReusedExchange nodes
- exch:  Exchange nodes
- dupscan: parquet Scan lines appearing more than once verbatim —
         the same file subtree planned N times (a broadcast self-join
         side can never reuse the other side's shuffle stages, so a
         duplicated scan under a BroadcastExchange means the whole
         input pipeline re-executes per side unless it is persisted)

Flag heuristic (same as round 9): py >= 4 with imr == 0 — a Python
pipeline that executes once per join side/consumer with no cache to
dedup it. dupscan is reported but NOT flagged on its own: a
duplicated plain parquet scan (TPC-H self-reads, rollup arms) is
cheap to recompute and legitimate; it only matters when an expensive
(Python/window) pipeline sits on top, which the py counter catches.

Usage: python scripts/plan_sweep.py [query ...]   (default: all)
Writes a TSV-ish report to stdout; exit 0 always (advisory gate).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_PY_NODES = re.compile(
    r"\b(ArrowEvalPython|BatchEvalPython|MapInPandas|MapInArrow|"
    r"FlatMapGroupsInPandas|FlatMapGroupsInPandasWithState)\b"
)


def main() -> None:
    names = sys.argv[1:]

    import __spark_entry__ as entry_mod
    from transferdb_spark.session import get_spark

    spark = get_spark("plan-sweep")
    qs = entry_mod.queries()
    if not names:
        names = list(qs)

    flagged = []
    for name in names:
        if name not in qs:
            print(f"skip (not in registry): {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = qe.explainString(mode)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            print(f"ERR   {name}: {type(exc).__name__}: {exc}"[:200])
            continue
        py = len(_PY_NODES.findall(plan))
        imr = plan.count("InMemoryTableScan") + plan.count("InMemoryRelation")
        rex = plan.count("ReusedExchange")
        exch = len(re.findall(r"\bExchange\b", plan))
        scans = re.findall(r"Scan parquet[^\n]*", plan)
        dupscan = len(scans) - len(set(scans))
        flag = py >= 4 and imr == 0
        mark = "FLAG" if flag else "ok"
        if flag:
            flagged.append(name)
        print(
            f"{mark:5s} {name:36s} py={py:<3d} imr={imr:<3d} rex={rex:<2d} "
            f"exch={exch:<3d} dupscan={dupscan}"
        )
        # drop any caches the builder itself registered so the sweep
        # doesn't change later queries' plans (imr counts must reflect
        # each query's OWN persists)
        spark.catalog.clearCache()

    print(f"\nSWEPT {len(names)} — flagged: {len(flagged)}")
    for name in flagged:
        print(f"  {name}")


if __name__ == "__main__":
    main()
