"""Physical-plan antipattern lint over EVERY queries() entry.

Correctness gates prove every query returns the right rows at
sf0.01; this lint proves none of them carries a plan shape that dies
at 100 TB. For each query it builds the DataFrame (no execution) and
scans the formatted physical plan for:

HARD flags (exit 1 — these are scale killers, no exceptions):
- CartesianProduct        unbucketed all-pairs join (scalar 1-row
                          cross joins compile to BroadcastNestedLoop,
                          so any CartesianProduct left is a real one)
- BatchEvalPython         row-at-a-time Python UDF on the data path
                          (Arrow variants show as ArrowEvalPython /
                          MapInPandas / FlatMapGroupsInPandas)

SOFT flags (reported, non-fatal — legitimate for tiny/final stages,
suspicious in the middle of a big plan):
- Exchange SinglePartition feeding a Window/Sort — a global
  single-partition funnel; fine for a final scalar/limit, fatal for a
  per-row window over a big table.

Usage:
    python scripts/plan_lint.py            # lint all queries
    python scripts/plan_lint.py q1 q5 ...  # lint a subset
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

HARD = ("CartesianProduct", "BatchEvalPython")

# Queries whose soft flag is the OPERATOR'S SEMANTICS, with the
# production alternative named — reported as 'allow', never failing.
SOFT_ALLOW = {
    # ntile over a total order IS a global sort; the scale path is
    # two-phase range-partitioned ranking (range-partition boundaries
    # from approx quantiles + per-partition offsets), which changes
    # the exact equal-count tie behavior the oracle pins.
    "ntile_customer_quartiles": "global ntile by definition",
}


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def soft_single_partition_window(plan: str) -> bool:
    """Exchange SinglePartition directly feeding a Window — the
    global-funnel shape (a windowed computation squeezed through one
    partition).

    Formatted explain puts partitioning in each node's DETAIL block
    ('(4) Exchange / Arguments: SinglePartition, ...'), not on the tree
    line, so: collect the node ids of SinglePartition Exchanges from
    the details, then look for a tree line 'Window (n)' whose immediate
    child line is one of those Exchanges."""
    single_ids = set()
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) Exchange\b", block.strip())
        if m and "SinglePartition" in block:
            single_ids.add(m.group(1))
    if not single_ids:
        return False
    tree = plan.split("\n\n(")[0].splitlines()
    for i, line in enumerate(tree):
        if re.search(r"\bWindow(?:GroupLimit)? \(\d+\)", line):
            # a Sort always sits between the Window and its Exchange —
            # look through the next two tree lines
            for j in (i + 1, i + 2):
                if j < len(tree):
                    m = re.search(r"Exchange \((\d+)\)", tree[j])
                    if m and m.group(1) in single_ids:
                        return True
    return False


def main() -> int:
    import __spark_entry__ as entry

    from transferdb_spark.session import get_spark

    import time as _time

    t_start = _time.time()
    argv = sys.argv[1:]
    out_path = ""
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out requires a file path argument")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    spark = get_spark("plan-lint")
    qs = entry.queries()
    names = argv or list(qs)

    hard_hits: dict[str, list[str]] = {}
    soft_hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            plan = plan_of(qs[name](spark, SF_DIR))
        except Exception as exc:  # noqa: BLE001 — lint every query
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        # scan the WHOLE plan, not just the first tree: formatted
        # explain renders subquery plans as separate trees after the
        # main details, and a cartesian/row-Python node inside a
        # subquery is just as fatal. The HARD names are physical node
        # names — they appear nowhere else in a formatted plan.
        hard = [h for h in HARD if h in plan]
        soft = []
        if soft_single_partition_window(plan):
            if name in SOFT_ALLOW:
                print(f"allow {name}  SinglePartitionWindow ({SOFT_ALLOW[name]})")
            else:
                soft.append("SinglePartitionWindow")
        if hard:
            hard_hits[name] = hard
        if soft:
            soft_hits[name] = soft
        status = "HARD" if hard else ("soft" if soft else "ok")
        print(f"{status:5s} {name}" + (f"  {hard + soft}" if hard or soft else ""))

    print(
        f"\nLINTED {len(names) - len(errors)}/{len(names)} "
        f"HARD: {len(hard_hits)} soft: {len(soft_hits)} errors: {len(errors)}"
    )
    for n, e in errors.items():
        print(f"ERROR {n}: {e}")
    for n, f in hard_hits.items():
        print(f"HARD  {n}: {f}")
    if out_path:
        # driver-visible one-line artifact (tail-capture friendly)
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "gate": "plan_lint",
                    "linted": len(names) - len(errors),
                    "total": len(names),
                    "hard": len(hard_hits),
                    "soft": len(soft_hits),
                    "errors": len(errors),
                    "seconds": round(_time.time() - t_start, 1),
                },
                f,
                separators=(",", ":"),
            )
            f.write("\n")
    return 1 if hard_hits or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
