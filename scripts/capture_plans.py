"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag-dir> <suffix> [query ...]
Writes plans/<tag-dir>/<query>_<suffix>.txt for each query (default:
the bench list). Driver-side only — no query execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import __spark_entry__ as entry_mod
    from transferdb_spark.session import get_spark

    spark = get_spark("plan-capture")
    qs = entry_mod.queries()
    if not names:
        import bench

        names = [q for q in bench.BENCH_QUERIES if q in qs]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
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
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
