"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01 (or $SPARK_GRAFT_SF_DIR), then compares row count,
sorted column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import tempfile
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import pandas as pd

        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if v is pd.NaT:
            return "\\N"
    except Exception:
        pass
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_signature(df) -> tuple[int, list[str], str]:
    """(#rows, sorted cols, order-insensitive value hash) of a pandas df."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append("\x1f".join(canon_cell(v) for v in tup))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    import __spark_entry__ as entry_mod
    from transferdb_spark.session import get_spark

    argv = sys.argv[1:]
    out_path = ""
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out requires a file path argument")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    t_start = time.time()
    spark = get_spark("correctness-check")

    con = duckdb.connect()
    # cap DuckDB below the Spark JVM's share and give it a spill dir:
    # its default limit (80% of RAM) ignores the co-resident JVM, so a
    # heavy oracle late in the run dies with "failed to allocate"
    # instead of going out-of-core
    spill = tempfile.mkdtemp(prefix="duck_spill_")
    con.execute("SET memory_limit = '24GB'")
    con.execute(f"SET temp_directory = '{spill}'")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    n_run = n_oracled = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — weak check) [{time.time()-t0:.1f}s]")
            continue
        n_oracled += 1
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = frame_signature(sdf)
        on, oc, oh = frame_signature(odf)
        status = "OK   " if (sn, sc, sh) == (on, oc, oh) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
            print(f"{status} {name}: spark=({sn} rows, {sc}) oracle=({on} rows, {oc}) "
                  f"hash {'match' if sh == oh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
            if sn == on and sc == oc:
                import pandas as pd

                s_sorted = sdf[sorted(sdf.columns)]
                o_sorted = odf[sorted(odf.columns)]
                print("  spark head:\n", s_sorted.head(3).to_string())
                print("  oracle head:\n", o_sorted.head(3).to_string())
        else:
            print(f"{status} {name}: {sn} rows [{time.time()-t0:.1f}s]")
    print("FAILURES:", failures)
    if out_path:
        # driver-visible one-line artifact (tail-capture friendly)
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "gate": "oracle_correctness",
                    "sf_dir": SF_DIR,
                    "queries_run": n_run,
                    "oracled": n_oracled,
                    "failures": failures,
                    "seconds": round(time.time() - t_start, 1),
                },
                f,
                separators=(",", ":"),
            )
            f.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
