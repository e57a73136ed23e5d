"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark at sf0.01 and its oracle_sql() on DuckDB over
the same parquet, compare row count + schema + order-insensitive value
hash. Usage: python tools/check_oracles.py [--sf DIR] [--only name,...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            elif isinstance(v, (list, tuple)):
                v = "[" + ",".join(str(x) for x in v) + "]"
            vals.append(str(v))
        norm.append("|".join(vals))
    norm.sort()
    return hashlib.sha256("\n".join(norm).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from distributed_gpu_lsh_using_sycl_spark.sources.tables import get_spark

    spark = get_spark("check-oracles", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.only.split(",") if args.only else list(qs)
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name:28s} spark error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt_spark = time.perf_counter() - t0
        if name not in oracles:
            print(f"ROWS  {name:28s} rows={len(srows):7d} (no oracle) "
                  f"[{dt_spark:5.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name:28s} duckdb error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(dcols)
        sh = value_hash(srows, [c.lower() for c in scols])
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(f"{status}  {name:28s} rows={len(srows):7d}/{len(drows):<7d} "
              f"schema={'=' if ok_schema else '!'} hash={'=' if ok_hash else '!'} "
              f"[{dt_spark:5.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_schema:
                # show a couple of differing rows for debugging
                sset = {r for r in map(tuple, srows)}
                dset = {r for r in map(tuple, drows)}
                print("    spark-only:", list(sset - dset)[:2])
                print("    duck-only :", list(dset - sset)[:2])
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
