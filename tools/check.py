"""Driver-mimic correctness checker: run each __spark_entry__.queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet, then compare
row count, schema (column names), and an order-insensitive value hash.

Usage:
    PYTHONPATH=/root/repo python tools/check.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif "float" in str(s.dtype):
            df[c] = s.round(6).map(lambda x: f"{x:.6f}")
        elif "datetime" in str(s.dtype):
            df[c] = s.astype(str)
        else:
            df[c] = s.astype(str)
    rows = ["\x1f".join(r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    else:
        sf = SF_DIR
    args = [a for a in argv if not a.startswith("--")]

    import __spark_entry__ as entry_mod
    from variant_load_pipeline_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK ERROR: {str(ex)[:400]}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (rows-only check, no oracle) "
                  f"[spark {t_spark:.1f}s]")
            n_pass += 1
            continue
        t0 = time.time()
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name}: DUCKDB ERROR: {str(ex)[:400]}")
            n_fail += 1
            continue
        t_duck = time.time() - t0
        sc, scols, sh = canon(sdf)
        dc, dcols, dh = canon(ddf)
        ok = (sc == dc) and (scols == dcols) and (sh == dh)
        status = "OK " if ok else "FAIL"
        print(
            f"{name}: {status} rows {sc}/{dc} hash {sh}/{dh} "
            f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
        )
        if not ok:
            n_fail += 1
            if scols != dcols:
                print(f"  cols spark={scols}\n  cols duck ={dcols}")
            else:
                sdfs = sdf[sorted(sdf.columns)].astype(str)
                ddfs = ddf[sorted(ddf.columns)].astype(str)
                m = sdfs.merge(ddfs, how="outer", indicator=True)
                diff = m[m["_merge"] != "both"]
                print(diff.head(6).to_string())
        else:
            n_pass += 1
    print(f"== {n_pass} ok, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
