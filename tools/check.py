#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run graft.Verify at a given
SF, then execute each oracle SQL in DuckDB over the same tables and
compare values exactly (columns sorted by name, rows sorted), mirroring
the driver's hash-compare. Dev tooling only — not part of the library.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, math, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import duckdb
import pandas as pd

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cmp(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    # dtype-KIND parity: the driver's hash is dtype-sensitive, so a DuckDB
    # HUGEINT surfacing as float64 against Spark's int64 is a driver red
    # even when every value compares equal (q115 was red two rounds on
    # exactly this while this script showed green — 1 == 1.0). CAST such
    # oracle columns to BIGINT.
    for c in a.columns:
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if ak != bk and not (a[c].isna().all() and b[c].isna().all()):
            return f"DTYPE col {c}: spark {a[c].dtype} vs oracle {b[c].dtype}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = ((av == bv) | (av.isna() & bv.isna())).all()
                if not ok:
                    d = (av - bv).abs().max()
                    return f"VALUES col {c} maxdiff={d}"
            else:
                if not ((av.astype(object) == bv.astype(object)) |
                        (av.isna() & bv.isna())).all():
                    i = (av.astype(object) != bv.astype(object)).idxmax()
                    return f"VALUES col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
        except Exception as e:
            return f"COMPARE-ERROR col {c}: {e}"
    return None

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    fails = 0
    import glob, os
    names = sorted(os.listdir(OUT))
    for name in names:
        if not os.path.isdir(f"{OUT}/{name}"):
            continue
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"  {name}: NO-OUTPUT"); fails += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows){' FAIL' if len(sdf)==0 else ''}")
            if len(sdf) == 0: fails += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  {name}: ORACLE-ERROR {e}"); fails += 1; continue
        r = cmp(name, sdf, ddf)
        if r: print(f"  {name}: FAIL {r}"); fails += 1
        else: print(f"  {name}: OK ({len(sdf)} rows)")
    for name in oracles:
        if name not in names:
            print(f"  {name}: MISSING SPARK OUTPUT"); fails += 1
    print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    sys.exit(1 if fails else 0)

main()
