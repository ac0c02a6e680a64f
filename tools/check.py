#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given sf dir, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row counts, sorted column names, and value hashes.

Usage: python tools/check.py [sfDir] [outDir] [--skip-verify] [only_query ...]
"""
import json, math, sys, subprocess, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
rest = sys.argv[3:]
skip_verify = "--skip-verify" in rest
only = [a for a in rest if not a.startswith("--")]

if not skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb, pandas as pd

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = []
names = only if only else sorted(oracle.keys())
for name in names:
    sql = oracle[name]
    pdir = f"{out}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fails.append(name); continue
    a, b = canon(spark_df), canon(duck_df)
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"FAIL {name}: cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails.append(name)
    elif a != b:
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        onlya = [r for r in a if r not in set(map(tuple, b))][:3]
        onlyb = [r for r in b if r not in set(map(tuple, a))][:3]
        for x, y in diff: print(f"   spark={x}\n    duck={y}")
        if onlya: print(f"   only-spark: {onlya}")
        if onlyb: print(f"   only-duck:  {onlyb}")
        fails.append(name)
    else:
        print(f"OK   {name} ({len(a)} rows)")

print(f"\n{len(names)-len(fails)}/{len(names)} queries match")
sys.exit(1 if fails else 0)
