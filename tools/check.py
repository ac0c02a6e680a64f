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
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=3600)
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

# --- manifest gate -----------------------------------------------------
# graft.Verify writes manifest.json with one row per catalog entry it
# attempted ({"name": {"ok": bool, "error": str?}}). Round 14 showed why
# this must be load-bearing: one entry's output silently vanished from the
# artifact (142 keys vs a 143-entry catalog) and every layer above still
# read "all green". Refuse to pass unless the manifest exists, covers
# every oracle entry, and reports ok for each attempted entry.
manifest_fails = []
mpath = f"{out}/manifest.json"
if not os.path.exists(mpath):
    print(f"FAIL manifest: {mpath} missing — Verify did not complete "
          "(or predates the manifest gate); rerun without --skip-verify")
    manifest_fails.append("manifest-missing")
    manifest = {}
else:
    manifest = json.load(open(mpath))
    expect = set(only) if only else set(oracle.keys())
    missing = expect - set(manifest.keys())
    if missing:
        print(f"FAIL manifest: {len(missing)} catalog entr{'y' if len(missing)==1 else 'ies'} "
              f"never attempted: {sorted(missing)[:10]}")
        manifest_fails.append("manifest-incomplete")
    for name, row in sorted(manifest.items()):
        if only and name not in only:
            continue
        if not row.get("ok"):
            print(f"FAIL manifest: {name} errored in Verify: {row.get('error','?')[:200]}")
            manifest_fails.append(name)
        elif not glob.glob(f"{out}/{name}/*.parquet"):
            print(f"FAIL manifest: {name} reported ok but wrote no parquet output")
            manifest_fails.append(name)

# Entries in the manifest with no oracle SQL (non-SQL-expressible ops) get
# the weaker rows-only check the driver applies: output exists, rows > 0.
for name in sorted(set(manifest.keys()) - set(oracle.keys())):
    if only and name not in only:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
    if n <= 0:
        print(f"FAIL {name}: rows-only check, {n} rows")
        manifest_fails.append(name)
    else:
        print(f"OK   {name} (rows-only, {n} rows)")

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
    if name not in oracle:
        if name in manifest:
            continue  # rows-only entry, already checked above
        print(f"FAIL {name}: not in the catalog (unknown query name)")
        fails.append(name)
        continue
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

print(f"\n{len(names)-len(fails)}/{len(names)} queries match"
      + (f"; {len(manifest_fails)} manifest failure(s)" if manifest_fails else ""))
sys.exit(1 if fails or manifest_fails else 0)
