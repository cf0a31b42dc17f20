#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the raw
tables, sorts columns by name, and compares the multisets of rows.
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out)

fail = ok = 0
for d in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    gcols, grows = got.columns, got.fetchall()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(grows)} rows")
        continue
    exp = con.sql(oracle[name])
    ecols, erows = exp.columns, exp.fetchall()
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
        fail += 1
        continue
    cg, ce = canon(grows, gcols), canon(erows, ecols)
    if cg == ce:
        print(f"  ok {name}: {len(grows)} rows")
        ok += 1
    else:
        fail += 1
        diff_g = [r for r in cg if r not in set(ce)][:3]
        diff_e = [r for r in ce if r not in set(cg)][:3]
        print(f"FAIL {name}: got {len(grows)} rows, expected {len(erows)}")
        print(f"   got-only:  {diff_g}")
        print(f"   exp-only:  {diff_e}")
        print(f"   cols: {sorted(gcols)}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
