#!/usr/bin/env python3
"""Partition-count-independence check: compare two Verify output dirs
(e.g. SPARK_GRAFT_CPUS=1 vs 32) as per-query row multisets."""
import sys, glob, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
bad = ok = 0
for d in sorted(glob.glob(os.path.join(a, "*"))):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    other = os.path.join(b, name)
    if not os.path.isdir(other):
        print(f"  MISSING {name} in {b}"); bad += 1; continue
    ra = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    rb = con.sql(f"SELECT * FROM '{other}/*.parquet'")
    ca, cb = ra.columns, rb.columns
    if sorted(ca) != sorted(cb):
        print(f"  SCHEMA {name}: {ca} vs {cb}"); bad += 1; continue
    oa = sorted(tuple(repr(v) for v in row) for row in ra.fetchall())
    ob_rows = rb.fetchall()
    # align column order to a's
    idx = [cb.index(c) for c in ca]
    ob = sorted(tuple(repr(row[i]) for i in idx) for row in ob_rows)
    if oa != ob:
        print(f"  DIFF {name}: {len(oa)} vs {len(ob)} rows"); bad += 1
    else:
        ok += 1
print(f"{ok} identical, {bad} different")
