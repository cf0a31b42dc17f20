#!/usr/bin/env python3
"""Generate a larger synthetic SF by key-shifted replication of an
existing testdata dir (local tooling; the shipped library never uses
this).

Usage: python3 scripts/gen_scale.py <srcDir> <dstDir> <replicas>

Each fact-table replica r shifts every key column by r*10^9, so
referential integrity (orders.o_custkey -> customer.c_custkey,
lineitem.l_orderkey -> orders.o_orderkey, ...) holds within every
replica and key spaces never collide. Dimension tables (region,
nation) stay fixed, TPC-H style. Embedding vectors get their first
component nudged by r*0.001 so replicated vectors are not exact
duplicates (exact-tie top-k across identical copies would make any
engine's k-th neighbor nondeterministic — a data pathology, not an
engine property). Document text IS exact-copied: 5x planted exact
and near duplicates are a stress test the dedup family must absorb.

Timestamps pass through DuckDB unchanged (micros, naive) — the same
annotation the driver's current generator writes.
"""
import os
import sys

import duckdb

SHIFT = 10 ** 9
# key columns to shift per table; tables absent here are copied once
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["id"],
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    src, dst, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        cols = [c[0] for c in
                con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'")
                .fetchall()]
        if t not in KEYS:
            con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                    f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
            print(f"{t}: copied")
            continue
        parts = []
        for r in range(replicas):
            sel = []
            for c in cols:
                if c in KEYS[t]:
                    sel.append(f"{c} + {r * SHIFT} AS {c}")
                elif t == "embeddings" and c == "embedding":
                    sel.append(
                        f"CAST(list_concat([embedding[1] + {r} * 0.001],"
                        f" embedding[2:]) AS FLOAT[]) AS embedding"
                        if r else c)
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
        q = " UNION ALL ".join(parts)
        con.sql(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {replicas} replicas, {n} rows")


if __name__ == "__main__":
    main()
