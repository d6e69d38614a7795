#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by `graft.Verify <sfDir> <outDir>`, run the oracle SQL in
DuckDB over the same tables and compare (columns sorted by name, rows
sorted, exact values)."""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) or None

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = ok = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    if only and name not in only:
        continue
    got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracles:
        print(f"  [rows-only] {name}: rows={len(got)}")
        continue
    try:
        want = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails += 1
        continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        fails += 1
        continue
    # value compare: stringify (hash-style strictness)
    import pandas as pd
    diff = None
    for c in gc:
        a, b = g[c].astype(str), w[c].astype(str)
        neq = a != b
        if neq.any():
            i = neq.idxmax()
            diff = (c, i, a[i], b[i])
            break
    if diff:
        print(f"FAIL {name}: col={diff[0]} row={diff[1]} got={diff[2]!r} want={diff[3]!r}")
        fails += 1
    else:
        print(f"  ok  {name}: rows={len(g)}")
        ok += 1
print(f"\n{ok} ok, {fails} failed")
sys.exit(1 if fails else 0)
