#!/usr/bin/env python3
"""Compare one (or more) query results against their DuckDB oracle.
Usage: python3 tools/check_one.py <sfdir> <outdir> q98_bigram_lm [q99...]"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
rc = 0
for name in names:
    try:
        got = con.execute(
            f"SELECT * FROM parquet_scan('{outdir}/{name}/*.parquet')").df()
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:300]}"); rc = 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"{name}: COLUMN MISMATCH spark={gc} oracle={wc}"); rc = 1; continue
    g = got[gc].astype(str).sort_values(by=gc).reset_index(drop=True)
    w = want[wc].astype(str).sort_values(by=wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name}: ROWCOUNT spark={len(g)} oracle={len(w)}"); rc = 1; continue
    if not g.equals(w):
        d = (g != w).any(axis=1); i = d.idxmax()
        print(f"{name}: VALUE MISMATCH at row {i}\n  spark : "
              f"{g.iloc[i].to_dict()}\n  oracle: {w.iloc[i].to_dict()}")
        rc = 1; continue
    print(f"{name}: OK ({len(g)} rows)")
sys.exit(rc)
