#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the parquet dumped by Verify.
Exact value compare after sorting columns by name and rows by content."""
import duckdb, json, sys, glob, os, math
from decimal import Decimal

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not glob.glob(f"{path}/*.parquet"):
        print(f"MISSING  {name}"); fails += 1; continue
    got = con.execute(f"SELECT * FROM '{path}/*.parquet'")
    gcols = [d[0] for d in got.description]; grows = got.fetchall()
    try:
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fails += 1; continue
    gc, gr = canon(gcols, grows); ec, er = canon(ecols, erows)
    if gc != ec:
        print(f"SCHEMA   {name}: spark={gc} duckdb={ec}"); fails += 1; continue
    if len(gr) != len(er):
        print(f"ROWCOUNT {name}: spark={len(gr)} duckdb={len(er)}"); fails += 1; continue
    if gr != er:
        bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
        print(f"VALUES   {name}: first diffs {bad}"); fails += 1; continue
    print(f"OK       {name} ({len(gr)} rows)")
sys.exit(1 if fails else 0)
