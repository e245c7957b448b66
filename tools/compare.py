#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Emulates the driver's comparison path as closely as possible:
  - Spark side: the parquet dumped by graft.Verify, read via
    pyarrow→pandas (DECIMAL columns arrive as exact decimal.Decimal
    objects, which stringify WITH trailing zeros);
  - oracle side: DuckDB .df() (DECIMAL columns arrive as float64).
Columns are sorted by name, rows sorted, values stringified and
compared. This is exactly the mismatch surface that produced the r1
"hash_match: false" cluster, so a local OK here predicts driver green.
"""
import duckdb, json, sys, glob, math, datetime
import pandas as pd

# optional --json=PATH writes the driver-schema correctness artifact
# (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err per op)
# so the corpus-scale sweeps (CORRECTNESS_sf1/sf3) regenerate at HEAD by
# one command each round instead of living as hand-rolled artifacts.
json_out = None
args = []
for a in sys.argv[1:]:
    if a.startswith("--json="):
        json_out = a.split("=", 1)[1]
    else:
        args.append(a)
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
only = set(args[2].split(",")) if len(args) > 2 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def cell(v):
    # mirror pandas str() rendering differences instead of hiding them.
    # Exception: DATE columns — Spark parquet yields datetime.date while
    # DuckDB .df() yields midnight datetime64, and the r1 driver run
    # hash-matched that pairing, so its hasher coerces datetimes; match it.
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"{v} 00:00:00"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)

def canon(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(cell(v) for v in r) for r in df.itertuples(index=False))
    return list(df.columns), rows

fails = 0
report = {}
def rec(name, sm=False, hm=False, sr=0, orr=0, err=None):
    report[name] = {"rows_match": sr == orr and err is None,
                    "schema_match": sm, "hash_match": hm,
                    "spark_rows": sr, "oracle_rows": orr, "err": err}
for name in sorted(oracle):
    if only and name not in only:
        continue
    path = f"{out_dir}/{name}"
    if not glob.glob(f"{path}/*.parquet"):
        print(f"MISSING  {name}"); fails += 1
        rec(name, err="missing spark dump"); continue
    try:
        gdf = pd.read_parquet(path)           # Spark side: Decimal objects
        edf = con.execute(oracle[name]).df()  # oracle side: float64
    except Exception as e:
        print(f"ERR      {name}: {e}"); fails += 1
        rec(name, err=str(e)[:200]); continue
    gc, gr = canon(gdf); ec, er = canon(edf)
    if gc != ec:
        print(f"SCHEMA   {name}: spark={gc} duckdb={ec}"); fails += 1
        rec(name, sr=len(gr), orr=len(er)); continue
    if len(gr) != len(er):
        print(f"ROWCOUNT {name}: spark={len(gr)} duckdb={len(er)}"); fails += 1
        rec(name, sm=True, sr=len(gr), orr=len(er)); continue
    if gr != er:
        bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
        print(f"VALUES   {name}: first diffs {bad}"); fails += 1
        rec(name, sm=True, sr=len(gr), orr=len(er)); continue
    print(f"OK       {name} ({len(gr)} rows)")
    rec(name, sm=True, hm=True, sr=len(gr), orr=len(er))
if json_out:
    with open(json_out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(f"wrote {json_out}: {sum(1 for v in report.values() if v['hash_match'])}/{len(report)} hash-green")
sys.exit(1 if fails else 0)
