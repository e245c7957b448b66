#!/usr/bin/env python3
"""Per-op scale-up analysis: sf0.1 committed detail vs the sf1 (10x)
sweep detail. Prints ops whose spark_s grew by more than the given
factor (default 4x on a >=0.5s sf1 time) -- the verdict's test is that
throughput ops scale <=~2x per 10x thanks to constant amortization,
so anything well above that is a real scale smell, not a constant."""
import json, sys

a = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"))
b = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL_sf1.json"))
lim = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
rows = []
for op, m in b["ops"].items():
    s1 = m.get("spark_s", -1); s0 = a["ops"].get(op, {}).get("spark_s", -1)
    if s0 and s0 > 0 and s1 > 0:
        rows.append((s1 / s0, s0, s1, op))
rows.sort(reverse=True)
print(f"{'op':32s} {'sf0.1':>7s} {'sf1':>7s} {'x':>6s}")
grown = 0
for f, s0, s1, op in rows:
    flag = " <-- exceeds" if (f > lim and s1 >= 0.5) else ""
    if f > lim and s1 >= 0.5: grown += 1
    if f > 2.0 or flag:
        print(f"{op:32s} {s0:7.2f} {s1:7.2f} {f:6.2f}{flag}")
import statistics
fs = [f for f, *_ in rows]
print(f"\nmedian scale factor {statistics.median(fs):.2f}x over {len(rows)} ops; "
      f"{grown} exceed {lim}x on a >=0.5s sf1 time")
print("totals:", a.get("total_s"), "->", b.get("total_s"),
      "duckdb:", a.get("duckdb_total"), "->", b.get("duckdb_total"))
