#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
wall ratios sorted worst-first, flagging superlinear tails.

Usage: scaling_audit.py BENCH_small.json BENCH_big.json [scale_factor]

With scale_factor F (default 10), a query scaling linearly shows ratio
<= ~F; ratios well above F are superlinear suspects, ratios << F are
overhead-bound at the small SF (both worth knowing).
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
f = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qs, qb = small["queries"], big["queries"]
rows = []
for k in sorted(qb):
    if k not in qs or qs[k] <= 0 or qb[k] <= 0:
        continue
    rows.append((qb[k] / qs[k], qs[k], qb[k], k))
rows.sort(reverse=True)
print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query   (scale={f:g}; linear <= ~{f:g})")
for r, s, b, k in rows:
    flag = " <-- SUPERLINEAR" if r > f * 1.5 else (" <- hot" if r > f else "")
    print(f"{r:7.2f} {s:8.2f} {b:8.2f}  {k}{flag}")
tot_s = sum(v for v in qs.values() if v > 0)
tot_b = sum(v for v in qb.values() if v > 0)
print(f"\nboard totals: {tot_s:.1f}s -> {tot_b:.1f}s (x{tot_b/tot_s:.2f})")
fails = big.get("failed", [])
if fails:
    print("FAILED at big SF:", fails)
