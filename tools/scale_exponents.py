#!/usr/bin/env python3
"""Dev-only: compute per-query scale exponents from two Bench detail files.

Given the sf0.1 quiet detail line and an sf1 (10x rows) detail line,
prints observed exponent e where t_sf1/t_sf0.1 = 10^e on the warm pass
(warm isolates the data term; cold is dominated by fixed plan+codegen
cost at these scales, which would bias every exponent toward 0).

e <= 1 is at-most-linear in the scaled axis; e > 1 is super-linear and
needs either a fix or a documented bound (VERDICT r11 #2). Queries whose
natural axis does NOT scale 10x with the fact tables (fixed 7-day
windows, dimension-only queries, k-row model outputs) legitimately show
e ~ 0 — the table is evidence FOR pruning, not measurement error.

Usage: python3 tools/scale_exponents.py BENCH_DETAIL_sf01.json BENCH_DETAIL_sf1.json [top_n]
"""
import json, math, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

rows = []
for n, t1 in b["queries_warm"].items():
    t0 = a["queries_warm"].get(n)
    if t0 is None or t0 <= 0 or t1 <= 0:
        continue
    e = math.log10(t1 / t0)
    rows.append((n, t0, t1, e))

# rank by sf1 warm cost: the expensive cells are where super-linearity hurts
rows.sort(key=lambda r: -r[2])
print(f"{'query':<28} {'sf0.1 warm':>10} {'sf1 warm':>9} {'ratio':>6} {'exp':>5}")
sup = []
for n, t0, t1, e in rows[:top_n]:
    flag = " <-- super-linear" if e > 1.05 and t1 > 1.0 else ""
    if flag:
        sup.append(n)
    print(f"{n:<28} {t0:>10.2f} {t1:>9.2f} {t1/t0:>6.2f} {e:>5.2f}{flag}")
print(f"\nsuper-linear (e>1.05, sf1>1s): {sup or 'none'}")
