#!/usr/bin/env python3
"""Dev-only: compute per-query scale exponents from Bench detail files.

Two-point mode (sf0.1 + sf1): prints observed exponent e where
t_sf1/t_sf0.1 = 10^e on the warm pass (warm isolates the data term;
cold is dominated by fixed plan+codegen cost at these scales, which
would bias every exponent toward 0).

Three-point mode (sf0.1 + sf1 + sf3, VERDICT r12 item #3): two-point
fits cannot distinguish linear from n*log n, nor catch a late-onset
quadratic. With a third scale the script fits log t ~ e*log n by least
squares AND compares the segment exponents e1 (sf0.1->sf1) vs e2
(sf1->sf3): a cell whose e2 exceeds both 1.05 and e1+0.15 is curving
UP (accelerating with scale) and is verdicted super-linear even if the
aggregate fit looks tame. Verdicts: 'linear' (fit <= 1.05, no upward
curvature), 'log-linear' (fit <= 1.25, mild curvature — the n*log n
band), 'super-linear' otherwise.

e <= 1 is at-most-linear in the scaled axis. Queries whose natural axis
does NOT scale with the fact tables (fixed 7-day windows,
dimension-only queries, k-row model outputs) legitimately show e ~ 0 —
the table is evidence FOR pruning, not measurement error.

Usage: scale_exponents.py DETAIL_sf01.json DETAIL_sf1.json [DETAIL_sf3.json] [top_n]
  (scales are inferred from the files' "sf" fields via their trailing
   multiplier; pass files smallest-scale first)
"""
import json, math, sys

args = [a for a in sys.argv[1:]]
top_n = 40
if args and args[-1].isdigit():
    top_n = int(args.pop())
files = [json.load(open(a)) for a in args]

# relative data scales: sf0.1 -> 1x, sf1 -> 10x, sf3 -> 30x
REL = {"sf0.1": 1.0, "sf1": 10.0, "sf3": 30.0}
def rel_scale(detail):
    sf = detail.get("sf", "")
    for k, v in REL.items():
        if sf.rstrip("/").endswith(k):
            return v
    raise SystemExit(f"cannot infer scale from sf={sf!r}; expected one of {list(REL)}")

scales = [rel_scale(d) for d in files]
assert scales == sorted(scales), "pass files smallest scale first"

def fit(xs, ys):
    """least-squares slope of log y on log x"""
    lx = [math.log10(x) for x in xs]
    ly = [math.log10(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den

rows = []
for n, t_last in files[-1]["queries_warm"].items():
    ts = [d["queries_warm"].get(n) for d in files]
    if any(t is None or t <= 0 for t in ts):
        continue
    if len(files) == 2:
        e = math.log10(ts[1] / ts[0]) / math.log10(scales[1] / scales[0])
        rows.append((n, ts, e, None, None, None))
    else:
        e_fit = fit(scales, ts)
        e1 = math.log10(ts[1] / ts[0]) / math.log10(scales[1] / scales[0])
        e2 = math.log10(ts[2] / ts[1]) / math.log10(scales[2] / scales[1])
        if e_fit <= 1.05 and not (e2 > 1.05 and e2 > e1 + 0.15):
            verdict = "linear"
        elif e_fit <= 1.25 and e2 <= max(e1 + 0.25, 1.15):
            verdict = "log-linear"
        else:
            verdict = "super-linear"
        rows.append((n, ts, e_fit, e1, e2, verdict))

# rank by largest-scale warm cost: expensive cells are where super-linearity hurts
rows.sort(key=lambda r: -r[1][-1])
sup = []
if len(files) == 2:
    print(f"{'query':<28} {'sf0.1 warm':>10} {'sf1 warm':>9} {'ratio':>6} {'exp':>5}")
    for n, ts, e, _, _, _ in rows[:top_n]:
        flag = " <-- super-linear" if e > 1.05 and ts[-1] > 1.0 else ""
        if flag:
            sup.append(n)
        print(f"{n:<28} {ts[0]:>10.2f} {ts[1]:>9.2f} {ts[1]/ts[0]:>6.2f} {e:>5.2f}{flag}")
else:
    print(f"{'query':<28} " + " ".join(f"{'t@%gx' % s:>8}" for s in scales) +
          f" {'e_fit':>6} {'e1':>5} {'e2':>5}  verdict")
    for n, ts, e_fit, e1, e2, verdict in rows[:top_n]:
        flag = " <--" if verdict == "super-linear" and ts[-1] > 1.0 else ""
        if flag:
            sup.append(n)
        print(f"{n:<28} " + " ".join(f"{t:>8.2f}" for t in ts) +
              f" {e_fit:>6.2f} {e1:>5.2f} {e2:>5.2f}  {verdict}{flag}")
print(f"\nsuper-linear (cost > 1s at top scale): {sup or 'none'}")
