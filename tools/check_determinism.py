#!/usr/bin/env python3
"""Dev-only: compare two Verify dump dirs for BIT-IDENTICAL results,
including row order (the two-JVM determinism sweep, VERDICT r12 item #7
at sf1). Each dir comes from an independent JVM running
`runMain graft.Verify <sf_dir> <dir> <queries>`; a query passes only if
its parquet contents stringify identically row-by-row IN ORDER.

Usage: check_determinism.py <dir_a> <dir_b>
"""
import os, sys
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(n for n in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, n)))
fails = 0
for name in names:
    if not os.path.isdir(os.path.join(b_dir, name)):
        print(f"! {name:<24} MISSING in {b_dir}")
        fails += 1
        continue
    rows = []
    for d in (a_dir, b_dir):
        df = con.execute(
            f"SELECT * FROM read_parquet('{d}/{name}/*.parquet')").fetchdf()
        rows.append([tuple(str(v) for v in r)
                     for r in df.itertuples(index=False)])
    if rows[0] == rows[1]:
        print(f"  {name:<24} IDENTICAL rows={len(rows[0])} (incl. order)")
    else:
        fails += 1
        n = min(len(rows[0]), len(rows[1]))
        bad = next((i for i in range(n) if rows[0][i] != rows[1][i]), n)
        print(f"! {name:<24} DIFFERS at row {bad} "
              f"(rows {len(rows[0])} vs {len(rows[1])})")
print(f"\n{len(names)} queries, {fails} differing")
sys.exit(1 if fails else 0)
