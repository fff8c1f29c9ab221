#!/usr/bin/env python3
"""Dev-only: time each oracle SQL at a given SF without needing Spark dumps.

Runs every entry of an oracle_sql.json against DuckDB views over <sf_dir>,
with a per-oracle budget; prints name + wall time (or TIMEOUT). Used to
identify which oracles blow the budget at a large SF before reformulating
them (VERDICT r12 item #1).

Usage: time_oracles.py <sf_dir> <oracle_sql.json> [budget_sec] [only_prefix]
"""
import json, sys, threading, time
import duckdb

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
only = sys.argv[4] if len(sys.argv) > 4 else ""

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(oracle_path))
slow = []
for name in sorted(oracle):
    if only and not name.startswith(only):
        continue
    box = {"done": False, "err": None}
    def run():
        try:
            con.execute(oracle[name]).fetchall()
            box["done"] = True
        except Exception as e:
            box["err"] = e
    t0 = time.time()
    th = threading.Thread(target=run)
    th.start()
    th.join(budget)
    if th.is_alive():
        con.interrupt()
        th.join()
        slow.append(name)
        print(f"TIMEOUT {name} >{budget:.0f}s", flush=True)
        continue
    dt = time.time() - t0
    tag = "ok" if box["done"] else f"ERR {box['err']}"
    print(f"{dt:7.1f}s {name} {tag}", flush=True)
print(f"\nslow ({len(slow)}): {slow}")
