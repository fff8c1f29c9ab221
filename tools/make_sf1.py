#!/usr/bin/env python3
"""Dev-only: synthesize an sf1-equivalent table dir (10x sf0.1) for the
full-suite scale sweep (VERDICT r11 next-round item #2).

Facts (orders, lineitem, events, documents) are replicated 10x with
primary ids shifted by a 1e8 stride per replica — referential integrity
holds because l_orderkey shifts with o_orderkey while custkey/user_id
stay in the 1x dimension range. Dimensions (region..part) and
embeddings stay 1x: replicating identical embedding vectors would
create exact cosine TIES whose top-k ordering is engine-dependent,
poisoning the hash compare with nondeterminism that says nothing about
scale. Document TEXT is replicated verbatim, which makes the corpus
10x exact-duplicate-heavy — deliberately adversarial for the dedup
family (hot LSH buckets, giant dup clusters) but NOTE: pairwise DuckDB
oracles over documents grow quadratically in the duplicate factor, so
the oracle side of the sweep is far slower than the engine side.

Usage: python3 tools/make_sf1.py [src_sf_dir] [out_dir] [replicas]
"""
import sys, os, shutil
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
repl = int(sys.argv[3]) if len(sys.argv) > 3 else 10
S = 100_000_000  # id stride per replica; > any 1x key

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
specs = {
    "orders": f"SELECT o_orderkey + i*{S} AS o_orderkey, o_custkey, o_orderstatus,"
              f" o_totalprice, o_orderdate, o_orderpriority"
              f" FROM read_parquet('{src}/orders.parquet'), range({repl}) t(i)",
    "lineitem": f"SELECT l_orderkey + i*{S} AS l_orderkey, l_partkey, l_suppkey,"
                f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
                f" l_returnflag, l_linestatus, l_shipdate"
                f" FROM read_parquet('{src}/lineitem.parquet'), range({repl}) t(i)",
    "events": f"SELECT event_id + i*{S} AS event_id, ts, user_id, event_type,"
              f" value, props"
              f" FROM read_parquet('{src}/events.parquet'), range({repl}) t(i)",
    "documents": f"SELECT doc_id + i*{S} AS doc_id, text, lang, source, n_chars"
                 f" FROM read_parquet('{src}/documents.parquet'), range({repl}) t(i)",
}
for t, q in specs.items():
    con.sql(f"COPY ({q} ORDER BY 1) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(t, n)
for t in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
    print(t, "copied 1x")
