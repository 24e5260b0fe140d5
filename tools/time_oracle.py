#!/usr/bin/env python3
"""Time all oracle SQLs in DuckDB over a sf dir: best-of-2 per query,
prints total + per-query JSON + load windows."""
import json, sys, time, os
import duckdb

sfdir, oracle_json = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

sqls = json.load(open(oracle_json))
start_load = load()
per = {}
for name, sql in sqls.items():
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    per[name] = round(best, 4)
total = sum(per.values())
print(json.dumps({"engine": "duckdb", "sf": sfdir, "n": len(per),
                  "total_best2_sec": round(total, 3),
                  "load_start": start_load, "load_end": load(),
                  "slowest10": dict(sorted(per.items(), key=lambda kv: -kv[1])[:10])}))
