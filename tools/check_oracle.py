#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB over the same parquet tables and diff per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact, like a hash compare would be
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(a)):
            for c in a.columns:
                x, y = a.at[i, c], b.at[i, c]
                try:
                    ok = cells_equal(x, y)
                except Exception:
                    ok = str(x) == str(y)
                if not ok:
                    bad = (i, c, x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duckdb={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
