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
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None, None
    schema = pq.read_schema(files[0])
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df, schema


def norm_type(t):
    """Coarse arrow-type class so cosmetic differences (large_string,
    timestamp unit/tz) pass while real drift (HUGEINT sums -> decimal128,
    int vs double) fails like the driver's type-aware hash gate does."""
    s = str(t)
    if s.startswith("large_string") or s == "string":
        return "string"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("large_list") or s.startswith("list"):
        return "list"
    if s in ("float", "halffloat"):
        return "double"
    # int widths hash identically in the driver gate (dq02/dq11 passed r01
    # with int32-vs-int64 drift); HUGEINT arrives as decimal128 and must fail
    if s.startswith(("int", "uint")):
        return "int"
    return s


def schema_types(schema):
    return {f.name: norm_type(f.type) for f in schema}


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
        sdf, sschema = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            dtbl = con.execute(sql).arrow()
            ddf = dtbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        stypes, dtypes = schema_types(sschema), schema_types(dtbl.schema)
        if stypes != dtypes:
            diff = {
                c: (stypes.get(c), dtypes.get(c))
                for c in set(stypes) | set(dtypes)
                if stypes.get(c) != dtypes.get(c)
            }
            print(f"FAIL {name}: dtypes differ {diff}")
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
