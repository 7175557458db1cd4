#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by
graft.Verify), runs the matching oracle SQL from oracle_sql.json in
DuckDB against the same parquet tables, sorts columns by name and rows
by all columns, and compares values (exact for non-floats, tiny-eps
report for floats so rounding gaps surface).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    n_pass = n_fail = n_noracle = 0
    for name in names:
        res_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{res_glob}')").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"---- {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # driver-style: sort columns by name, then rows by all columns
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: {len(got)} rows != {len(exp)} rows")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], exp[c])):
                af, bf = norm(a), norm(b)
                if isinstance(af, float) or isinstance(bf, float):
                    an, bn = (af != af), (bf != bf)  # NaN checks
                    if an and bn:
                        continue
                    if an != bn or af != bf:
                        bad.append((c, i, a, b))
                else:
                    if str(a) != str(b):
                        bad.append((c, i, a, b))
                if len(bad) > 3:
                    break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ mismatches, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
