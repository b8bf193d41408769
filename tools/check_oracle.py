#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run each oracle_sql.json
entry in DuckDB over views named after the fixture parquet tables, load the
Spark parquet dump for the same query, and compare schema + values exactly
(column order normalized by sorting names, like the driver's hash compare).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        la, lb = list(a), list(b)
        if len(la) != len(lb):
            return False
        return all(cell_eq(x, y) for x, y in zip(la, lb))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(want)):
            for c in want.columns:
                a, b = want[c].iloc[i], got[c].iloc[i]
                if not cell_eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            # dtype note (informational; driver may or may not check types)
            dt = [(c, str(want[c].dtype), str(got[c].dtype))
                  for c in want.columns if str(want[c].dtype) != str(got[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(want)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
