#!/usr/bin/env python3
"""Compare a graft.Verify dump against the DuckDB oracle, row-exact.

Usage: oracle_compare.py <sfDir> <verifyOutDir> [query ...]
Prints PASS/FAIL per query (rows, schema, and sorted full-value match).
"""
import sys, json, math
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
sql = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

def canon(df):
    # normalize column names order preserved; sort rows by string repr
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    return sorted(rows)

fails = 0
for name in sorted(sql):
    if only and name not in only:
        continue
    try:
        oracle = con.sql(sql[name]).df()
        got = duckdb.sql(f"select * from '{out}/{name}/*.parquet'").df()
        ok_rows = len(oracle) == len(got)
        ok_cols = list(oracle.columns) == list(got.columns)
        ok_vals = canon(oracle) == canon(got) if ok_rows and ok_cols else False
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name} rows={len(got)}/{len(oracle)} cols_ok={ok_cols} vals_ok={ok_vals}")
        if status == "FAIL" and ok_cols and ok_rows:
            a, b = canon(oracle), canon(got)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diff:
                print(f"   oracle: {x[:160]}\n   got:    {y[:160]}")
    except Exception as e:
        fails += 1
        print(f"FAIL {name} error: {e}")
print(f"{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
