#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables,
compare row counts, schemas (column names) and sorted values.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    return sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            want = con.sql(sql).df()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            if sorted(got.columns) != sorted(want.columns):
                print(f"FAIL {name}: cols got={sorted(got.columns)} want={sorted(want.columns)}")
                n_fail += 1; continue
            cg, cw = canon(got), canon(want)
            if len(cg) != len(cw):
                print(f"FAIL {name}: rows got={len(cg)} want={len(cw)}"); n_fail += 1; continue
            if cg != cw:
                diffs = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
                print(f"FAIL {name}: value mismatch at sorted rows {diffs}")
                for i in diffs[:1]:
                    print(f"  got : {cg[i][:200]}")
                    print(f"  want: {cw[i][:200]}")
                n_fail += 1; continue
            print(f"PASS {name} ({len(cg)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
