#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff per query."""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fail += 1; continue
    spark = con.execute(
        f"select * from read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark)} rows)")
        continue
    duck = con.execute(oracle[name]).fetchdf()
    # driver-style compare: sort columns by name, then row-sort, then diff
    sc = spark[sorted(spark.columns)].sort_values(sorted(spark.columns)).reset_index(drop=True)
    dc = duck[sorted(duck.columns)].sort_values(sorted(duck.columns)).reset_index(drop=True)
    if list(sc.columns) != list(dc.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(sc.columns)} duck={list(dc.columns)}")
        fail += 1
        continue
    if len(sc) != len(dc):
        print(f"{name}: ROWCOUNT {len(sc)} vs {len(dc)}"); fail += 1; continue
    # normalize dtypes to strings for comparison
    eq = sc.astype(str).equals(dc.astype(str))
    if eq:
        print(f"{name}: OK ({len(sc)} rows)")
    else:
        diff = (sc.astype(str) != dc.astype(str)).any(axis=1)
        print(f"{name}: VALUE MISMATCH in {int(diff.sum())}/{len(sc)} rows")
        idx = diff[diff].index[:3]
        for i in idx:
            print("  spark:", dict(sc.iloc[i]))
            print("  duck :", dict(dc.iloc[i]))
        fail += 1
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
