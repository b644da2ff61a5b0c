#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

NOT part of the shipped library (the engine is pure Scala/Spark) — this
script only validates, before each round, that every SparkEntry.oracleSql
matches the Spark result the way the driver will check it:
  sbt "runMain graft.Verify <sfDir> <outDir>"  then  python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize dtypes to strings for robust compare
    return df.astype(str)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"  {name}: rows={len(got)} (no oracle — rows-only)")
            n_noracle += 1
            if len(got) == 0: print(f"    WARNING: zero rows")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"  {name}: SCHEMA MISMATCH spark={list(g.columns)} duck={list(w.columns)}")
            n_bad += 1
        elif len(g) != len(w):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}")
            n_bad += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"  {name}: VALUE MISMATCH ({diff.sum()} rows)")
            print("    spark:", g[diff].head(3).to_dict("records"))
            print("    duck :", w[diff].head(3).to_dict("records"))
            n_bad += 1
        else:
            print(f"  {name}: OK rows={len(g)}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_noracle} rows-only ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
