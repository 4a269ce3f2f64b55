#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the parquet tables in
<sfDir>, loads the Spark result parquet from <verifyOutDir>/<name>, sorts
columns by name and rows by value, and compares.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        try:
            oracle = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in
                               glob.glob(spark_dir + "/*.parquet")],
                              ignore_index=True))
        if list(got.columns) != list(oracle.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(oracle.columns)}")
            n_bad += 1; continue
        if len(got) != len(oracle):
            print(f"ROWCOUNT {name}: spark={len(got)} oracle={len(oracle)}")
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, oracle, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"OK       {name} ({len(got)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[-1]}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
