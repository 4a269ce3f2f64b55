#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, sorts columns by name and rows by all columns, and
reports row/schema/value equality per query.
"""
import sys, json, duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = 0
for name in sorted(oracle):
    try:
        s = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        o = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fails += 1; continue
    sc, oc = sorted(s.columns), sorted(o.columns)
    if sc != oc:
        print(f"FAIL {name}: cols {sc} vs {oc}"); fails += 1; continue
    s = s[sc].sort_values(sc).reset_index(drop=True)
    o = o[oc].sort_values(oc).reset_index(drop=True)
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); fails += 1; continue
    # int width doesn't affect the driver's value hash, but int-vs-float does
    kind_s, kind_o = [d.kind for d in s.dtypes], [d.kind for d in o.dtypes]
    if kind_s != kind_o:
        print(f"FAIL {name}: dtype kinds {list(s.dtypes.astype(str))} vs "
              f"{list(o.dtypes.astype(str))}"); fails += 1; continue
    o = o.astype(s.dtypes.to_dict())
    if not s.equals(o):
        neq = ((s != o) & ~(s.isna() & o.isna())).any(axis=1)
        print(f"FAIL {name}: {neq.sum()} differing rows of {len(s)}")
        print(pd.concat([s[neq].head(3).add_suffix('_spark'),
                         o[neq].head(3).add_suffix('_oracle')], axis=1).to_string())
        fails += 1; continue
    print(f"ok   {name}: {len(s)} rows")
sys.exit(1 if fails else 0)
