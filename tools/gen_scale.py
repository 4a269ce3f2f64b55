#!/usr/bin/env python3
"""Generate a scaled-up copy of a testdata dir for scale sweeps (local
validation tooling, like check_oracle.py — NOT part of the library).

Replicates the fact tables K times with shifted keys so every generator
invariant the gates rely on is preserved:
  - customer keys stay contiguous 0..K*N-1 (the dl_*/graph_* graphs
    derive intra-block edges from contiguous keys);
  - doc/vec/event/user ids shift per replica (independent populations);
  - document text is perturbed per replica (" r<i>" suffix) so the
    near-dup structure scales instead of exploding into 10-way exact
    duplicate cliques;
  - event timestamps are unchanged (watermark/session shapes identical,
    10x the traffic per window);
  - dimension tables (region/nation/supplier/part) are copied as-is.

Usage: python3 tools/gen_scale.py <srcDir> <dstDir> [K=10]
"""
import sys
import duckdb

def main(src, dst, k=10):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS i FROM range({k})")

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    t = lambda name: f"read_parquet('{src}/{name}.parquet')"

    ncust = con.execute(f"SELECT count(*) FROM {t('customer')}").fetchone()[0]
    nord = con.execute(f"SELECT count(*) FROM {t('orders')}").fetchone()[0]
    ndoc = con.execute(f"SELECT count(*) FROM {t('documents')}").fetchone()[0]
    nvec = con.execute(f"SELECT count(*) FROM {t('embeddings')}").fetchone()[0]
    nevt = con.execute(f"SELECT count(*) FROM {t('events')}").fetchone()[0]
    nusr = con.execute(
        f"SELECT max(user_id)+1 FROM {t('events')}").fetchone()[0]

    for d in ("region", "nation", "supplier", "part"):
        write(d, f"SELECT * FROM {t(d)}")

    write("customer", f"""
        SELECT c_custkey + i*{ncust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {t('customer')}, reps""")
    write("orders", f"""
        SELECT o_orderkey + i*{nord} AS o_orderkey,
               o_custkey + i*{ncust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, reps""")
    write("lineitem", f"""
        SELECT l_orderkey + i*{nord} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, reps""")
    write("documents", f"""
        SELECT doc_id + i*{ndoc} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
               lang, source,
               -- keep the generator invariant n_chars == length(text)
               -- (replica suffixes lengthen the text)
               length(CASE WHEN i = 0 THEN text
                           ELSE text || ' r' || i END) AS n_chars
        FROM {t('documents')}, reps""")
    write("embeddings", f"""
        SELECT vec_id + i*{nvec} AS vec_id, embedding, label
        FROM {t('embeddings')}, reps""")
    write("events", f"""
        SELECT event_id + i*{nevt} AS event_id, ts,
               user_id + i*{nusr} AS user_id, event_type, value, props
        FROM {t('events')}, reps""")

if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/scratch/tmp_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, k)
