#!/usr/bin/env python3
"""mm_phash_groups large-scale oracle probe (VERDICT r18 #3).

The committed DuckDB oracle for mm_phash_groups is a recursive CTE whose
label relation carries EVERY (node, reachable-label) pair until
convergence — at sf10's 68.6M-pair graph it spills past 69 GB of temp
space. This probe computes the SAME connected components with bounded
memory: derive the pair graph with the oracle's own SQL (independent of
the engine), then iterate min-label propagation with one MATERIALIZED
(node, label) table per round (1 row per node, never per label), and
compare against the engine's DumpGate parquet.

usage: phash_groups_probe.py <sfDir> <engineDumpDir>
  engineDumpDir = DumpGate output containing mm_phash_groups/*.parquet
"""
import sys
import duckdb

def main(sf, dump):
    con = duckdb.connect()
    docs = f"read_parquet('{sf}/documents.parquet')"
    phash_cte = """g AS (SELECT doc_id,
         list_transform(range(72),
           i -> unicode(substr(text, i * length(text) // 72 + 1, 1))) AS g
       FROM v),
       h AS (SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(63), j ->
             CASE WHEN g[j + j // 8 + 1] > g[j + j // 8 + 2]
                  THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
           (a, b) -> a + b) AS phash
       FROM g)"""
    print("[probe] deriving pair graph (oracle SQL) ...", flush=True)
    con.execute(f"""
      CREATE TABLE pr AS
      WITH v AS (SELECT doc_id, text FROM {docs}
            UNION ALL
            SELECT doc_id + greatest(1000000,
                     (SELECT max(doc_id)+1 FROM {docs})),
                   'z' || substr(text, 2) FROM {docs}),
          {phash_cte},
          bands AS (SELECT doc_id, phash, b, (phash >> (16*b)) & 65535 AS bk
                    FROM h, range(4) r(b)),
          cand AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2,
                     b1.phash AS p1, b2.phash AS p2
                   FROM bands b1 JOIN bands b2 ON b1.b = b2.b AND b1.bk = b2.bk
                   WHERE b1.doc_id < b2.doc_id)
          SELECT d1, d2 FROM cand
          WHERE bit_count(CAST(xor(p1, p2) AS BIT)) <= 3""")
    n_pairs = con.execute("SELECT count(*) FROM pr").fetchone()[0]
    con.execute("CREATE TABLE ed AS SELECT d1 AS s, d2 AS t FROM pr "
                "UNION ALL SELECT d2, d1 FROM pr")
    con.execute("CREATE TABLE lbl AS SELECT DISTINCT s AS x, s AS lbl FROM ed")
    n_nodes = con.execute("SELECT count(*) FROM lbl").fetchone()[0]
    print(f"[probe] pairs={n_pairs} nodes={n_nodes}", flush=True)
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
          CREATE TABLE nxt AS
          SELECT x, min(lbl) AS lbl FROM (
            SELECT x, lbl FROM lbl
            UNION ALL
            SELECT ed.t AS x, lbl.lbl FROM lbl JOIN ed ON ed.s = lbl.x
          ) GROUP BY x""")
        changed = con.execute(
            "SELECT count(*) FROM nxt JOIN lbl USING (x) "
            "WHERE nxt.lbl != lbl.lbl").fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE nxt RENAME TO lbl")
        print(f"[probe] round {rounds}: changed={changed}", flush=True)
        if changed == 0:
            break
        if rounds > 200:
            raise RuntimeError("min-label propagation did not converge")
    eng = f"read_parquet('{dump}/mm_phash_groups/*.parquet')"
    bad = con.execute(f"""
      SELECT count(*) FROM (
        SELECT d, g FROM {eng}
        EXCEPT
        SELECT x AS d, lbl AS g FROM lbl
      )""").fetchone()[0]
    bad2 = con.execute(f"""
      SELECT count(*) FROM (
        SELECT x AS d, lbl AS g FROM lbl
        EXCEPT
        SELECT d, g FROM {eng}
      )""").fetchone()[0]
    n_eng = con.execute(f"SELECT count(*) FROM {eng}").fetchone()[0]
    ok = bad == 0 and bad2 == 0 and n_eng == n_nodes
    print(f"[probe] engine_rows={n_eng} probe_rows={n_nodes} "
          f"eng_minus_probe={bad} probe_minus_eng={bad2} rounds={rounds}")
    print(f"{'1 ok, 0 bad' if ok else '0 ok, 1 bad'}")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
