#!/usr/bin/env python3
"""Spark-side-output audit for the 1000x dedup probe (round 12).

The DuckDB oracle mirrors are infeasible at 5M docs for q48/q51 (the
recursive-CTE connected components took 938s at 500k docs — superlinear
in DuckDB), so this audits the STRUCTURE of the Spark outputs dumped by
`graft.Verify target/scale1000 /tmp/vs1000 q48,...` instead:

q48_minhash_lsh_dedup (doc_id, group_id, is_kept, group_size):
  - row count == corpus count (labels partition the corpus)
  - group_id == min(doc_id) of the group (canonical representative)
  - exactly one is_kept per group, and it IS the representative
  - group_size consistent with the actual member count
  - exact-dup closure: docs with byte-identical text MUST share a group
    (identical texts share every MinHash band -> always LSH candidates
    -> verified at Jaccard 1). This is the invariant that catches a
    broken candidate join at any scale.

q51_dedup_keep_longest (doc_id, group_id, n_chars, keep_id, is_kept):
  - same groups as q48 (shared dedupGroups lineage)
  - keep_id is a group member with the group-max n_chars, min doc_id
    among ties; is_kept marks exactly it

Usage: audit_scale1000.py <corpusDir> <dumpDir>
"""
import sys

import duckdb


def main() -> int:
    corpus, dump = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{corpus}/documents.parquet/*.parquet'")
    con.execute(f"CREATE VIEW g48 AS SELECT * FROM '{dump}/q48_minhash_lsh_dedup/*.parquet'")
    fails = 0

    def check(name, sql, expect):
        nonlocal fails
        got = con.execute(sql).fetchone()[0]
        ok = got == expect
        fails += 0 if ok else 1
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {got} (expect {expect})", flush=True)

    ndocs = con.execute("SELECT count(*) FROM docs").fetchone()[0]
    check("q48 rows == corpus", "SELECT count(*) FROM g48", ndocs)
    check("q48 distinct doc_id", "SELECT count(DISTINCT doc_id) FROM g48", ndocs)
    check("q48 group_id is member min",
          "SELECT count(*) FROM (SELECT group_id, min(doc_id) m FROM g48 "
          "GROUP BY group_id HAVING group_id != m)", 0)
    check("q48 one is_kept per group, the representative",
          "SELECT count(*) FROM (SELECT group_id, sum(is_kept) s, "
          "sum(CASE WHEN is_kept = 1 AND doc_id = group_id THEN 1 ELSE 0 END) r "
          "FROM g48 GROUP BY group_id HAVING s != 1 OR r != 1)", 0)
    check("q48 group_size consistent",
          "SELECT count(*) FROM (SELECT group_id, group_size, count(*) c FROM g48 "
          "GROUP BY group_id, group_size HAVING group_size != c)", 0)
    # exact-dup closure: identical text -> same group
    check("q48 exact-dup closure (identical texts share a group)",
          "SELECT count(*) FROM (SELECT md5(d.text) fp, count(DISTINCT g.group_id) ng "
          "FROM docs d JOIN g48 g USING (doc_id) GROUP BY fp HAVING ng != 1)", 0)

    try:
        con.execute(f"CREATE VIEW g51 AS SELECT * FROM '{dump}/q51_dedup_keep_longest/*.parquet'")
        check("q51 groups == q48 groups",
              "SELECT count(*) FROM (SELECT doc_id, group_id FROM g51 "
              "EXCEPT SELECT doc_id, group_id FROM g48)", 0)
        check("q51 keep_id = min doc_id among group-max n_chars",
              "SELECT count(*) FROM (SELECT g.group_id, g.keep_id, "
              "min(CASE WHEN s.n_chars = s.mx THEN s.doc_id END) want "
              "FROM g51 g JOIN (SELECT doc_id, group_id, n_chars, "
              "max(n_chars) OVER (PARTITION BY group_id) mx FROM g51) s "
              "ON s.group_id = g.group_id GROUP BY g.group_id, g.keep_id "
              "HAVING g.keep_id != want)", 0)
        check("q51 is_kept marks exactly keep_id",
              "SELECT count(*) FROM g51 WHERE (doc_id = keep_id) != (is_kept = 1)", 0)
    except Exception as e:  # q51 dump absent -> partial audit
        print(f"SKIP q51: {e}", flush=True)

    print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
