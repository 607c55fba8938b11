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

    # check 10 (round 14): SAMPLED EXACT-CC ORACLE. The full 5M-doc DuckDB
    # mirror is infeasible (superlinear recursive-CTE CC), but a ~50k-doc
    # sample CLOSED UNDER THE ENGINE'S GROUPS is not: run the exact q48
    # oracle SQL (signatures -> banding -> hot-bucket-capped candidates ->
    # Jaccard verify -> recursive-CTE CC) on just the sampled documents and
    # compare labels row-for-row. Group-closure means every sampled group's
    # members are all present, so a SPLIT (engine group not actually
    # connected by verified edges) or a MERGE (edge between engine groups
    # the engine missed) both surface as row mismatches. Half the budget
    # goes to multi-doc groups, half to singletons, both hash-ordered
    # (deterministic). Caveat: a sample-level bucket can fall back under
    # the 256 hot-bucket cap and form all-pairs where the full corpus used
    # star pairs — extra edges can only show up as a MERGE mismatch, so a
    # green check is still a one-sided proof of no missing connectivity.
    try:
        import json, os
        with open(os.path.join(dump, "oracle_sql.json")) as f:
            q48_sql = json.load(f)["q48_minhash_lsh_dedup"]
        con.execute("""CREATE TABLE gsz AS
            SELECT group_id, count(*) c FROM g48 GROUP BY group_id""")
        con.execute("""CREATE TABLE pick AS
            WITH multi AS (SELECT group_id, sum(c) OVER (ORDER BY hash(group_id)) s
                           FROM gsz WHERE c > 1),
                 single AS (SELECT group_id, sum(c) OVER (ORDER BY hash(group_id)) s
                            FROM gsz WHERE c = 1)
            SELECT group_id FROM multi WHERE s <= 40000
            UNION ALL SELECT group_id FROM single WHERE s <= 10000""")
        con.execute("""CREATE TABLE samp AS
            SELECT doc_id FROM g48 WHERE group_id IN (SELECT group_id FROM pick)""")
        nsamp, nmulti = con.execute(
            "SELECT (SELECT count(*) FROM samp), (SELECT count(*) FROM g48 WHERE "
            "group_id IN (SELECT group_id FROM pick) AND group_size > 1)").fetchone()
        print(f"     sampled-CC oracle: {nsamp} docs ({nmulti} in multi-doc groups)",
              flush=True)
        # the q48 oracle references `documents`; point it at the sample
        con.execute("CREATE TABLE sdocs AS SELECT d.* FROM docs d JOIN samp USING (doc_id)")
        con.execute("CREATE VIEW documents AS SELECT * FROM sdocs")
        import time
        t0 = time.time()
        con.execute(f"CREATE TABLE oracle48 AS {q48_sql}")
        print(f"     oracle CC wall: {time.time() - t0:.1f}s", flush=True)
        check("q48 sampled exact-CC oracle (labels row-for-row)",
              "SELECT (SELECT count(*) FROM ("
              " SELECT doc_id, group_id, is_kept, group_size FROM oracle48 EXCEPT"
              " SELECT doc_id, group_id, is_kept, group_size FROM g48"
              "  WHERE doc_id IN (SELECT doc_id FROM samp))) +"
              "(SELECT count(*) FROM ("
              " SELECT doc_id, group_id, is_kept, group_size FROM g48"
              "  WHERE doc_id IN (SELECT doc_id FROM samp) EXCEPT"
              " SELECT doc_id, group_id, is_kept, group_size FROM oracle48))", 0)
    except Exception as e:
        fails += 1
        print(f"FAIL sampled-CC oracle: {e}", flush=True)

    print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
