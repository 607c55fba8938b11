#!/usr/bin/env python3
"""Local pre-verification harness replicating the driver's DuckDB oracle
compare: run graft.Verify first (dumps per-query parquet + oracle_sql.json),
then this script executes each oracle SQL in DuckDB over the same testdata
tables and diffs against the Spark output.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [onlyCsv]

`onlyCsv` (optional): comma-separated query names to restrict the
compare (e.g. a heavy-oracle retry list). Progress lines flush per
query and carry the DuckDB wall time, so a slow oracle is visible
while it runs instead of looking like a hang.
"""
import json, sys, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only is not None:
        unknown = sorted(only - set(oracle))
        if unknown:
            # a typo'd retry list must not read as "0 ok, 0 fail" success
            print(f"FAIL: unknown query names in filter: {', '.join(unknown)}")
            return 1
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output", flush=True); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}", flush=True); n_bad += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}", flush=True); n_bad += 1; continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} != {exp.shape}", flush=True); n_bad += 1; continue
        # dtype compare: the driver's hash is TYPE-aware, so a DuckDB
        # HUGEINT (object/float64 in pandas) vs Spark int64 fails there
        # even when every value matches (the round-5 q125 lesson).
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes differ: "
                  + "; ".join(f"{c}: spark={a} duck={b}" for c, a, b in dt_bad[:4]), flush=True)
            n_bad += 1; continue
        # exact value compare, in emitted row order
        diffs = []
        for c in got.columns:
            a, b = got[c], exp[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append((c, int(neq.sum()), a[i], b[i]))
        if diffs:
            # also try sorted-rows compare (driver may sort before hashing)
            gs = got.sort_values(list(got.columns)).reset_index(drop=True)
            es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            if gs.equals(es):
                print(f"OK~  {name}: matches after row sort (emit order differs)", flush=True)
                n_ok += 1; continue
            print(f"FAIL {name}: {len(diffs)} cols differ; first: "
                  + "; ".join(f"{c}: {n} rows, spark={a!r} duck={b!r}" for c, n, a, b in diffs[:3]), flush=True)
            n_bad += 1
        else:
            print(f"OK   {name}: {got.shape[0]} rows x {got.shape[1]} cols exact ({time.time()-t0:.0f}s)", flush=True)
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
