#!/usr/bin/env python3
"""Beyond-gate oracle compare on a synthesized scale corpus.

Same contract as check_oracle.py (column-sorted, dtype-aware, value-exact)
but table views resolve from TWO roots: the scale corpus dir (Spark-written
parquet DIRECTORIES for documents/embeddings/events) first, the base sf dir
(driver-written single parquet FILES) for everything else. Each oracle gets
a wall-time budget (default 1800 s via --timeout) enforced with DuckDB's
interrupt API so one infeasible oracle can't eat the sweep.

Usage:
  python3 tools/check_oracle_scale.py <scaleDir> <baseSfDir> <verifyOutDir> \
      <onlyCsv> [--timeout SECS]
"""
import json, sys, glob, os, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def table_glob(scale_dir, base_dir, t):
    d = os.path.join(scale_dir, f"{t}.parquet")
    if os.path.isdir(d):
        return os.path.join(d, "*.parquet")
    return os.path.join(base_dir, f"{t}.parquet")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scale_dir, base_dir, out_dir, only_csv = args[:4]
    timeout = 1800.0
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--timeout"):
            if "=" in a:
                timeout = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                timeout = float(argv[i + 1])
    con = duckdb.connect()
    for t in TABLES:
        g = table_glob(scale_dir, base_dir, t)
        if t == "events":
            # ScaleBench writes the scale copy's ts as plain INT64
            # epoch-NANOS (the engine contract), but every events oracle
            # reads `epoch_us(ts)` against the driver's TIMESTAMP
            # encoding — normalize the view back to TIMESTAMP so the
            # same oracle SQL runs on both corpora.
            ty = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{g}') LIMIT 1").fetchone()
            if ty and ty[0] == "BIGINT":
                con.execute(f"CREATE VIEW {t} AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{g}')")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{g}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = [n for n in only_csv.split(",") if n]
    if not only:
        # an empty filter (unset shell variable) must not read as a pass
        print("FAIL: empty query filter — nothing would be compared")
        return 1
    unknown = sorted(set(only) - set(oracle))
    if unknown:
        print(f"FAIL: unknown query names in filter: {', '.join(unknown)}")
        return 1
    n_ok = n_bad = 0
    for name in only:
        sql = oracle[name]
        t0 = time.time()
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output", flush=True); n_bad += 1; continue
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            dt = time.time() - t0
            tag = "TIMEOUT" if dt >= timeout - 1 else "FAIL"
            print(f"{tag} {name}: {str(e)[:200]} ({dt:.0f}s)", flush=True)
            n_bad += 1
            continue
        finally:
            timer.cancel()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}", flush=True); n_bad += 1; continue
        if got.shape != exp.shape:
            print(f"FAIL {name}: shape {got.shape} != {exp.shape}", flush=True); n_bad += 1; continue
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes differ: "
                  + "; ".join(f"{c}: spark={a} duck={b}" for c, a, b in dt_bad[:4]), flush=True)
            n_bad += 1; continue
        # exact value compare, in emitted row order (check_oracle.py contract)
        diffs = []
        for c in got.columns:
            a, b = got[c], exp[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append((c, int(neq.sum()), a[i], b[i]))
        if diffs:
            try:
                gs = got.sort_values(list(got.columns)).reset_index(drop=True)
                es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
                sorted_eq = gs.equals(es)
            except Exception:
                sorted_eq = False
            if sorted_eq:
                print(f"OK~  {name}: matches after row sort (emit order differs)", flush=True)
                n_ok += 1; continue
            print(f"FAIL {name}: {len(diffs)} cols differ; first: "
                  + "; ".join(f"{c}: {n} rows, spark={a!r} duck={b!r}" for c, n, a, b in diffs[:3]), flush=True)
            n_bad += 1
        else:
            print(f"OK   {name}: {got.shape[0]} rows x {got.shape[1]} cols exact ({time.time()-t0:.0f}s)", flush=True)
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 0 if n_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
