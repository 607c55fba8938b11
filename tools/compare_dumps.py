#!/usr/bin/env python3
"""Partition-invariance check: compare two graft.Verify dump dirs
(e.g. local[7]/7 shuffle partitions vs local[32]/32) value-for-value,
in emitted row order. Catalog queries end in deterministic presentation
sorts, so ANY difference — values OR order — is a reproducibility bug
of the class the round-7 GlobalRank/AQE divergence belonged to.

Usage: python3 tools/compare_dumps.py <dumpDirA> <dumpDirB>
"""
import sys, os, glob
import duckdb

def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    missing = [d for d in names if not os.path.isdir(os.path.join(b_dir, d))]
    if missing:
        print(f"FAIL: {len(missing)} queries missing from {b_dir}: {missing[:5]}")
        return 1
    n_ok = n_bad = 0
    for name in names:
        ga = glob.glob(os.path.join(a_dir, name, "*.parquet"))
        gb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
        if not ga or not gb:
            print(f"FAIL {name}: empty dump ({len(ga)} vs {len(gb)} files)")
            n_bad += 1; continue
        va = con.execute(
            f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").fetchdf()
        vb = con.execute(
            f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").fetchdf()
        if list(va.columns) != list(vb.columns):
            print(f"FAIL {name}: columns {list(va.columns)} != {list(vb.columns)}")
            n_bad += 1; continue
        if va.shape != vb.shape:
            print(f"FAIL {name}: shape {va.shape} != {vb.shape}")
            n_bad += 1; continue
        bad = []
        for c in va.columns:
            x, y = va[c], vb[c]
            try:
                neq = ~((x == y) | (x.isna() & y.isna()))
            except Exception:
                neq = x.astype(str) != y.astype(str)  # array/object columns
            if neq.any():
                bad.append((c, int(neq.sum())))
        if bad:
            print(f"FAIL {name}: cols differ: {bad[:4]}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} identical, {n_bad} differ (of {len(names)})")
    return 0 if n_bad == 0 else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
