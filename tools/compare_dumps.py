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
    def dump_names(d):
        return set(x for x in os.listdir(d) if os.path.isdir(os.path.join(d, x)))
    na, nb = dump_names(a_dir), dump_names(b_dir)
    if na != nb:
        # symmetric: a half-written dump on EITHER side must fail loudly,
        # not shrink the comparison to the intersection
        only_a, only_b = sorted(na - nb), sorted(nb - na)
        print(f"FAIL: dump sets differ — only in {a_dir}: {only_a[:5]}; "
              f"only in {b_dir}: {only_b[:5]}")
        return 1
    names = sorted(na)
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
                neq_n = int((~((x == y) | (x.isna() & y.isna()))).sum())
            except Exception:
                # array/object columns: element-exact compare (str() would
                # truncate long arrays and could false-pass)
                import numpy as np
                neq_n = sum(
                    0 if (xi is None and yi is None) else
                    (0 if np.array_equal(xi, yi) else 1)
                    for xi, yi in zip(x, y))
            if neq_n:
                bad.append((c, neq_n))
        if bad:
            print(f"FAIL {name}: cols differ: {bad[:4]}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} identical, {n_bad} differ (of {len(names)})")
    return 0 if n_bad == 0 else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
