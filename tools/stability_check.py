#!/usr/bin/env python3
"""Partitioning-invariance check: compare two graft.Verify output dirs
(e.g. runs at different SPARK_GRAFT_CPUS) and assert every query
produced identical rows. Row order must match too — every query ends
in a total ORDER BY, so a mismatch means nondeterminism.

Usage: python3 tools/stability_check.py <outDirA> <outDirB>
"""
import sys, os
import pyarrow.dataset as ds


def rows_of(res_dir):
    tbl = ds.dataset(res_dir, format="parquet").to_table()
    cols = sorted(tbl.column_names)
    return [tuple(str(tbl.column(c)[i].as_py()) for c in cols)
            for i in range(tbl.num_rows)], cols


def main(a_dir, b_dir):
    names_a = {d for d in os.listdir(a_dir) if os.path.isdir(os.path.join(a_dir, d))}
    names_b = {d for d in os.listdir(b_dir) if os.path.isdir(os.path.join(b_dir, d))}
    if names_a != names_b:
        print(f"MISMATCH query sets: only-A={names_a - names_b} only-B={names_b - names_a}")
        return 1
    n_ok = n_bad = 0
    for name in sorted(names_a):
        ra, ca = rows_of(os.path.join(a_dir, name))
        rb, cb = rows_of(os.path.join(b_dir, name))
        if ca != cb:
            print(f"DIFF  {name}: columns {ca} vs {cb}")
            n_bad += 1
        elif ra != rb:
            diffs = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"DIFF  {name}: {len(ra)} vs {len(rb)} rows, {diffs} differing")
            n_bad += 1
        else:
            n_ok += 1
    print(f"== {n_ok} identical, {n_bad} differ of {len(names_a)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
