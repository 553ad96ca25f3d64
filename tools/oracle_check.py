#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name>/ parquet result written by
graft.Verify, runs the matching oracle SQL from oracle_sql.json in
DuckDB against the same parquet tables, and compares: row count,
column names (sorted), and a hash over values with columns sorted by
name and rows in result order. Float columns are compared with
rounding tolerance via repr at 10 significant digits.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        res_dir = os.path.join(out_dir, name)
        try:
            tbl = ds.dataset(res_dir, format="parquet").to_table()
        except Exception as e:
            print(f"FAIL  {name}: cannot read result parquet: {e}")
            n_fail += 1
            continue
        spark_cols = tbl.column_names
        spark_rows = [tuple(tbl.column(c)[i].as_py() for c in spark_cols)
                      for i in range(tbl.num_rows)]
        if name not in oracle:
            status = "ROWS-ONLY" if tbl.num_rows > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status:5} {name}: rows={tbl.num_rows}")
            n_rowsonly += 1
            continue
        try:
            duck = con.execute(oracle[name])
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        a = frame_rows(spark_cols, spark_rows)
        b = frame_rows(duck_cols, duck_rows)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        if a != b:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
            print(f"FAIL  {name}: {len(diffs)}/{len(a)} rows differ; first: "
                  f"row {diffs[0][0]} spark={diffs[0][1]} duck={diffs[0][2]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(a)}")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
          f"of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
