#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads every <verifyOutDir>/<name>/ parquet result written by
graft.Verify, runs the matching oracle SQL from oracle_sql.json in
DuckDB against the same parquet tables, and compares: row count,
column names (sorted), per-column dtype KIND, and a hash over values
with columns sorted by name and rows in result order. Float columns
are compared with rounding tolerance via repr at 10 significant
digits.

Dtype guard (round-8 hardening): the round-7 driver gate went red on
11 queries whose oracle SQL had a bare integer SUM — DuckDB types
those HUGEINT (int128, surfaced as arrow decimal128(38,0)), which the
driver normalizes differently than BIGINT even when every value is
equal.  str()-based cell comparison can never see that, so this
replica now (a) hard-fails any oracle column whose arrow type is an
int128-backed decimal (precision > 18) unless the Spark side is the
identical decimal type, and (b) fails any column whose dtype KIND
differs between the Spark parquet and the DuckDB result (int family
vs decimal vs float vs string...).  Fix is always in the oracle SQL:
wrap the aggregate in CAST(... AS BIGINT) / DECIMAL(<=18,s) / DOUBLE.
"""
import sys, os, json, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def kind(t):
    """Canonical dtype kind for comparison. int8..int64 collapse to one
    family; decimals keep (precision, scale) so an int128-backed
    HUGEINT (decimal128(38,0)) can never alias a BIGINT."""
    if pa.types.is_integer(t):
        return ("int",)
    if pa.types.is_floating(t):
        return ("float",)
    if pa.types.is_decimal(t):
        return ("decimal", t.precision, t.scale)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("string",)
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_timestamp(t):
        return ("timestamp",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("binary",)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", kind(t.value_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(kind(f.type) for f in t)
    return ("other", str(t))


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
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
        spark_kinds = {f.name: kind(f.type) for f in tbl.schema}
        spark_rows = [tuple(tbl.column(c)[i].as_py() for c in spark_cols)
                      for i in range(tbl.num_rows)]
        if name not in oracle:
            status = "ROWS-ONLY" if tbl.num_rows > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status:5} {name}: rows={tbl.num_rows}")
            n_rowsonly += 1
            continue
        try:
            atbl = con.execute(oracle[name]).arrow()
            if hasattr(atbl, "read_all"):  # RecordBatchReader on new duckdb
                atbl = atbl.read_all()
            duck_cols = atbl.column_names
            duck_kinds = {f.name: kind(f.type) for f in atbl.schema}
            duck_rows = [tuple(atbl.column(c)[i].as_py() for c in duck_cols)
                         for i in range(atbl.num_rows)]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # -- dtype guard --------------------------------------------------
        bad = []
        for c in duck_cols:
            dk, sk = duck_kinds[c], spark_kinds[c]
            if dk != sk:
                hint = (" — HUGEINT/wide-decimal: CAST the aggregate in "
                        "the oracle SQL (Money.BSUM/DSUM)"
                        if dk[0] == "decimal" and dk[1] > 18 else "")
                bad.append(f"{c}: dtype kind spark={sk} duck={dk}{hint}")
        if bad:
            print(f"FAIL  {name}: dtype guard: " + "; ".join(bad))
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
