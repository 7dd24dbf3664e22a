#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same fixture dir,
sort columns by name (as the driver does), and compare values exactly.

Usage: python3 scripts/check.py [sf_dir] [out_dir]
"""
import sys, json, math, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        print(f"FAIL {name}: no spark output at {path}")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, gr = canon(got)
    ec, er = canon(exp)
    # dtype-kind mismatch (e.g. DuckDB HUGEINT → float64/object vs spark
    # int64) breaks the driver's hasher even when pandas-normalized values
    # compare equal — q21 round 1. Width differences (int32 vs int64) are
    # fine (v1/v5 hash-passed with int32 rk), so compare kinds, not dtypes.
    gt = [got[c].dtype.kind for c in sorted(got.columns)]
    et = [exp[c].dtype.kind for c in sorted(exp.columns)]
    if gc == ec and gt != et:
        print(f"FAIL {name}: dtypes differ spark={gt} oracle={et} (cols {gc})")
        fails += 1
        continue
    if gc != ec:
        print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
        fails += 1
    elif len(gr) != len(er):
        print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(er)}")
        fails += 1
    elif gr != er:
        bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
        print(f"FAIL {name}: values differ at row {bad} (cols {gc}):\n  spark : {gr[bad]}\n  oracle: {er[bad]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(gr)} rows)")

missing = [n for n in os.listdir(OUT)
           if os.path.isdir(f"{OUT}/{n}") and n not in oracle]
for n in sorted(missing):
    cnt = con.sql(f"SELECT count(*) FROM '{OUT}/{n}/*.parquet'").fetchone()[0]
    print(f"INFO {n}: no oracle (rows-only check), {cnt} rows")

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries pass")
sys.exit(1 if fails else 0)
