#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate:
run Verify's parquet outputs against the DuckDB oracle SQL.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for q, sql in sorted(oracle.items()):
    res_dir = os.path.join(outdir, q)
    try:
        got = con.sql(
            f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {q}: rows {len(got)} vs {len(want)}")
        fails += 1
        continue
    # value compare, row order as produced
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False, check_exact=True)
        print(f"PASS {q} ({len(got)} rows)")
    except AssertionError as e:
        print(f"FAIL {q}: {str(e).splitlines()[-1] if str(e) else e}")
        fails += 1
print("=" * 40)
print(f"{len(oracle) - fails}/{len(oracle)} oracle-checked queries pass")
sys.exit(1 if fails else 0)
