#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same test
tables, sorts columns by name + rows, and compares values.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING spark result: {name}"); n_bad += 1; continue
        got = canon(pq.read_table(spark_path).to_pandas())
        want = canon(con.execute(sql).df())
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                # The driver's value hash is dtype-sensitive after its own
                # canonicalization (e.g. DuckDB HUGEINT -> float64 while Spark
                # emits int64, q56 round 2). Mirror that: a kind mismatch
                # (int vs float vs object...) is a failure even if values
                # compare equal numerically.
                if a.dtype.kind != b.dtype.kind:
                    print(f"FAIL {name}.{c}: dtype kind {a.dtype} vs {b.dtype}")
                    ok = False
                    continue
                try:
                    pd.testing.assert_series_equal(
                        a, b, check_dtype=False, check_exact=True, check_names=False)
                except AssertionError as e:
                    print(f"FAIL {name}.{c}: {str(e).splitlines()[-1] if str(e) else e}")
                    print("  spark:", a.head(3).tolist())
                    print("  duck :", b.head(3).tolist())
                    ok = False
        if ok:
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
