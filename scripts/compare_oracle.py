#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle_sql.json entry
in DuckDB over the same parquet tables and diff against the Verify parquet dump.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return str(a) == str(b)

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:  # selective Verify runs dump only the named queries
        oracles = {k: v for k, v in oracles.items() if k in only}
    passed = failed = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = canon(pq.read_table(f"{out_dir}/{name}").to_pandas())
        except Exception as e:
            print(f"FAIL {name}: no engine output ({e})"); failed += 1; continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); failed += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failed += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); failed += 1; continue
        mismatch = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got.iloc[i][c], want.iloc[i][c]
                pa = None if (a is None or (isinstance(a, float) and math.isnan(a))) else a
                pb = None if (b is None or (isinstance(b, float) and math.isnan(b))) else b
                if not cells_equal(pa, pb):
                    mismatch = (i, c, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: engine={a!r} oracle={b!r}")
            failed += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
        set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
