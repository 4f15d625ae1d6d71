#!/usr/bin/env python3
"""Time each oracle_sql.json entry in DuckDB over a chosen sf dir — the
DuckDB column for BASELINE.md's Spark-vs-oracle table. Runs each query once
to warm (IO, catalog), then reports the second run's wall time.

Usage: python3 scripts/time_oracle.py <sfDir> <verifyOutDirWithOracleJson>
"""
import json, sys, time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    times = {}
    for name in sorted(oracles):
        if name in skip:
            continue
        sql = oracles[name]
        try:
            con.sql(sql).fetchall()  # discarded warm run
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:
            times[name] = None
            print(f"ERROR {name}: {e}", file=sys.stderr)
    total = sum(v for v in times.values() if v is not None)
    print(json.dumps({"total": total, "queries": times}))


if __name__ == "__main__":
    # optional third arg: comma-separated query names to skip (e.g. q140's
    # recursive closure, intractable for DuckDB at sf0.1)
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set())
