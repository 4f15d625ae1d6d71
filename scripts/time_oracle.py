#!/usr/bin/env python3
"""Time each oracle_sql.json entry in DuckDB over a chosen sf dir — the
DuckDB column for BASELINE.md's Spark-vs-oracle table. Runs each query once
to warm (IO, catalog), then reports the second run's wall time.

Usage: python3 scripts/time_oracle.py <sfDir> <verifyOutDirWithOracleJson>
         [skipList] [baselineOutPath]

With a 4th arg, also writes the measurement as ORACLE_BASELINE.json-style
artifact ({total, queries, sf, skip, measured_utc}) — graft.Bench reads it
(SPARK_GRAFT_ORACLE_BASELINE, default ./ORACLE_BASELINE.json) and folds the
matched-window ratio into its own JSON line so regression triage reads one
file. The baseline is a SNAPSHOT from the session that ran this script; on
volatile hosts treat cross-session ratios as a band, not a point (see
BASELINE.md's bracketing protocol).
"""
import datetime, json, sys, time

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
    out = {"total": total, "queries": times}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    # optional third arg: comma-separated query names to skip (e.g. q140's
    # recursive closure, intractable for DuckDB at sf0.1)
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    res = main(sys.argv[1], sys.argv[2], skip)
    if len(sys.argv) > 4:
        res["sf"] = sys.argv[1].rstrip("/").split("/")[-1]
        res["skip"] = sorted(skip)
        res["measured_utc"] = datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds")
        with open(sys.argv[4], "w") as f:
            json.dump(res, f, indent=1)
