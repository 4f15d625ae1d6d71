#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query closing table from the three
measurement files: the sf0.1 bench detail, the DuckDB oracle times, and
the 10x bench detail.

Usage: python3 scripts/closing_table.py <bench.json> <oracle.json> <bench_x10.json>
Prints the markdown table to stdout.
"""
import json
import sys


def main(bench_path, oracle_path, x10_path):
    bench = json.load(open(bench_path))["queries"]
    oracle = json.load(open(oracle_path))["queries"]
    x10 = json.load(open(x10_path))["queries"]
    # bench detail keys are the qNN prefixes; oracle keys are full names
    full = {n.split("_")[0]: n for n in oracle}
    print("| query | Spark sf0.1 (s) | DuckDB sf0.1 (s) | ratio "
          "| Spark 10x (s) | 10x/1x |")
    print("|---|---|---|---|---|---|")
    for q in sorted(bench, key=lambda k: int(k[1:])):
        s1 = bench[q]
        name = full.get(q, q)
        d = oracle.get(name)
        s10 = x10.get(q)
        ratio = f"{s1 / d:.2f}" if d else "n/a*"
        dtxt = f"{d:.3f}" if d else "n/a*"
        f10 = f"{s10 / s1:.2f}" if s10 and s1 > 0 else "-"
        stxt = f"{s10:.3f}" if s10 is not None else "-"
        print(f"| {name} | {s1:.3f} | {dtxt} | {ratio} | {stxt} | {f10} |")
    tot_s = sum(bench.values())
    tot_d = sum(v for v in oracle.values() if v)
    tot_x = sum(x10.values())
    print(f"\naggregates: Spark {tot_s:.1f} s ({len(bench)} queries), "
          f"DuckDB {tot_d:.1f} s ({sum(1 for v in oracle.values() if v)}), "
          f"Spark 10x {tot_x:.1f} s "
          f"(aggregate 10x factor {tot_x / tot_s:.2f})")


if __name__ == "__main__":
    main(*sys.argv[1:4])
