#!/usr/bin/env python3
"""Pivot ScaleAudit JSONL lines (SPARK_GRAFT_SCALE_OUT) into the per-round
SCALE_rN.json the driver can regress round-over-round: one object per query
with the median seconds and output rows at each measured tier, plus the
decade factors when adjacent tiers are present.

Tier names come from the data directory: .../sf0.1 -> "1x",
.../graft_sf_x10 -> "10x", .../graft_sf_x100 -> "100x".
The recorded seconds per (query, tier) is the MINIMUM across every pass
of every line — the volatile-host protocol's stall-robust estimator
(see BASELINE.md; one-sided stall noise makes medians lie, and at
reps=2 a median IS the max).

Usage: python3 scripts/scale_json.py <jsonl> <out.json>
"""
import json
import sys


def tier(d: str) -> str:
    if d.rstrip("/").endswith("x100"):
        return "100x"
    if d.rstrip("/").endswith("x10"):
        return "10x"
    return "1x"


def main(src: str, dst: str) -> None:
    acc = {}
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            q = acc.setdefault(r["query"], {})
            t = tier(r["dir"])
            passes = r.get("all_s") or [r["median_s"]]
            cur = q.setdefault(t, {"min_s": min(passes), "rows": r["rows"],
                                   "all_s": []})
            cur["all_s"].extend(passes)
            cur["min_s"] = min(cur["min_s"], min(passes))
    out = {}
    for name in sorted(acc):
        tiers = acc[name]
        # per-cell pass spread: (max - min) / min across EVERY recorded
        # pass — min alone hid q21-style 27% spreads in round 13
        for v in tiers.values():
            ps = sorted(v.pop("all_s"))
            v["all_s"] = ps
            if ps and ps[0] > 0:
                v["spread_pct"] = round(100.0 * (ps[-1] - ps[0]) / ps[0], 1)
        row = {t: v for t, v in tiers.items()}
        if "1x" in tiers and "10x" in tiers and tiers["1x"]["min_s"] > 0:
            row["decade1"] = round(
                tiers["10x"]["min_s"] / tiers["1x"]["min_s"], 2)
        if "10x" in tiers and "100x" in tiers and tiers["10x"]["min_s"] > 0:
            row["decade2"] = round(
                tiers["100x"]["min_s"] / tiers["10x"]["min_s"], 2)
        out[name] = row
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{dst}: {len(out)} queries")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
