#!/usr/bin/env python3
"""Compute per-entry medians across several clean bench runs.

Usage: python3 tools/bench_medians.py OUT.json RUN1.json [RUN2.json ...]

Each RUN*.json is a BENCH_FULL.json (one line: {"metric":"total",
"value":..., "queries":{name: sec, ...}, ...}).  Writes OUT.json with
per-entry medians plus run metadata, so the next round's judge can
separate host-noise drift from real regressions mechanically:
flag an entry only when its new time exceeds 1.5x its committed median
(see NOTES.md "Bench medians" rule).
"""
import json
import statistics
import sys


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append(json.load(f))
    names = sorted({n for r in runs for n in r["queries"]})
    medians = {}
    for n in names:
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        medians[n] = round(statistics.median(vals), 3)
    doc = {
        "n_runs": len(runs),
        "totals": [r["value"] for r in runs],
        "median_total": round(statistics.median([r["value"] for r in runs]), 3),
        "sf": runs[0].get("sf", ""),
        "rule": "flag an entry only when a new run exceeds 1.5x its median here",
        "medians": medians,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {len(medians)} entries over {len(runs)} runs, "
          f"median total {doc['median_total']}s")


if __name__ == "__main__":
    main()
