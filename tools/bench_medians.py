#!/usr/bin/env python3
"""Compute per-entry medians across several clean bench runs, and check a
new run against them with host-speed normalization.

Median mode:
    python3 tools/bench_medians.py OUT.json RUN1.json [RUN2.json ...]

Each RUN*.json is a BENCH_FULL.json (one line: {"metric":"total",
"value":..., "queries":{name: sec, ...}, ...}).  Writes OUT.json with
per-entry medians plus run metadata.

Check mode (the flag rule, host-normalized):
    python3 tools/bench_medians.py --check MEDIANS.json RUN.json

The bench's `calibration_cpu` entry is fixed synthetic pure-CPU work, so
its wall time measures the HOST's momentary speed, not any query's plan.
A run's entries are divided by `run_calibration / median_calibration`
before the rule "flag an entry only when it exceeds 1.5x its median" —
host drift moves every entry AND the calibration together and cancels;
a real regression moves one entry alone and still flags.  A run or
medians file without a valid calibration entry falls back to the raw
(unnormalized) rule.
"""
import json
import statistics
import sys

CAL = "calibration_cpu"
FLAG_RATIO = 1.5


def load(path):
    with open(path) as f:
        return json.load(f)


def check(medians_path: str, run_path: str) -> int:
    med_doc, run = load(medians_path), load(run_path)
    medians = med_doc["medians"]
    scale = 1.0
    if medians.get(CAL, 0) > 0 and run["queries"].get(CAL, 0) > 0:
        scale = run["queries"][CAL] / medians[CAL]
    print(f"calibration scale: {scale:.3f} "
          f"(run {run['queries'].get(CAL, -1)}s / median {medians.get(CAL, -1)}s)")
    flagged = []
    for name, t in sorted(run["queries"].items()):
        if name == CAL or name not in medians or medians[name] <= 0 or t < 0:
            continue
        norm = t / scale
        # ratio rule + a small absolute floor: a 0.1s-scale entry's
        # scheduling noise routinely doubles it — that is not a regression
        if norm > FLAG_RATIO * medians[name] and norm - medians[name] > 0.5:
            flagged.append((name, t, norm, medians[name]))
    for name, t, norm, med in sorted(flagged, key=lambda x: -x[2] / x[3]):
        print(f"FLAG {name}: {t:.2f}s raw, {norm:.2f}s normalized "
              f"vs median {med:.2f}s ({norm / med:.2f}x)")
    print(f"{len(flagged)} flagged of {len(run['queries'])} entries "
          f"(rule: normalized > {FLAG_RATIO}x median)")
    return 0


def main() -> None:
    if sys.argv[1] == "--check":
        sys.exit(check(sys.argv[2], sys.argv[3]))
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [load(p) for p in run_paths]
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
        "rule": "flag an entry only when a new run exceeds 1.5x its median here, "
                "after dividing the run by its calibration_cpu ratio "
                "(tools/bench_medians.py --check MEDIANS.json RUN.json)",
        "medians": medians,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {len(medians)} entries over {len(runs)} runs, "
          f"median total {doc['median_total']}s")


if __name__ == "__main__":
    main()
