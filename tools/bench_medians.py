#!/usr/bin/env python3
"""Compute per-entry medians across several clean bench runs, and check a
new run against them with a TWO-AXIS (wall + CPU) flag rule.

Median mode:
    python3 tools/bench_medians.py OUT.json RUN1.json [RUN2.json ...]

Each RUN*.json is a BENCH_FULL.json (one line: {"metric":"total",
"value":..., "queries":{name: sec, ...}, "cpu_queries":{name: sec, ...},
...}).  Writes OUT.json with per-entry wall medians, per-entry CPU
medians (when the runs carry `cpu_queries`), plus run metadata.

Check mode (the flag rule):
    python3 tools/bench_medians.py --check MEDIANS.json RUN.json

Two axes, both host-normalized by the `calibration_cpu` entry (fixed
synthetic pure-CPU work, so its times measure the HOST, not any query's
plan):

  wall  — run wall / (run_cal_wall / median_cal_wall), vs the wall
          median.  Catches regressions, but UNIFORM host drift is the
          only contamination the calibration ratio can cancel: BURSTY
          external CPU contention inflates an entry's wall while the
          start-of-run calibration measured a clean host (the r15
          driver run: 25 byte-identical entries flagged at a 1.03x
          calibration while one entry's effective cores collapsed from
          ~28 to 8.4).
  cpu   — run CPU seconds / (run_cal_cpu / median_cal_cpu), vs the CPU
          median.  Process CPU time is contention-IMMUNE for CPU-bound
          work: a core-starved entry takes longer on the clock but burns
          the same cycles; a real plan regression burns MORE.

An entry FLAGS only when BOTH axes exceed 1.5x their medians (each with
a 0.5 s absolute floor — scheduling noise routinely doubles a 0.1 s
entry).  An entry past the wall rule alone is printed as a demoted
`wall-only` NOTE, never a flag.  Stated limitation: a REAL regression
that adds blocked time without CPU (lost parallelism, extra round
trips, retry sleeps) has the same wall-up/CPU-flat signature as host
contention and lands in the notes too — so a wall-only note that
PERSISTS across runs deserves a human look, and the parallel plan
shapes themselves are guarded structurally where it matters: the gate
entries RAISE in-entry when a sliced/tiled/ranged plan silently
degrades (q231/q234/q236/q237/q239), failing CORRECTNESS rather than
waiting on a bench delta.  Entries or medians without CPU data fall
back to the wall-only rule so pre-CPU runs still check.
"""
import json
import statistics
import sys

CAL = "calibration_cpu"
FLAG_RATIO = 1.5
ABS_FLOOR = 0.5


def load(path):
    with open(path) as f:
        return json.load(f)


def scale_of(run_vals: dict, med_vals: dict) -> float:
    """Host-speed ratio from the calibration entry; 1.0 when absent."""
    if med_vals.get(CAL, 0) > 0 and run_vals.get(CAL, 0) > 0:
        return run_vals[CAL] / med_vals[CAL]
    return 1.0


def exceeds(norm: float, median: float) -> bool:
    return norm > FLAG_RATIO * median and norm - median > ABS_FLOOR


def check(medians_path: str, run_path: str) -> int:
    med_doc, run = load(medians_path), load(run_path)
    medians = med_doc["medians"]
    cpu_medians = med_doc.get("cpu_medians", {})
    run_cpu = run.get("cpu_queries", {})
    wall_scale = scale_of(run["queries"], medians)
    cpu_scale = scale_of(run_cpu, cpu_medians)
    print(f"calibration scale: wall {wall_scale:.3f} "
          f"(run {run['queries'].get(CAL, -1)}s / median {medians.get(CAL, -1)}s), "
          f"cpu {cpu_scale:.3f} "
          f"(run {run_cpu.get(CAL, -1)}s / median {cpu_medians.get(CAL, -1)}s)")
    flagged, wall_only = [], []
    for name, t in sorted(run["queries"].items()):
        if name == CAL or name not in medians or medians[name] <= 0 or t < 0:
            continue
        norm = t / wall_scale
        if not exceeds(norm, medians[name]):
            continue
        # the wall axis tripped — decide on the CPU axis
        cpu_med = cpu_medians.get(name, 0)
        cpu_t = run_cpu.get(name, -1)
        if cpu_med > 0 and cpu_t >= 0:
            cpu_norm = cpu_t / cpu_scale
            if exceeds(cpu_norm, cpu_med):
                flagged.append((name, t, norm, medians[name], cpu_norm, cpu_med))
            else:
                wall_only.append((name, t, norm, medians[name], cpu_norm, cpu_med))
        else:
            # no CPU data for this entry: the wall rule alone decides
            flagged.append((name, t, norm, medians[name], -1.0, -1.0))
    for name, t, norm, med, cn, cm in sorted(flagged, key=lambda x: -x[2] / x[3]):
        cpu_part = (f", cpu {cn:.2f}s vs median {cm:.2f}s ({cn / cm:.2f}x)"
                    if cm > 0 else ", no cpu medians (wall rule alone)")
        print(f"FLAG {name}: {t:.2f}s raw, {norm:.2f}s normalized "
              f"vs median {med:.2f}s ({norm / med:.2f}x){cpu_part}")
    for name, t, norm, med, cn, cm in sorted(wall_only, key=lambda x: -x[2] / x[3]):
        print(f"note (wall-only, not flagged) {name}: wall {norm:.2f}s vs {med:.2f}s "
              f"({norm / med:.2f}x) but cpu {cn:.2f}s vs {cm:.2f}s "
              f"({cn / cm:.2f}x) — host contention OR a blocking/parallelism "
              f"change; investigate if it persists across runs")
    print(f"{len(flagged)} flagged of {len(run['queries'])} entries "
          f"(rule: BOTH normalized wall AND cpu > {FLAG_RATIO}x median; "
          f"{len(wall_only)} wall-only notes)")
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
    cpu_medians = {}
    for n in names:
        vals = [r["cpu_queries"][n] for r in runs
                if n in r.get("cpu_queries", {}) and r["cpu_queries"][n] >= 0]
        if vals:
            cpu_medians[n] = round(statistics.median(vals), 3)
    doc = {
        "n_runs": len(runs),
        "totals": [r["value"] for r in runs],
        "median_total": round(statistics.median([r["value"] for r in runs]), 3),
        "sf": runs[0].get("sf", ""),
        "rule": "flag an entry only when a new run exceeds 1.5x BOTH its wall median "
                "(calibration_cpu-normalized) AND its cpu median — bursty host "
                "contention inflates wall alone, a real regression inflates both "
                "(tools/bench_medians.py --check MEDIANS.json RUN.json)",
        "medians": medians,
        "cpu_medians": cpu_medians,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {len(medians)} wall + {len(cpu_medians)} cpu entries over "
          f"{len(runs)} runs, median total {doc['median_total']}s")


if __name__ == "__main__":
    main()
