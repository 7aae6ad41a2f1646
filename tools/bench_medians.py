#!/usr/bin/env python3
"""Compute per-entry medians across several clean bench runs, and check
new runs against them with a TWO-AXIS (wall + CPU) flag rule plus a
TWO-RUN persistence escalation.

Median mode:
    python3 tools/bench_medians.py OUT.json RUN1.json [RUN2.json ...]

Each RUN*.json is a BENCH_FULL.json (one line: {"metric":"total",
"value":..., "queries":{name: sec, ...}, "cpu_queries":{name: sec, ...},
...}).  Writes OUT.json with per-entry wall medians, per-entry CPU
medians (when the runs carry `cpu_queries`), plus run metadata.

Check mode (single run):
    python3 tools/bench_medians.py --check MEDIANS.json RUN.json

Pair mode (two consecutive runs — the persistence rule):
    python3 tools/bench_medians.py --check-pair MEDIANS.json RUN1.json RUN2.json

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
          median.  Process CPU time is contention-immune for the
          contention the wall axis suffers FIRST (core starvation: same
          cycles, longer clock), but NOT noise-free: a 32-thread JVM's
          CPU-seconds inflate under GC pressure and memory-bandwidth
          stalls too — the r16 driver run put 11 both-axis flags on
          byte-identical sub-second entries because a flat 0.5 s floor
          is tight when 32 ways each contribute jitter.  So the CPU
          axis gets its OWN absolute floor, scaled to the entry:
          max(2.0 s, 0.3 x the entry's CPU median).

Single-run rule (--check): an entry FLAGS only when BOTH axes exceed
1.5x their medians past their floors (wall floor 0.5 s; CPU floor as
above).  An entry past the wall rule alone prints as a demoted
`wall-only` NOTE, never a flag.

Pair rule (--check-pair): transient noise does not repeat, real
regressions do.  An entry FLAGS when
  (a) it trips BOTH axes in BOTH runs (persistent both-axis), or
  (b) its WALL axis trips in both runs with the CPU axis flat in at
      least one (persistent wall-only, ESCALATED) — this closes the
      stated single-run blind spot: a real regression that only adds
      blocked time (lost parallelism, retry sleeps, extra round trips)
      has a wall-up/CPU-flat signature indistinguishable from host
      contention in ONE run, but host contention does not follow the
      same entry across two separate runs.
Anything tripping in only one of the two runs prints as a transient
note.  Entries or medians without CPU data fall back to the wall-only
rule per run, so pre-CPU runs still check.

A second calibration entry, `calibration_serial` (ONE partition, 1/32
the work), separates two host conditions the 32-way `calibration_cpu`
alone conflates: a merely-SLOW host moves both calibrations together,
while co-tenancy that steals CORES slows the 32-way wall beyond the
single-core one.  Both checkers print the effective-core ratio
(CAL scale / serial scale) and annotate wall trips it explains; the
ratio only sees contention present AT calibration time — a burst that
misses the calibration window still reads 1.0, which is the honest
answer (the pair rule is what demotes bursts).

The parallel plan shapes themselves remain guarded structurally where
it matters: the gate entries RAISE in-entry when a sliced/tiled/ranged
plan silently degrades (q231/q234/q236/q237/q239), failing CORRECTNESS
rather than waiting on a bench delta.
"""
import json
import statistics
import sys

CAL = "calibration_cpu"
# The serial twin (ONE partition, 1/32 the work): its wall tracks
# single-core speed where CAL's 32-way wall tracks aggregate throughput.
# The PAIR separates "host is slow" (both move together) from "host lost
# cores to co-tenancy" (CAL moves, serial doesn't) — the signature behind
# the recurring driver-run wall-only noise (judge r17: calibration 0.97x
# while 43 byte-identical entries ran 1.5-3x wall medians at flat CPU).
CAL_SERIAL = "calibration_serial"
# effective-core ratio (CAL wall scale / serial wall scale) above which a
# wall trip is annotated as explained by lost parallelism
EFF_CORE_NOTE = 1.25
# Named CANARY entries: adjudicated environment-sensitive (VERDICT r17
# Next #2), their trips print as canary notes and never escalate to
# flags.  q121 is the one entry that flagged on driver-class hosts in
# r16 AND both r17 adjudication runs on byte-identical code; BenchOne
# isolation (r18, idle host) attributed it: ~15-20 CPU-seconds of
# ONE-TIME codegen + JIT tier-up of its fused md5 hash expressions
# (cold 2.8s wall / 21s cpu -> warm 0.42s / 2s over ten runs) hide
# inside ~0.5s wall on an idle 32-way host but stretch 2-4x on BOTH
# axes when co-tenancy starves the C2 compiler threads — the largest
# per-suite marginal-compilation entry, so it amplifies compile-thread
# starvation that already-warm generic-Tungsten entries don't see.
# The Scala port (graft.BenchPair) must keep an identical set.
CANARIES = {
    "q121_bloom_filter":
        "JIT-compilation canary — one-time codegen+tier-up of its fused "
        "md5 hash expressions (~15-20 cpu-s) amplifies compiler-thread "
        "starvation under co-tenancy; environmental, see NOTES.md",
}
FLAG_RATIO = 1.5
WALL_ABS_FLOOR = 0.5
# CPU floor: scheduling/GC jitter sums over 32 ways, so the absolute
# floor scales with the entry's own CPU median (judge r16: 11 spurious
# both-axis flags on byte-identical sub-second entries under 0.5 s flat)
CPU_ABS_FLOOR_MIN = 2.0
CPU_ABS_FLOOR_FRAC = 0.3


def load(path):
    with open(path) as f:
        return json.load(f)


def scale_of(run_vals: dict, med_vals: dict, key: str = CAL) -> float:
    """Host-speed ratio from a calibration entry; 1.0 when absent."""
    if med_vals.get(key, 0) > 0 and run_vals.get(key, 0) > 0:
        return run_vals[key] / med_vals[key]
    return 1.0


def eff_core_ratio(run_vals: dict, med_vals: dict) -> float:
    """CAL wall drift / CAL_SERIAL wall drift: ~1.0 on a merely-slow host
    (both calibrations move together), >1 when the 32-way calibration
    lost throughput the single-core one did not — lost effective cores.
    1.0 when either entry is missing (pre-serial runs/medians).
    """
    serial = scale_of(run_vals, med_vals, CAL_SERIAL)
    if serial <= 0 or CAL_SERIAL not in med_vals or CAL_SERIAL not in run_vals:
        return 1.0
    return scale_of(run_vals, med_vals, CAL) / serial


def exceeds_wall(norm: float, median: float) -> bool:
    return norm > FLAG_RATIO * median and norm - median > WALL_ABS_FLOOR


def exceeds_cpu(norm: float, median: float) -> bool:
    floor = max(CPU_ABS_FLOOR_MIN, CPU_ABS_FLOOR_FRAC * median)
    return norm > FLAG_RATIO * median and norm - median > floor


def classify(med_doc: dict, run: dict) -> dict:
    """One run's per-entry verdicts: name -> ('both'|'wall'|'flag_nocpu',
    detail dict).  'both' = both axes tripped; 'wall' = wall tripped,
    CPU flat; 'flag_nocpu' = wall tripped and no CPU data exists (the
    wall rule alone decides).  Entries below the wall rule are absent.
    """
    medians = med_doc["medians"]
    cpu_medians = med_doc.get("cpu_medians", {})
    run_cpu = run.get("cpu_queries", {})
    wall_scale = scale_of(run["queries"], medians)
    cpu_scale = scale_of(run_cpu, cpu_medians)
    out = {}
    for name, t in run["queries"].items():
        if (name in (CAL, CAL_SERIAL) or name not in medians
                or medians[name] <= 0 or t < 0):
            continue
        norm = t / wall_scale
        if not exceeds_wall(norm, medians[name]):
            continue
        cpu_med = cpu_medians.get(name, 0)
        cpu_t = run_cpu.get(name, -1)
        detail = {"t": t, "norm": norm, "med": medians[name],
                  "cpu_norm": -1.0, "cpu_med": -1.0}
        if cpu_med > 0 and cpu_t >= 0:
            cpu_norm = cpu_t / cpu_scale
            detail["cpu_norm"], detail["cpu_med"] = cpu_norm, cpu_med
            kind = "both" if exceeds_cpu(cpu_norm, cpu_med) else "wall"
        else:
            kind = "flag_nocpu"
        out[name] = (kind, detail)
    return out


def fmt(detail: dict) -> str:
    base = (f"{detail['t']:.2f}s raw, {detail['norm']:.2f}s normalized "
            f"vs median {detail['med']:.2f}s "
            f"({detail['norm'] / detail['med']:.2f}x)")
    if detail["cpu_med"] > 0:
        return (base + f", cpu {detail['cpu_norm']:.2f}s vs median "
                f"{detail['cpu_med']:.2f}s "
                f"({detail['cpu_norm'] / detail['cpu_med']:.2f}x)")
    return base + ", no cpu medians (wall rule alone)"


def check(medians_path: str, run_path: str) -> int:
    med_doc, run = load(medians_path), load(run_path)
    medians = med_doc["medians"]
    cpu_medians = med_doc.get("cpu_medians", {})
    run_cpu = run.get("cpu_queries", {})
    wall_scale = scale_of(run["queries"], medians)
    cpu_scale = scale_of(run_cpu, cpu_medians)
    eff = eff_core_ratio(run["queries"], medians)
    print(f"calibration scale: wall {wall_scale:.3f} "
          f"(run {run['queries'].get(CAL, -1)}s / median {medians.get(CAL, -1)}s), "
          f"serial {scale_of(run['queries'], medians, CAL_SERIAL):.3f}, "
          f"cpu {cpu_scale:.3f} "
          f"(run {run_cpu.get(CAL, -1)}s / median {cpu_medians.get(CAL, -1)}s), "
          f"effective-core ratio {eff:.3f}"
          + (" — the host lost PARALLELISM at calibration time (the 32-way "
             "calibration slowed beyond the single-core one); wall trips "
             "below are annotated" if eff > EFF_CORE_NOTE else ""))
    verdicts = classify(med_doc, run)
    flagged = sorted((n, d) for n, (k, d) in verdicts.items()
                     if k in ("both", "flag_nocpu") and n not in CANARIES)
    canary = sorted((n, d) for n, (k, d) in verdicts.items()
                    if k in ("both", "flag_nocpu") and n in CANARIES)
    wall_only = sorted((n, d) for n, (k, d) in verdicts.items() if k == "wall")
    eff_note = (f" [effective-core ratio {eff:.2f} explains lost "
                f"parallelism]" if eff > EFF_CORE_NOTE else "")
    for name, d in sorted(flagged, key=lambda x: -x[1]["norm"] / x[1]["med"]):
        print(f"FLAG {name}: {fmt(d)}")
    for name, d in canary:
        print(f"note (canary, not flagged) {name}: {fmt(d)} — {CANARIES[name]}")
    for name, d in sorted(wall_only, key=lambda x: -x[1]["norm"] / x[1]["med"]):
        print(f"note (wall-only, not flagged) {name}: {fmt(d)} — host "
              f"contention OR a blocking/parallelism change; the pair rule "
              f"(--check-pair) escalates it if the NEXT run repeats it{eff_note}")
    print(f"{len(flagged)} flagged of {len(run['queries'])} entries "
          f"(rule: BOTH normalized wall AND cpu > {FLAG_RATIO}x median, cpu floor "
          f"max({CPU_ABS_FLOOR_MIN}, {CPU_ABS_FLOOR_FRAC}x cpu median) s; "
          f"{len(wall_only)} wall-only notes)")
    return 0


def check_pair(medians_path: str, run1_path: str, run2_path: str) -> int:
    med_doc = load(medians_path)
    run1, run2 = load(run1_path), load(run2_path)
    v1 = classify(med_doc, run1)
    v2 = classify(med_doc, run2)
    effs = (eff_core_ratio(run1["queries"], med_doc["medians"]),
            eff_core_ratio(run2["queries"], med_doc["medians"]))
    print(f"effective-core ratio: run1 {effs[0]:.3f}, run2 {effs[1]:.3f}")
    # a wall-only escalation is ANNOTATED (not demoted) when BOTH runs'
    # calibrations show lost parallelism — the adjudicator weighs it
    both_lost = all(e > EFF_CORE_NOTE for e in effs)
    flagged, transient, canary = [], [], []
    for name in sorted(set(v1) | set(v2)):
        k1 = v1.get(name, (None,))[0]
        k2 = v2.get(name, (None,))[0]
        d = (v2.get(name) or v1.get(name))[1]
        if k1 is None or k2 is None:
            transient.append((name, (k1 or k2), d))
        elif name in CANARIES:
            canary.append((name, d))
        elif {k1, k2} <= {"both", "flag_nocpu"}:
            flagged.append((name, "persistent both-axis", d))
        else:
            # the wall axis tripped in BOTH runs; cpu flat in at least one —
            # host contention does not follow one entry across two runs
            why = "persistent wall — escalated"
            if both_lost:
                why += (f" [both runs lost effective cores at calibration: "
                        f"{effs[0]:.2f}/{effs[1]:.2f}]")
            flagged.append((name, why, d))
    for name, why, d in sorted(flagged, key=lambda x: -x[2]["norm"] / x[2]["med"]):
        print(f"FLAG {name} ({why}): latest run {fmt(d)}")
    for name, d in canary:
        print(f"note (canary, not flagged) {name}: {fmt(d)} — {CANARIES[name]}")
    for name, kind, d in transient:
        print(f"note (transient, one run of two) {name} [{kind}]: {fmt(d)}")
    print(f"{len(flagged)} flagged over two consecutive runs "
          f"({len(transient)} transient single-run notes, "
          f"{len(canary)} canary notes)")
    return 0


def main() -> None:
    if sys.argv[1] == "--check":
        sys.exit(check(sys.argv[2], sys.argv[3]))
    if sys.argv[1] == "--check-pair":
        sys.exit(check_pair(sys.argv[2], sys.argv[3], sys.argv[4]))
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
                "(calibration_cpu-normalized, +0.5s floor) AND its cpu median "
                "(+max(2.0, 0.3x median)s floor) — or, across TWO consecutive runs "
                "(--check-pair), when its wall axis trips in both: bursty host "
                "contention inflates one run, a real regression follows the entry "
                "(tools/bench_medians.py --check MEDIANS.json RUN.json | "
                "--check-pair MEDIANS.json RUN1.json RUN2.json)",
        "canaries": CANARIES,
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
