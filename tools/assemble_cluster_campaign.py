"""Assemble BENCH/cluster_campaign.json from cluster_bench run lines.

Applies ONE estimator rule uniformly to every recorded run (recomputing
from the raw per-pass data, so runs recorded before a rule change are
graded by the same rule as runs recorded after):

  steady   = passes[2:]  (one warmup pass + two settle passes dropped)
  clean    = steady passes with ext_frac <= 0.10, host_ext_frac <= 0.12
             and pass CPU-seconds <= 1.15 x the leg's minimum (the work
             per pass is constant, so excess CPU measures interference
             that guest /proc cannot see); the minimum is taken over
             externally-clean passes with self_util > 0 only — a pass
             whose worker tree died mid-pass reports NEGATIVE CPU and
             a negative floor would mark every healthy pass dirty
  rep/leg  = median(clean) when both legs keep >= 3 clean passes,
             else min(steady) for BOTH legs (symmetric fallback)
  eff/run  = (rows/rep_hi) / (4 x rows/rep_lo)

Usage: python tools/assemble_cluster_campaign.py out1.jsonl [out2.jsonl ...]
Writes BENCH/cluster_campaign.json and prints the summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg_estimate(leg: dict, cores: int) -> tuple[float, str, int]:
    steady = leg["passes"][2:]
    # CPU floor over externally-clean, sanely-accounted passes only:
    # a mid-pass worker-tree death reports NEGATIVE pass CPU and a
    # negative floor would mark every healthy pass dirty (observed
    # 2026-08-18: 1117s pass, self_util -0.044)
    ext_ok = [
        p
        for p in steady
        if p["ext_frac"] <= 0.10
        and p["host_ext_frac"] <= 0.12
        and p["self_util"] > 0
    ]
    cpu = [p["sec"] * cores * p["self_util"] for p in ext_ok]
    cpu_min = min(cpu) if cpu else float("inf")
    clean = [p["sec"] for p, c in zip(ext_ok, cpu) if c <= 1.15 * cpu_min]
    if len(clean) >= 3:
        return sorted(clean)[len(clean) // 2], "median_clean", len(clean)
    return min(p["sec"] for p in steady), "min_steady", len(clean)


def cpu_floor(leg: dict, cores: int) -> float | None:
    """Minimum pass CPU-seconds over sanely-accounted steady passes.
    The job's work is CPU-invariant across runs on the same code +
    input, so comparing this floor ACROSS runs exposes whole-window
    interference the per-leg rules cannot see (hypervisor steal / bus
    contention inflates every pass of a window uniformly: guest-side
    ext_frac stays 0, the within-leg 1.15x rule passes, but the floor
    itself sits well above other runs' floors).

    Prefers the exact self_cpu_secs field (recorded by newer
    cluster_bench runs) over reconstructing from the 3-decimal-rounded
    self_util, which quantizes to ±13 CPU-seconds on a 1000s pass on a
    24-core budget — enough to swap two runs' floor ordering. Returns
    None (JSON null) when every steady pass lost its worker tree
    mid-pass — float('nan') would serialize as a bare NaN literal and
    make the whole campaign file invalid JSON."""
    cpu = [
        p.get("self_cpu_secs", p["sec"] * cores * p["self_util"])
        for p in leg["passes"][2:]
        if p["self_util"] > 0
    ]
    return round(min(cpu), 1) if cpu else None


def grade_run(run: dict) -> dict:
    lo, hi = run["low"], run["high"]
    lo_rep, lo_est, lo_n = leg_estimate(lo, lo["cpus"])
    hi_rep, hi_est, hi_n = leg_estimate(hi, hi["cpus"])
    if "min_steady" in (lo_est, hi_est):
        lo_rep = min(p["sec"] for p in lo["passes"][2:])
        hi_rep = min(p["sec"] for p in hi["passes"][2:])
        lo_est = hi_est = "min_steady_symmetric"
    eff = (lo["rows"] / hi_rep) / (4 * (lo["rows"] / lo_rep))
    return {
        "low_sec": round(lo_rep, 2),
        "high_sec": round(hi_rep, 2),
        "estimator": lo_est if lo_est == hi_est else f"{lo_est}/{hi_est}",
        "n_clean": [lo_n, hi_n],
        "cpu_floor": [cpu_floor(lo, lo["cpus"]), cpu_floor(hi, hi["cpus"])],
        "scaling_efficiency": round(eff, 3),
        "high_turns_per_sec": round(lo["rows"] / hi_rep, 1),
        "raw": run,
    }


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        for line in open(path):
            line = line.strip()
            # complete one-line run records only (the trailing pretty-
            # printed campaign summary in the same file is skipped)
            if (
                line.startswith("{")
                and line.endswith("}")
                and '"scaling_efficiency"' in line
            ):
                runs.append(grade_run(json.loads(line)))
    if not runs:
        raise SystemExit("no run lines found")
    effs = sorted(r["scaling_efficiency"] for r in runs)
    campaign = {
        "method": (
            "standalone cluster, 1 worker vs 4 workers, 4 cores + 8g "
            "executor each, taskset-pinned, tmpfs local dirs, DISK_ONLY "
            "persists, sequential sink submission; per-pass cleanliness: "
            "ext_frac<=0.10, host_ext_frac<=0.12, pass CPU-seconds "
            "<=1.15x leg minimum (floor over externally-clean passes "
            "with self_util>0 — a mid-pass worker death reports "
            "negative CPU and must not poison the floor); rep = median "
            "of clean steady passes, symmetric min-of-steady fallback; "
            "per-leg cpu_floor recorded so cross-run floor comparison "
            "exposes whole-window interference (same code + input => "
            "pass CPU is invariant; an elevated floor marks the run's "
            "window as degraded by host-level noise the guest cannot "
            "see, discounting its efficiency by rule, not argument)"
        ),
        "sources": [os.path.basename(p) for p in sys.argv[1:]],
        "input_rows": runs[0]["raw"]["low"]["rows"],
        "n_runs": len(runs),
        "efficiencies": effs,
        "median_efficiency": round(statistics.median(effs), 3),
        "runs": runs,
    }
    out = os.path.join(REPO, "BENCH", "cluster_campaign.json")
    with open(out, "w") as f:
        json.dump(campaign, f, indent=1)
    print(json.dumps({k: campaign[k] for k in
                      ("n_runs", "efficiencies", "median_efficiency")}))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
