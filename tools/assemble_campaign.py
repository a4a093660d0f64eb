"""Merge scaling-bench run records (the per-run JSON lines each
invocation prints) into BENCH/campaign.json with the campaign-level
estimators: per-run efficiency distribution + the matched-minima bound
(min lo rep / 4×min hi rep across all runs — the consistent estimator
under one-sided co-tenant contamination).

Usage: python tools/assemble_campaign.py log1 [log2 ...]
Also accepts summary-only lines of the form
``run k/n: eff=X (lo Ls <est>, hi Hs <est>)`` for runs whose per-pass
JSON was lost to a crash.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUMMARY = re.compile(
    r"run \d+/\d+: eff=([\d.]+) \(lo ([\d.]+)s (\w+), hi ([\d.]+)s (\w+)\)"
)


def main() -> None:
    runs: list[dict] = []
    summaries: list[dict] = []
    for path in sys.argv[1:]:
        for line in open(path, errors="replace"):
            line = line.strip()
            if line.startswith("{") and '"low"' in line and '"high"' in line:
                runs.append(json.loads(line))
            else:
                m = _SUMMARY.search(line)
                if m:
                    eff, lo, lo_est, hi, hi_est = m.groups()
                    summaries.append(
                        {
                            "low": {"sec": float(lo), "estimator": lo_est},
                            "high": {"sec": float(hi), "estimator": hi_est},
                            "scaling_efficiency": float(eff),
                            "detail": "summary-only (per-pass record lost)",
                        }
                    )
    # a summary duplicates a detailed record when both rep times agree
    # within print rounding — keep the detailed one
    def dup(s: dict) -> bool:
        return any(
            abs(s["low"]["sec"] - r["low"]["sec"]) < 0.15
            and abs(s["high"]["sec"] - r["high"]["sec"]) < 0.15
            for r in runs
        )

    runs += [s for s in summaries if not dup(s)]
    if not runs:
        sys.exit("no run records found")

    effs = sorted(r["scaling_efficiency"] for r in runs)

    def leg_min(leg: str) -> float:
        # symmetric estimator: per-pass minimum across the campaign
        # for BOTH legs (rep time as fallback for summary-only runs)
        return min(
            min((p["sec"] for p in r[leg].get("passes", [])), default=r[leg]["sec"])
            for r in runs
        )

    lo_min, hi_min = leg_min("low"), leg_min("high")
    campaign = {
        "n_runs": len(runs),
        "efficiencies": effs,
        "median_efficiency": round(effs[len(effs) // 2], 3),
        "matched_minima_efficiency": round(lo_min / (4 * hi_min), 3),
        "lo_min_sec": lo_min,
        "hi_min_sec": hi_min,
        "runs": runs,
    }
    out = os.path.join(REPO, "BENCH", "campaign.json")
    with open(out, "w") as f:
        json.dump(campaign, f, indent=1)
    print(json.dumps({k: v for k, v in campaign.items() if k != "runs"}, indent=1))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
