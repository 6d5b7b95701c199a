"""Interleaved per-query A/B between a baseline ref and HEAD.

The box's throughput drifts in bursts (loadavg spikes of external
origin — PLANS.md round-10/15 addenda), so a per-query delta is only
trustworthy when the two legs run INTERLEAVED in the same era:
A B A B ... with a fresh JVM per leg (bench_one.py), min-of-warms per
side. This is the arbiter the verify skill prescribes below the
~0.5 s sweep-noise floor.

Usage: python scripts/ab_one.py <baseline-ref> <query> [<query> ...]
         [--reps N] [--warms M]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _bench_one(cwd: Path, query: str, warms: int) -> dict:
    out = subprocess.run(
        [sys.executable, "scripts/bench_one.py", query, str(warms)],
        cwd=cwd, check=True, capture_output=True, text=True, timeout=900,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps, warms = 2, 3
    if "--reps" in args:
        i = args.index("--reps"); reps = int(args[i + 1]); del args[i:i + 2]
    if "--warms" in args:
        i = args.index("--warms"); warms = int(args[i + 1]); del args[i:i + 2]
    base_ref, queries = args[0], args[1:]
    wt = ROOT / ".ab_one_base"
    subprocess.run(
        ["git", "worktree", "add", "--force", str(wt), base_ref],
        cwd=ROOT, check=True, capture_output=True,
    )
    try:
        results = {}
        for q in queries:
            legs = {"base": [], "head": []}
            colds = {"base": [], "head": []}
            for _ in range(reps):
                for tag, cwd in (("base", wt), ("head", ROOT)):
                    r = _bench_one(cwd, q, warms)
                    legs[tag].extend(r["warm"])
                    colds[tag].append(r["cold"])
            b, h = min(legs["base"]), min(legs["head"])
            results[q] = {
                "base_warm_min": b, "head_warm_min": h,
                "speedup": round(b / h, 3),
                "base_warms": legs["base"], "head_warms": legs["head"],
                "base_cold_min": min(colds["base"]),
                "head_cold_min": min(colds["head"]),
            }
            print(json.dumps({q: results[q]}))
        ratios = [r["speedup"] for r in results.values()]
        print(json.dumps({
            "baseline": base_ref, "reps": reps, "warms": warms,
            "median_speedup": round(statistics.median(ratios), 3),
            "summary": {q: r["speedup"] for q, r in results.items()},
        }))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=ROOT, check=False, capture_output=True,
        )


if __name__ == "__main__":
    main()
