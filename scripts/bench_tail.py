"""Deflake the bench artifact: isolated numbers for the slowest queries.

The bench.py sweep shares one JVM across all ~190 queries, so the tail's
numbers carry 2-3x ordering/GC noise (r4's sim_lsh scare, r5's
corpus_quality_filter scare — both disproved by isolated reruns). This
script re-runs the top-N warm-slowest queries from BENCH_LOCAL.json each
in a FRESH process (scripts/bench_one.py discipline: own JVM, cold + N
warm runs) and writes the results under an "isolated" key in
BENCH_LOCAL.json, so round-over-round verdict comparisons can read
noise-free figures without reconstructing them.

Usage: python scripts/bench_tail.py [top_n] [n_warm]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    art = ROOT / "BENCH_LOCAL.json"
    full = json.loads(art.read_text())
    warm = {k: v for k, v in full["queries"].items() if v >= 0}
    tail = sorted(warm, key=warm.get, reverse=True)[:top_n]

    isolated: dict[str, dict] = {}
    for name in tail:
        # the tail is by construction the SLOWEST queries, so a timeout
        # is the most likely per-query failure — record it and keep
        # going rather than losing every collected number (r6 review)
        try:
            proc = subprocess.run(
                [sys.executable, str(ROOT / "scripts" / "bench_one.py"),
                 name, str(n_warm)],
                capture_output=True, text=True, timeout=600,
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (600s)", file=sys.stderr)
            isolated[name] = {"error": True, "timeout": True}
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            r = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(f"FAIL {name}: {proc.stderr[-300:]}", file=sys.stderr)
            isolated[name] = {"error": True}
            continue
        isolated[name] = {
            "cold": r["cold"], "warm_min": r["warm_min"],
            "sweep_warm": warm[name],
        }
        print(f"{name}: sweep {warm[name]:.2f}s -> isolated "
              f"warm_min {r['warm_min']:.2f}s (cold {r['cold']:.2f}s)")

    full["isolated"] = isolated
    # Generation stamp: when bench.py later carries this block across a
    # sweep refresh it adds carried_forward=True, so a reader can tell
    # fresh tail numbers from inherited ones (ADVICE r8).
    from datetime import datetime, timezone

    full["isolated_meta"] = {
        "generated_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_warm": n_warm,
        "carried_forward": False,
    }
    art.write_text(json.dumps(full, indent=2) + "\n")
    print(f"wrote isolated tail ({len(isolated)} queries) to {art}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
