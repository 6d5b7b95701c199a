"""Same-day A/B of the full bench sweep between two commits.

Round 10's lesson (PLANS.md round-10 addendum): the box's effective
throughput drifts ±30% between measurement eras on UNCHANGED code, even
at idle loadavg — so a sweep total is only comparable against a prior
round's number through a same-day, same-box A/B of both commits. This
script mechanizes the procedure that round-10 ran by hand:

1. `git worktree add` a throwaway checkout of the baseline ref;
2. run `bench.py` there, then at HEAD, back-to-back and EXCLUSIVELY
   (nothing else Spark-sized may run — the verify skill's gotcha);
3. print totals, the per-query delta table, and the median ratio
   (the era-drift-free code-attribution signal);
4. remove the worktree.

Per-query deltas under ~0.5 s are shared-JVM noise (bench_one.py with
INTERLEAVED runs is the arbiter below that); the median ratio and the
totals are the robust signals.

Usage: python scripts/bench_ab.py <baseline-ref> [--keep]
Writes nothing to the repo's BENCH_LOCAL.json (HEAD's sweep runs in a
second throwaway worktree of HEAD, so the artifact of record is never
clobbered by a diagnostic run).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run_sweep(ref: str, tag: str) -> dict:
    wt = ROOT / f".ab_{tag}"
    subprocess.run(
        ["git", "worktree", "add", "--force", str(wt), ref],
        cwd=ROOT, check=True, capture_output=True,
    )
    try:
        load0 = Path("/proc/loadavg").read_text().split()[0]
        # pin the artifact path explicitly: r13 inverted bench.py's default
        # (gitignored BENCH_SWEEP.json unless opted into the committed
        # file), and both old and new bench.py honor SPARK_GRAFT_BENCH_OUT
        # — so this works for any baseline ref on either side of the flip
        import os

        art = wt / "ab_sweep.json"
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=wt, check=True,
            capture_output=True, text=True, timeout=1200,
            env=dict(os.environ, SPARK_GRAFT_BENCH_OUT=str(art)),
        )
        head_line = json.loads(out.stdout.strip().splitlines()[-1])
        full = json.loads(art.read_text())
        # r11: surface the leg's own instrumentation (present when the ref
        # carries the round-10 instrumented bench.py; absent for older
        # tags) so leg-order bias and mid-A/B era drift are readable from
        # the A/B output itself, not just the committed artifact
        env = full.get("env", {})
        return {
            "ref": ref,
            "loadavg_at_start": load0,
            "value": head_line["value"],
            "cold_value": head_line["cold_value"],
            "queries": full["queries"],
            "calibration": (
                env.get("calibration_start_sec"),
                env.get("calibration_end_sec"),
            ),
            "load_start_end": (
                env.get("loadavg_at_start"),
                env.get("loadavg_1_5_15"),
            ),
        }
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=ROOT, check=False, capture_output=True,
        )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    base_ref = sys.argv[1]
    a = _run_sweep(base_ref, "base")
    print(f"baseline {base_ref}: {a['value']} steady / {a['cold_value']} cold "
          f"(loadavg {a['loadavg_at_start']} at start)", flush=True)
    b = _run_sweep("HEAD", "head")
    print(f"HEAD: {b['value']} steady / {b['cold_value']} cold "
          f"(loadavg {b['loadavg_at_start']} at start)", flush=True)
    for leg in (a, b):
        c0, c1 = leg["calibration"]
        if c0 is not None:
            print(f"  {leg['ref']}: calibration {c0}s start / {c1}s end, "
                  f"load {leg['load_start_end'][0]} -> {leg['load_start_end'][1]}")

    qa, qb = a["queries"], b["queries"]
    common = [k for k in qb if k in qa and qa[k] > 0 and qb[k] > 0]
    # materialize first (ADVICE r10): statistics.median raises on an empty
    # generator, killing the script AFTER both sweeps already ran
    ratios = [qb[k] / qa[k] for k in common if qa[k] > 0.2]
    if ratios:
        print(f"\nmedian per-query ratio (HEAD/base, q>0.2s): "
              f"{statistics.median(ratios):.3f}")
    else:
        print("\nmedian per-query ratio (HEAD/base, q>0.2s): n/a "
              "(no common query exceeded 0.2 s)")
    deltas = sorted(((qb[k] - qa[k], qa[k], qb[k], k) for k in common),
                    reverse=True)
    print("top regressions (delta, base, head) — <0.5 s is sweep noise:")
    for d, x, y, k in deltas[:10]:
        print(f"  {d:+6.2f}  {x:5.2f} -> {y:5.2f}  {k}")
    print("top improvements:")
    for d, x, y, k in deltas[-10:]:
        print(f"  {d:+6.2f}  {x:5.2f} -> {y:5.2f}  {k}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
