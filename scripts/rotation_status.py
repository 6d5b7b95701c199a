"""Gate-rotation bookkeeping: which registered queries have a
driver-green CORRECTNESS row, which were sampled but red, and which have
never been driver-sampled at all.

The driver verifies only the FIRST 50 registry entries per round, so
iteration order decides what gets external verification (rotation
history in aos_spark/queries.py). Every round the front-load list had to
be recomputed by hand from the CORRECTNESS_r*.json artifacts; this
script does it mechanically and prints a ready-to-paste front list:
reds first (fixed bugs need fresh green rows), then never-sampled
newest-first (newest = shipped after the oldest full local gate they
appear in, approximated by registry position).

Usage: python scripts/rotation_status.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def sample_history(names: list[str]) -> dict[str, tuple[int, bool]]:
    """name -> (last driver round that sampled it, green?) from the
    committed CORRECTNESS_r*.json artifacts. Shared with
    tests/test_rotation.py's structural lock."""
    sampled: dict[str, tuple[int, bool]] = {}
    for art in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(art.stem.split("_r")[1])
        for name, row in json.loads(art.read_text()).items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            prev = sampled.get(name)
            # latest round wins; a later green supersedes an earlier red
            if prev is None or rnd >= prev[0]:
                sampled[name] = (rnd, green)
    return sampled


def main() -> int:
    from aos_spark.queries import QUERIES

    names = list(QUERIES)
    sampled = sample_history(names)

    reds = [n for n in names if n in sampled and not sampled[n][1]]
    never = [n for n in names if n not in sampled]
    greens = [n for n in names if n in sampled and sampled[n][1]]

    print(f"registered: {len(names)}")
    print(f"driver-green: {len(greens)}")
    print(f"driver-red (latest sample): {len(reds)} {reds}")
    print(f"never driver-sampled: {len(never)}")
    for n in never:
        print(f"  {n}")

    front = reds + list(reversed(never))  # newest waves sit last in registry
    print("\nsuggested front-load (reds, then never-sampled newest-first):")
    print(front[:50])
    if len(front) > 50:
        print(f"... {len(front) - 50} more queue for the round after")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
