"""Structural lock for gate-sample rotation (VERDICT r6 "Next round" #2).

The driver verifies only the FIRST 50 registry entries per round, so a
query that never rotates into that window never earns external
verification. r6 shipped with 24 never-sampled queries parked at
positions 50-59/189-202 because the hand-maintained front list went
stale. This test recomputes the never-sampled set mechanically from the
committed CORRECTNESS_r*.json artifacts (same logic as
scripts/rotation_status.py) and fails if any member sits outside the
driver's window — making a stale front list a CI red, not a verdict
finding.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

DRIVER_WINDOW = 50


def test_never_driver_sampled_queries_sit_inside_driver_window():
    from rotation_status import sample_history

    from aos_spark.queries import QUERIES

    names = list(QUERIES)
    sampled = sample_history(names)
    pos = {n: i for i, n in enumerate(names)}

    reds = [n for n in names if n in sampled and not sampled[n][1]]
    never = [n for n in names if n not in sampled]

    # Fixed reds need a fresh green row before anything never-sampled.
    out_of_window = {
        n: pos[n] for n in reds + never if pos[n] >= DRIVER_WINDOW
    }
    assert not out_of_window, (
        f"{len(out_of_window)} queries needing driver verification sit at "
        f"registry positions >= {DRIVER_WINDOW} (outside the driver's "
        f"per-round sample). Re-run scripts/rotation_status.py and paste "
        f"its suggested front-load into aos_spark/queries.py: "
        f"{out_of_window}"
    )


def test_front_list_covers_every_query_needing_verification():
    """The committed front list must contain every red / never-sampled
    query (extras are harmless — they just get re-verified), so the
    hand-pasted list cannot silently omit what the artifacts say needs a
    driver row. Once a later CORRECTNESS_r*.json greens them, the
    requirement set shrinks and this stays green until new queries ship."""
    from rotation_status import sample_history

    from aos_spark.queries import _R7_FRONT, QUERIES

    names = list(QUERIES)
    sampled = sample_history(names)
    reds = [n for n in names if n in sampled and not sampled[n][1]]
    never = [n for n in names if n not in sampled]
    expected = set(reds + never)
    missing = expected - set(_R7_FRONT)
    assert not missing, (
        f"front list omits queries needing driver verification: "
        f"{sorted(missing)}"
    )
