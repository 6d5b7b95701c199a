"""Physical-plan fingerprint for every registered query.

Counts the plan-shape-critical node types in each query's initial physical
plan at sf0.01 and writes ``PLAN_FINGERPRINT.json`` — the committed
artifact that ``tests/test_plan_properties.py`` diffs against on every CI
run. The point: a future edit that silently adds a shuffle, downgrades a
broadcast join to a sort-merge join, or introduces a row-at-a-time Python
eval to ANY of the 203 queries turns a test red at sf0.01 instead of
surfacing as a 100 TB incident. Counts (not full plan-string hashes) so
the lock is robust to expression-id / path churn while still pinning the
exchange structure.

Node classes counted (from ``executedPlan().toString()`` — the AQE
*initial* plan, deterministic for fixed code + fixed input files, no
execution needed):

- ``shuffles``       Exchange hash/range/SinglePartition (each is a full
                     shuffle of its input at scale)
- ``broadcasts``     BroadcastExchange (small-side hash relation builds)
- ``smj``            SortMergeJoin
- ``bhj``            BroadcastHashJoin
- ``bnlj``           BroadcastNestedLoopJoin (bounded-side inequality joins)
- ``sorts``          Sort nodes (global or per-partition)
- ``arrow_python``   ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                     (+WithState) / AggregateInPandas — the sanctioned
                     vectorized Python path
- ``row_python``     BatchEvalPython — row-at-a-time Python UDFs; the
                     anti-pattern, asserted ZERO for every query

Usage:
    python scripts/plan_fingerprint.py [sf_dir]        # (re)generate
    python scripts/plan_fingerprint.py --check [sf_dir]  # diff, exit 1 on drift

Regenerate ONLY after reviewing the diff the failing test prints: a
changed count is either an intended plan improvement (commit the new
artifact with the code change) or an accidental regression (fix the code).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARTIFACT = Path(__file__).resolve().parent.parent / "PLAN_FINGERPRINT.json"
DEFAULT_SF = "/root/testdata/sf0.01"

# node-name → fingerprint key; matched as word-prefixed operator names so
# e.g. "ReusedExchange" never counts as a shuffle and "SortAggregate"
# never counts as a Sort.
_PATTERNS: dict[str, re.Pattern[str]] = {
    "shuffles": re.compile(
        r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
    ),
    "broadcasts": re.compile(r"\bBroadcastExchange\b"),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "sorts": re.compile(r"\bSort \["),
    "arrow_python": re.compile(
        r"\b(?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas(?:WithState)?"
        r"|AggregateInPandas|MapInArrow)\b"
    ),
    "row_python": re.compile(r"\bBatchEvalPython\b"),
}


def fingerprint_plan(plan_str: str) -> dict[str, int]:
    """Count plan-shape-critical nodes in a physical-plan string."""
    return {key: len(pat.findall(plan_str)) for key, pat in _PATTERNS.items()}


def query_fingerprint(df) -> dict[str, int]:
    """Fingerprint a DataFrame's initial physical plan (no execution)."""
    return fingerprint_plan(df._jdf.queryExecution().executedPlan().toString())


def sweep(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    from aos_spark.cache import release_tracked
    from aos_spark.queries import QUERIES

    out: dict[str, dict[str, int]] = {}
    for name, fn in sorted(QUERIES.items()):
        # cache state left by EARLIER queries changes LATER plans (an
        # InMemoryTableScan can absorb an exchange), and the pytest
        # session's cache state differs from this generator's — so every
        # query is fingerprinted against an empty cache. Persisted frames
        # recompute transparently; this is plan-shape-only hygiene.
        release_tracked()
        spark.catalog.clearCache()
        out[name] = query_fingerprint(fn(spark, sf_dir))
    release_tracked()
    spark.catalog.clearCache()
    return out


def diff(old: dict, new: dict) -> list[str]:
    lines = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            lines.append(f"NEW query (regen artifact): {name} {new[name]}")
        elif name not in new:
            lines.append(f"REMOVED query (regen artifact): {name}")
        elif old[name] != new[name]:
            delta = {
                k: f"{old[name].get(k, 0)}->{v}"
                for k, v in new[name].items()
                if old[name].get(k, 0) != v
            }
            lines.append(f"PLAN DRIFT {name}: {delta}")
    return lines


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--check"]
    check = "--check" in sys.argv[1:]
    sf_dir = args[0] if args else DEFAULT_SF

    from aos_spark.envinfo import env_fingerprint
    from aos_spark.session import get_spark

    spark = get_spark("plan_fingerprint")
    fp = sweep(spark, sf_dir)

    if check:
        if not ARTIFACT.exists():
            print("no PLAN_FINGERPRINT.json — run without --check to create")
            return 1
        old = json.loads(ARTIFACT.read_text())["queries"]
        lines = diff(old, fp)
        for line in lines:
            print(line)
        print(f"{'DRIFT' if lines else 'OK'}: {len(lines)} differing queries "
              f"of {len(fp)}")
        return 1 if lines else 0

    ARTIFACT.write_text(
        json.dumps(
            {"__env__": dict(env_fingerprint(spark), sf_dir=sf_dir),
             "queries": fp},
            indent=1, sort_keys=True,
        )
        + "\n"
    )
    totals = {k: sum(q[k] for q in fp.values()) for k in _PATTERNS}
    print(f"wrote {ARTIFACT.name}: {len(fp)} queries, totals {totals}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
