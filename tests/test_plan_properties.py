"""Physical-plan property tests: the scale contracts PLANS.md claims,
asserted mechanically from explain() output so regressions in pushdown,
pruning, or join strategy fail CI instead of surfacing at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from aos_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_reach_the_scan(spark):
    plan = _plan(QUERIES["q6_discount_revenue"](spark, SF))
    assert "PushedFilters:" in plan
    # the date bounds and quantity bound must be pushed to parquet
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]


def test_q6_scan_is_column_pruned(spark):
    plan = _plan(QUERIES["q6_discount_revenue"](spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 4 referenced columns — a scan reading l_comment-style extras
    # for a 1-column aggregate is wrong
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    for col in ("l_orderkey", "l_returnflag", "l_partkey"):
        assert col not in read_schema


def test_q1_scan_is_column_pruned(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema


def test_flagship_has_no_cartesian_product(spark):
    plan = _plan(QUERIES["flagship_storm_impact"](spark, SF))
    assert "CartesianProduct" not in plan


def test_q5_dims_broadcast_not_sortmerge(spark):
    """The snowflake dims (nation, region) must come in as broadcast
    joins — a SortMergeJoin against a 5-row region table would shuffle
    the fact for nothing."""
    plan = _plan(QUERIES["q5_regional_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_whole_stage_codegen_covers_q6(spark):
    """The scan→filter→project→partial-agg pipeline must sit inside one
    codegen stage (AdaptiveSparkPlan's formatted output hides the stage
    markers, so check the non-AQE plan string)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q6_discount_revenue"](spark, SF)
        simple = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(1)" in simple  # codegen stage 1 exists and spans the scan side


def test_no_query_uses_rdds(spark):
    """Every gate query must stay in the DataFrame/Catalyst world: building
    the plan must never trigger an RDD job with Python workers (collects
    during CONSTRUCTION are the anti-pattern; small-side collects inside
    documented operators run at execution, not here)."""
    # construction-time check only: these three are the newest query files
    for name in ("json_props_stats", "reconcile_tables", "sketch_quantile_histogram"):
        df = QUERIES[name](spark, SF)
        assert df.columns  # plan resolves without execution


def test_registry_wide_no_cartesian_and_global_window_allowlist(spark):
    """Sweep EVERY registered query's plan: no CartesianProduct anywhere,
    no row-at-a-time Python eval anywhere, the GLOBAL-window set must
    equal the reviewed allowlist below — each allowlisted query's global
    window runs over a BOUNDED dim frame (a histogram, a |strata| plan,
    a vocab), never the fact table — and each query's plan-node
    fingerprint (shuffle/broadcast/join/sort/Python counts) must match
    the committed ``PLAN_FINGERPRINT.json``, so an edit that silently
    adds a shuffle or downgrades a broadcast join to ANY of the 203
    queries fails here instead of at 100 TB. On intended plan changes,
    review the printed drift and regenerate with
    ``python scripts/plan_fingerprint.py``."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from plan_fingerprint import ARTIFACT, diff, query_fingerprint  # noqa: E402

    from aos_spark.cache import release_tracked
    from aos_spark.queries import QUERIES

    # reviewed r6: every entry windows a bounded frame (histogram bins,
    # daily series, 5-row strata plans, vocab-sized frames)
    GLOBAL_WINDOW_OK = {
        "cusum_change_point",
        "ks_length_drift",
        "sequence_gap_detection",
        "sketch_quantile_histogram",
        "stratified_allocation_sample",
        "vocab_encode_tokens",
    }

    def nodes(p):
        yield p
        for i in range(p.children().size()):
            yield from nodes(p.children().apply(i))

    cartesian, global_win, fingerprints = [], set(), {}
    for name, fn in sorted(QUERIES.items()):
        # same cache hygiene as the generator: caches left by earlier
        # queries (or earlier tests) change later plans, so every query
        # is fingerprinted against an empty cache
        release_tracked()
        spark.catalog.clearCache()
        df = fn(spark, SF)
        opt = df._jdf.queryExecution().optimizedPlan()
        for n in nodes(opt):
            if (
                n.getClass().getSimpleName() == "Window"
                and n.partitionSpec().isEmpty()
            ):
                global_win.add(name)
        fingerprints[name] = query_fingerprint(df)
        if fingerprints[name]["cartesian"]:
            cartesian.append(name)
    release_tracked()
    spark.catalog.clearCache()
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    unexpected = global_win - GLOBAL_WINDOW_OK
    stale = GLOBAL_WINDOW_OK - global_win
    assert not unexpected, f"new GLOBAL windows (corpus-wide sort risk): {sorted(unexpected)}"
    assert not stale, f"allowlist entries no longer global-windowed: {sorted(stale)}"

    # row-at-a-time Python eval is the anti-pattern — zero, independently
    # of whatever the committed artifact says
    row_py = sorted(n for n, f in fingerprints.items() if f["row_python"])
    assert not row_py, f"BatchEvalPython (row-at-a-time UDF) in: {row_py}"

    committed = json.loads(ARTIFACT.read_text())["queries"]
    drift = diff(committed, fingerprints)
    assert not drift, (
        "plan fingerprint drift vs PLAN_FINGERPRINT.json — review each "
        "line (intended improvement → regenerate via `python "
        "scripts/plan_fingerprint.py`; accidental shuffle/join regression "
        "→ fix the code):\n" + "\n".join(drift)
    )


def _sf1_invariant_imports():
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "scripts"))
    import bench_sf1  # noqa: E402
    import plan_fingerprint  # noqa: E402

    return repo, bench_sf1, plan_fingerprint


def test_sf1_scaling_queries_keep_scale_killer_invariants():
    """r13 (VERDICT #2), layer 1 of 2: PLANS.md's sf1 addendum claims
    0 cartesian / 0 row-Python across the 28 scaling-diagnostic queries
    at the sf1 data dir — this makes the claim mechanical. The committed
    SF1_PLAN_INVARIANTS.json (regenerated via ``python
    scripts/plan_fingerprint.py --invariants`` at close-out) must cover
    exactly scripts/bench_sf1.DEFAULT_QUERIES with zero scale-killer
    nodes everywhere. Layer 2 (the live re-fingerprint) is the slow test
    below — ADVICE r13: a ~52 s sweep must not land in the fast tier.

    Stats-driven broadcast<->SMJ flips at 10x data are EXPECTED and
    deliberately not locked (five flipped in r12, all fine); the two
    scale-killer node classes must never flip."""
    import json

    _, bench_sf1, plan_fingerprint = _sf1_invariant_imports()

    committed = json.loads(plan_fingerprint.SF1_ARTIFACT.read_text())["queries"]
    assert set(committed) == set(bench_sf1.DEFAULT_QUERIES), (
        "SF1_PLAN_INVARIANTS.json does not cover exactly the diagnostic "
        "set — regenerate: python scripts/plan_fingerprint.py --invariants"
    )
    bad = {
        n: {"cartesian": f["cartesian"], "row_python": f["row_python"]}
        for n, f in committed.items() if f["cartesian"] or f["row_python"]
    }
    assert not bad, f"committed sf1 artifact has scale-killer nodes: {bad}"


@pytest.mark.slow
def test_sf1_scaling_queries_live_refingerprint(spark):
    """Layer 2: when the derived sf1 dataset exists (scripts/make_sf1.py,
    gitignored), live-refingerprint every diagnostic query EXCEPT the
    four whose construction materializes data (50-90 s each even at
    local[32] — SF1_HEAVY_CONSTRUCTION) and assert the live scale-killer
    counts are still zero, so code drift can't hide behind a stale
    artifact for the cheap 24. Slow-marked (ADVICE r13) — the fast tier
    keeps only the committed-artifact layer above."""
    repo, bench_sf1, plan_fingerprint = _sf1_invariant_imports()

    sf1 = repo / ".sf1_data"
    if not (sf1 / "lineitem.parquet").exists():
        pytest.skip("no local .sf1_data — artifact layer still verified")
    cheap = [
        n
        for n in bench_sf1.DEFAULT_QUERIES
        if n not in plan_fingerprint.SF1_HEAVY_CONSTRUCTION
    ]
    live = plan_fingerprint.sf1_invariant_sweep(spark, str(sf1), names=cheap)
    live_bad = {
        n: {"cartesian": f["cartesian"], "row_python": f["row_python"]}
        for n, f in live.items() if f["cartesian"] or f["row_python"]
    }
    assert not live_bad, f"live sf1 scale-killer nodes: {live_bad}"
