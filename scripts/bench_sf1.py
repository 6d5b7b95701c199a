"""sf1.0 scaling diagnostic (VERDICT r11 "Next round" #1).

Runs the ~28 most expensive registry queries (the BENCH_LOCAL.json warm
tail) at sf0.1 AND at the derived sf1.0 dataset (scripts/make_sf1.py) in
the SAME JVM, and writes BENCH_SF1_DIAG.json with per-query cold/warm
wall-times at both scales plus the warm scaling ratio.

Interpretation: data grows 10x (dims fixed). A shuffle-bound plan should
land <= ~10-15x warm; a candidate-generation plan (LSH bands, prefix
postings) may legitimately exceed that if candidate pairs grow
super-linearly in n — those get a plan investigation, not a pass.

Usage: python scripts/bench_sf1.py [--queries name1,name2] [--sf1 DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from aos_spark.cache import release_tracked  # noqa: E402
from aos_spark.envinfo import env_fingerprint  # noqa: E402
from aos_spark.queries import QUERIES  # noqa: E402
from aos_spark.session import get_spark  # noqa: E402
from bench import _calibrate  # noqa: E402

# The BENCH_LOCAL.json warm top-28 (r11 sweep) — the queries whose scaling
# behavior carries the 100-TB design claims.
DEFAULT_QUERIES = [
    "dedup_clusters", "lsh_band_collision_stats", "ppjoin_exact_pairs",
    "dedup_resolution", "flagship_storm_impact", "lsh_recall_eval",
    "containment_near_dup", "q1_pricing_summary", "dau_moving_average",
    "graph_pagerank_step", "graph_triangle_count", "semantic_dedup",
    "graph_link_prediction", "assoc_rules_brands", "sim_ivfpq_topk",
    "dedup_threshold_curve", "shard_rebalance_churn", "dedup_ngram_jaccard",
    "q21_sole_blocker_suppliers", "split_leakage_check",
    "text_repetition_stats", "sim_pq_topk", "incremental_dedup_status",
    "mixture_apply_stats", "decontamination_pairs", "winsorized_mean_prices",
    "stats_correlation", "j1_cover_equi_join",
]


def _run(spark, name: str, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for label in ("cold", "warm"):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            out[label] = round(time.time() - t0, 3)
        except Exception as e:  # pragma: no cover - diagnostic robustness
            print(f"  {name} @ {sf_dir}: ERROR {e}", file=sys.stderr)
            msg = str(e)
            if (
                "UNABLE_TO_ACQUIRE_MEMORY" in msg
                or "OutOfMemoryError" in msg
                or "No space left on device" in msg
            ):
                # r13 sf3 finding: these are EXECUTOR SIZING, not plan
                # bugs — the 8 GiB default JVM fails the three heaviest
                # legs (dedup_resolution, dedup_clusters, ppjoin) at sf3;
                # AOS_DRIVER_MEM=32g completes all but ppjoin, which
                # additionally spills ~41 GB and needs that much free
                # executor-local disk on one box. Plan invariants are
                # locked independently (SF1_PLAN_INVARIANTS.json).
                print(
                    f"  {name}: allocation failure — rerun with "
                    "AOS_DRIVER_MEM=32g (and >40 GB free disk for "
                    "ppjoin at sf3); see the verify skill's sf1 section "
                    "before treating this as an engine bug",
                    file=sys.stderr,
                )
            out[label] = -1.0
            break
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=str(_REPO / ".sf1_data"))
    ap.add_argument("--out", default=str(_REPO / "BENCH_SF1_DIAG.json"))
    args = ap.parse_args()
    names = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"

    load_at_start = list(os.getloadavg())
    t_sweep0 = time.time()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("aos-bench-sf1", master=f"local[{cpus}]")
    spark.read.parquet(f"{args.sf01}/nation.parquet").count()
    spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
        lambda it: it, "id long").count()
    calibration_start = _calibrate(spark)

    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        r01 = _run(spark, name, args.sf01)
        r1 = _run(spark, name, args.sf1)
        row = {"sf01": r01, "sf1": r1}
        if r01.get("warm", -1) > 0 and r1.get("warm", -1) > 0:
            row["warm_ratio"] = round(r1["warm"] / r01["warm"], 2)
        results[name] = row
        print(f"[{i + 1}/{len(names)}] {name}: sf0.1 {r01} | sf1 {r1} "
              f"| ratio {row.get('warm_ratio')}", file=sys.stderr)

    ratios = sorted(
        (v["warm_ratio"], k) for k, v in results.items() if "warm_ratio" in v
    )
    doc = {
        "metric": "sf1_over_sf01_warm_ratio",
        "sf1_rows_factor": 10,
        "n_queries": len(names),
        "median_ratio": ratios[len(ratios) // 2][0] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "queries": results,
        "env": dict(
            env_fingerprint(spark),
            loadavg_at_start=load_at_start,
            wall_seconds_total=round(time.time() - t_sweep0, 3),
            calibration_start_sec=calibration_start,
            calibration_end_sec=_calibrate(spark),
            sf1_dir=args.sf1,
            generator="scripts/make_sf1.py (seed 42, replicas 10)",
        ),
    }
    Path(args.out).write_text(json.dumps(doc, indent=2) + "\n")
    print(json.dumps({k: doc[k] for k in
                      ("median_ratio", "max_ratio", "n_queries")}))


if __name__ == "__main__":
    main()
