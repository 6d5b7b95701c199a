"""Outlier investigation pass for the sf1.0 scaling diagnostic.

VERDICT r11 "Next round" #1 says any super-linear sweep outlier gets a
plan investigation — "fixed or explained with its plan". The r12 sweep
(BENCH_SF1_DIAG.json, pre-fix) flagged four queries above the ~15x band:

- lsh_recall_eval 59.8x — FIXED in-engine: the fraction sample made the
  by-design quadratic truth stage O((0.2*N)^2); the registry now passes
  an absolute ``sample_docs=1000`` cap (TakeOrdered over the md5 hash),
  making the eval O(k^2) at any corpus size. This script re-measures it.
- semantic_dedup 25.8x — PARAMETER REGIME, not plan: the r12 registry
  pinned n_clusters=8 (right for the 500-doc gate), so the
  within-cluster verify join quadrupled per 2x data. This script
  measured the sqrt(N) regime (45 clusters at sf0.1, 141 at sf1) to
  show the plan itself scales; RESOLVED r13 — the engine default is now
  n_clusters=None -> ceil(sqrt(N)) and the registry uses it (re-measured
  warm ratio 7.36x, BENCH_SF1_DIAG queries.semantic_dedup).
- graph_triangle_count 17.0x / graph_link_prediction 22.1x — INPUT
  DENSIFICATION, not plan: the embedding label clusters are 10x larger
  at sf1, so true cosine>=0.2 near-dup pairs grow ~quadratically. This
  script measures |E| at both scales and reports wall-per-edge — the
  right scaling denominator for a graph algorithm is edges, not source
  rows.

Merges an ``outlier_investigation`` section into BENCH_SF1_DIAG.json
(the pre-fix sweep numbers stay untouched as the measured baseline).

Usage: python scripts/sf1_outliers.py [--sf1 DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from aos_spark.cache import release_tracked  # noqa: E402
from aos_spark.queries import QUERIES  # noqa: E402
from aos_spark.session import get_spark  # noqa: E402


def _time(spark, fn) -> dict[str, float]:
    out = {}
    for label in ("cold", "warm"):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        out[label] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default=str(_REPO / ".sf1_data"))
    ap.add_argument("--artifact", default=str(_REPO / "BENCH_SF1_DIAG.json"))
    args = ap.parse_args()

    # Validate the artifact FIRST (r13 ADVICE): step 3 reads it for the
    # two graph queries' sweep ratios — a missing file or key crashing
    # AFTER the ~hour of lsh/semantic re-measurement would discard
    # everything measured. Fail in the first second instead.
    art = json.loads(Path(args.artifact).read_text())
    for q in ("graph_triangle_count", "graph_link_prediction"):
        assert "warm_ratio" in art.get("queries", {}).get(q, {}), (
            f"{args.artifact} lacks queries[{q!r}].warm_ratio — run "
            "scripts/bench_sf1.py first"
        )

    spark = get_spark("aos-sf1-outliers", master="local[32]")
    spark.read.parquet(f"{args.sf01}/nation.parquet").count()

    inv: dict[str, dict] = {}

    # 1. lsh_recall_eval after the absolute-cap fix (registry path).
    r01 = _time(spark, lambda: QUERIES["lsh_recall_eval"](spark, args.sf01))
    r1 = _time(spark, lambda: QUERIES["lsh_recall_eval"](spark, args.sf1))
    inv["lsh_recall_eval_fixed"] = {
        "resolution": "fixed in-engine: sample_docs=1000 absolute cap "
                      "(TakeOrdered over md5) replaces the 20%-of-corpus "
                      "fraction sample",
        "sf01": r01, "sf1": r1,
        "warm_ratio": round(r1["warm"] / r01["warm"], 2),
        "pre_fix_warm_ratio": 59.78,
    }
    print("lsh_recall_eval fixed:", inv["lsh_recall_eval_fixed"], flush=True)

    # 2. semantic_dedup under the documented sqrt(N) cluster regime.
    from aos_spark.llm.dedup import semantic_dedup

    def _sem(sf_dir: str):
        # n_clusters=None: the shipping default (ceil(sqrt(N)) resolved
        # in-engine) — measure the EXACT regime the registry runs, not
        # floor(sqrt(N)) one below it (ADVICE r13)
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return semantic_dedup(e, threshold=0.25, n_clusters=None)

    s01 = _time(spark, lambda: _sem(args.sf01))
    s1 = _time(spark, lambda: _sem(args.sf1))
    inv["semantic_dedup_sqrtN"] = {
        "resolution": "parameter regime, not plan: since r13 the engine, "
                      "registry, and oracle all default to "
                      "n_clusters=ceil(sqrt(N)) — measured here at that "
                      "shipping default (45 @ sf0.1, 142 @ sf1)",
        "sf01": s01, "sf1": s1,
        "warm_ratio": round(s1["warm"] / s01["warm"], 2),
        "pre_fix_warm_ratio": 25.79,
    }
    print("semantic_dedup sqrtN:", inv["semantic_dedup_sqrtN"], flush=True)

    # 3. Graph queries: edge growth is the denominator.
    from aos_spark.llm.dedup import embedding_near_dups

    edges = {}
    for key, d in (("sf01", args.sf01), ("sf1", args.sf1)):
        e = spark.read.parquet(f"{d}/embeddings.parquet")
        edges[key] = embedding_near_dups(e, threshold=0.2, n_planes=4).count()
    edge_ratio = round(edges["sf1"] / edges["sf01"], 1)
    for q in ("graph_triangle_count", "graph_link_prediction"):
        sweep = art["queries"][q]
        wall_ratio = sweep["warm_ratio"]
        inv[q] = {
            "resolution": "input densification, not plan: 10x vectors in "
                          "10x-larger label clusters produce ~quadratic "
                          "true near-dup pairs; wall grew far slower than "
                          "the edge list the algorithm actually consumes",
            "edges_sf01": edges["sf01"], "edges_sf1": edges["sf1"],
            "edge_growth": edge_ratio,
            "warm_wall_ratio": wall_ratio,
            "wall_per_edge_ratio": round(wall_ratio / edge_ratio, 3),
        }
        print(q, inv[q], flush=True)

    art["outlier_investigation"] = inv
    Path(args.artifact).write_text(json.dumps(art, indent=2) + "\n")
    print(json.dumps({k: v.get("warm_ratio", v.get("wall_per_edge_ratio"))
                      for k, v in inv.items()}))


if __name__ == "__main__":
    main()
