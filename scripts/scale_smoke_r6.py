"""Scale smoke for the round-6 operators: capped containment near-dup,
PPJoin exact similarity join, and the count-adaptive edge-list sizing in
the graph tier — synthetic corpora well past the sf0.1 gate volume.

Shape check, not correctness (the oracle gate owns that): the capped
candidate machinery must stay ~linear when a boilerplate shingle is
shared corpus-wide (the uncapped r5 containment was quadratic there),
and the graph operators must not regress on a graph large enough that
the coalesce is a no-op.

Usage: python scripts/scale_smoke_r6.py [docs_thousands]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aos_spark.cache import release_tracked
from aos_spark.session import get_spark


def timed(name, df, results):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    results[name] = round(time.time() - t0, 2)
    print(f"{name}: {results[name]}s", file=sys.stderr)
    release_tracked()


def main() -> None:
    k = float(sys.argv[1]) if len(sys.argv) > 1 else 200.0
    n_docs = int(k * 1000)
    spark = get_spark("scale-smoke-r6")
    results: dict[str, float] = {}

    # Synthetic corpus: every doc shares a boilerplate prefix (the
    # hot-shingle worst case — one 3-gram in ALL docs) plus a mostly-
    # unique tail; ~5% of docs are near-dups of a neighbor.
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to all content here "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}x"), (F.col("id") / F.lit(20 if j < 3 else 1)).cast("long"))
                    for j in range(24)
                ],
            ),
        ).alias("text"),
    )

    from aos_spark.llm.dedup import shingle_intersection_counts

    inter = shingle_intersection_counts(docs, "doc_id", "text", 3)
    cont = inter.withColumn(
        "containment",
        F.col("n_common").cast("double") / F.least("n_a", "n_b"),
    ).filter(F.col("containment") >= 0.5)
    timed(f"containment_capped_{n_docs}docs_hot_shingle", cont, results)

    from aos_spark.llm.setjoin import ppjoin_pairs

    pp = ppjoin_pairs(docs, "doc_id", "text", 3, 0.5)
    timed(f"ppjoin_{n_docs}docs", pp, results)

    # Graph tier at a size where coalesce must be a no-op: ~n_docs*8
    # edges over n_docs nodes (well past 100k rows/partition per task).
    n_edges = n_docs * 8
    edges = spark.range(n_edges).select(
        (F.col("id") % n_docs).alias("id_a"),
        ((F.col("id") * 31 + 7) % n_docs).alias("id_b"),
    )
    from aos_spark.ops.graph import common_neighbor_scores, triangle_count

    timed(f"triangle_{n_edges}edges", triangle_count(edges), results)
    timed(
        f"linkpred_capped_{n_edges}edges",
        common_neighbor_scores(edges, topk=50, max_degree=64),
        results,
    )

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
