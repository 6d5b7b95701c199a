"""Round-8 scale smokes: the hardening evidence VERDICT r7 asked for.

1. **Mega-doc ppjoin at DEFAULT heap** — plants one multi-million-token
   document in an otherwise ordinary corpus and runs ppjoin_pairs with
   its default ``max_shingles_per_doc`` cap. Pre-cap this was the one
   scale-killer-class item (an unbounded per-doc array row); post-cap the
   run must complete without raising AOS_DRIVER_MEM.
2. **1M-doc doublings** for ppjoin_pairs (post-cap) and dup_clusters —
   one doubling past the r6 500k frontier, extending the ~linear smoke
   table in PLANS.md.

Shape check, not correctness (the oracle gate owns that).

Usage:
  python scripts/scale_smoke_r8.py megadoc   # default-heap mega-doc run
  python scripts/scale_smoke_r8.py 1m        # the two 1M-doc doublings
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aos_spark.cache import release_tracked
from aos_spark.session import get_spark


def timed(name, thunk, results):
    """Times thunk() -> DataFrame INCLUDING plan construction: ppjoin's
    coalesce right-sizing runs an eager count, so timing only the final
    noop write would hide most of the work."""
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    results[name] = round(time.time() - t0, 2)
    print(f"{name}: {results[name]}s", file=sys.stderr)
    release_tracked()


def corpus(spark, n_docs):
    """The r6 synthetic shape: a corpus-wide boilerplate shingle (hot-key
    worst case) plus a mostly-unique tail; ~5% near-dup neighbors."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("terms of service apply to all content here "),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"w{j}x"),
                        (F.col("id") / F.lit(20 if j < 3 else 1)).cast("long"),
                    )
                    for j in range(24)
                ],
            ),
        ).alias("text"),
    )


def materialize(spark, df, name):
    """Write the synthetic corpus to parquet and read it back, so the
    operator under test sees a STORAGE-shaped input (real corpora are
    parquet scans, not expression trees). Without this the giant
    generator expression is re-evaluated interpreted inside downstream
    stages — a benchmark artifact, not an operator cost."""
    import tempfile

    path = f"{tempfile.gettempdir()}/aos_smoke_r8_{name}"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_megadoc(spark, results):
    from aos_spark.llm.setjoin import ppjoin_pairs

    # 50k ordinary docs + ONE 3M-token doc (~3M distinct 3-gram shingles,
    # 3x the default 1M cap — truncation must fire).
    n_small, mega_tokens = 50_000, 3_000_000
    small = corpus(spark, n_small)
    mega = spark.range(1).select(
        F.lit(10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(mega_tokens - 1)),
                lambda i: F.concat(F.lit("m"), i.cast("string")),
            ),
        ).alias("text"),
    )
    docs = materialize(spark, small.unionByName(mega), "megadoc")
    timed(
        f"ppjoin_megadoc_{mega_tokens}tok_default_heap",
        lambda: ppjoin_pairs(docs, "doc_id", "text", 3, 0.5),  # default cap
        results,
    )


def run_1m(spark, results):
    from aos_spark.llm.dedup import dup_clusters
    from aos_spark.llm.setjoin import ppjoin_pairs

    n_docs = 1_000_000
    docs = materialize(spark, corpus(spark, n_docs), "corpus_1m")
    timed(
        f"ppjoin_{n_docs}docs",
        lambda: ppjoin_pairs(docs, "doc_id", "text", 3, 0.5),
        results,
    )

    # dup_clusters over a 1M-node synthetic pair graph: chains of length
    # ~8 plus random cross links that glue chains into high-diameter
    # components — exactly the shape where O(diameter) propagation is the
    # wrong tool and the O(log n) star algorithm is the scale path.
    pairs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("id_a"),
            F.when((F.col("id") % 8) < 7, F.col("id") + 1)
            .otherwise((F.col("id") * 37 + 11) % n_docs)
            .alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    timed(
        f"dup_clusters_{n_docs}nodes_star",
        lambda: dup_clusters(pairs, algorithm="star"),
        results,
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "megadoc"
    spark = get_spark(f"scale-smoke-r8-{mode}")
    results: dict[str, float] = {}
    if mode == "megadoc":
        run_megadoc(spark, results)
    elif mode == "1m":
        run_1m(spark, results)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
