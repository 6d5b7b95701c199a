"""Scale smoke for the round-5 fourth-wave operators (merge-intervals,
Gini, winsorize, KS, allocation, basket rules) on spark.range-synthetic
frames ~100x the sf0.1 gate volume. Shape check, not correctness (the
oracle gate owns that): linear operators should scale ~linearly and
nothing should collapse onto one task or OOM.

Usage: python scripts/scale_smoke_r5c.py [rows_millions]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aos_spark.session import get_spark


def timed(name, df, results):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    results[name] = round(time.time() - t0, 2)
    print(f"{name}: {results[name]}s", file=sys.stderr)


def main() -> None:
    m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n = int(m * 1_000_000)
    spark = get_spark("scale-smoke-r5c")
    results: dict[str, float] = {}

    # 1. merge_intervals: n intervals over 100k users (~200/user), spans
    # engineered so ~half the intervals chain into islands.
    from aos_spark.ops.intervals import merge_intervals

    iv = spark.range(n).select(
        (F.col("id") % 100_000).alias("user_id"),
        (F.col("id") * 37 % 5_000_000).alias("s"),
    ).withColumn("e", F.col("s") + 40)
    timed("merge_intervals", merge_intervals(iv, ["user_id"], "s", "e"), results)

    # 2. grouped_gini: n decimal values across 25 groups — the window
    # sorts ~n/25 rows per partition, the worst case the docstring owns.
    from aos_spark.ops.stats import grouped_gini

    vals = spark.range(n).select(
        (F.col("id") % 25).alias("g"),
        F.col("id").alias("rid"),
        ((F.col("id") * 7919 % 1_000_000) / 100).cast("decimal(14,2)").alias("v"),
    )
    timed("grouped_gini", grouped_gini(vals, ["g"], "v", ["rid"]), results)

    # 3. grouped_winsorized_mean on the same frame.
    from aos_spark.ops.stats import grouped_winsorized_mean

    timed(
        "winsorized_mean",
        grouped_winsorized_mean(vals, ["g"], "v", ["rid"], tail_pct=5),
        results,
    )

    # 4. ks_two_sample: n rows, values bounded to a 10k-wide histogram —
    # the corpus reduces before any window runs.
    from aos_spark.ops.stats import ks_two_sample

    ks = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        (F.col("id") * 31 % 10_000 + F.when(F.col("id") % 2 == 0, 0).otherwise(500)).alias("v"),
    )
    timed("ks_two_sample", ks_two_sample(ks, "g", "v", "a", "b"), results)

    # 5. proportional_allocation: n docs, 20 strata, 10% budget — two
    # stratum-keyed corpus shuffles, allocation math on a 20-row frame.
    from aos_spark.llm.sampling import proportional_allocation

    docs = spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("lang"),
        F.col("id").alias("doc_id"),
    )
    timed(
        "proportional_allocation",
        proportional_allocation(docs, ["lang"], 10, "doc_id"),
        results,
    )

    # 6. association_rules: n basket lines, n/10 baskets x 100-item
    # vocabulary (~10 items/basket -> ~45 pairs/basket fan-out; pair key
    # space 4950). The self-join is the cost driver — basket-keyed, never
    # corpus-squared.
    from aos_spark.ops.assoc import association_rules

    lines = spark.range(n).select(
        (F.col("id") % (n // 10)).alias("basket"),
        F.concat(F.lit("i"), (F.col("id") * 613 % 100).cast("string")).alias("item"),
    )
    timed(
        "association_rules",
        association_rules(lines, "basket", "item", min_support_pct=1),
        results,
    )

    print(json.dumps({"rows": n, "timings": results}))


if __name__ == "__main__":
    main()
