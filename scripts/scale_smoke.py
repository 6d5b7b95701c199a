"""Scale smoke: run core operators on synthetic frames 100-800x the sf0.1
gate data (spark.range-generated, no testdata writes) and print wall
times. This is the evidence behind PLANS.md's "survives 100x" claims —
not a correctness gate (the oracle covers that at sf0.01) but a
does-the-shape-hold check: linear operators should scale ~linearly, and
nothing should OOM or collapse onto one task.

Usage: python scripts/scale_smoke.py [rows_millions]
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
    spark = get_spark("scale-smoke")
    results: dict[str, float] = {}

    # 1. sessionize: n events, 100k users (~200 events/user)
    ev = spark.range(n).select(
        (F.col("id") % 100_000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 37 % 5_000_000)
        ).alias("ts"),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    from aos_spark.ops.windows import sessionize

    timed("sessionize_20x_users", sessionize(ev, ["user_id"], "ts", 1800, "value"), results)

    # 2. as-of join: n left rows against n/10 right rows, same key space
    from aos_spark.ops.asof import asof_join

    left = ev.select("user_id", "ts").withColumn("event_id", F.monotonically_increasing_id())
    right = spark.range(n // 10).select(
        (F.col("id") % 100_000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 370 % 5_000_000)
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    timed(
        "asof_join",
        asof_join(left, right, on="ts", by=["user_id"], value_cols=["value"]),
        results,
    )

    # 3. salted distinct under heavy skew: 90% of rows share ONE key
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.col("id").cast("string"))
        .alias("k"),
        (F.col("id") % 1_000_003).alias("v"),
    )
    from aos_spark.ops.skew import salted_distinct_count

    timed("salted_distinct_skew90", salted_distinct_count(skewed, "k", "v"), results)

    # 4. exact dedup at n docs (hash groupBy)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text body "), (F.col("id") % (n // 4)).cast("string")).alias(
            "text"
        ),
    )
    from aos_spark.llm.dedup import exact_dedup

    timed("exact_dedup_4x_dups", exact_dedup(docs), results)

    # 5. incremental agg state build + merge at n rows
    from aos_spark.ops import incremental as I

    half1 = ev.filter(F.col("user_id") % 2 == 0)
    half2 = ev.filter(F.col("user_id") % 2 == 1)
    merged = I.finalize(
        I.merge_states(
            I.agg_state(half1, ["user_id"], "value"),
            I.agg_state(half2, ["user_id"], "value"),
            ["user_id"],
        ),
        ["user_id"],
    )
    timed("incremental_state_merge", merged, results)

    # 6. funnel window-chain: n events, 100k users
    from pyspark.sql import Window

    fe = ev.withColumn(
        "event_type",
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("other")),
            ((F.col("user_id") + F.col("value").cast("long")) % 4 + 1).cast("int"),
        ),
    ).withColumn("event_id", F.monotonically_increasing_id())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s1 = F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w)
    fe2 = fe.withColumn("__s1", s1)
    s2 = F.max(
        F.when((F.col("event_type") == "click") & (F.col("__s1") == 1), 1).otherwise(0)
    ).over(w)
    funnel = (
        fe2.withColumn("__s2", s2)
        .groupBy("user_id")
        .agg(F.max("__s1").alias("u1"), F.max("__s2").alias("u2"))
        .agg(F.sum("u1").alias("a"), F.sum("u2").alias("b"))
    )
    timed("funnel_window_chain", funnel, results)

    # 7. MinHash LSH dedup at n/20 synthetic docs (~1M at the 20M setting):
    # 25-word hash-derived docs; every 10th doc is a near-dup of a base doc
    # (one word changed), so the banded join has real candidates to verify.
    n_docs = n // 20
    base_id = F.when(F.col("id") % 10 == 0, F.col("id") - (F.col("id") % 100)).otherwise(
        F.col("id")
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda i: F.substring(F.md5(F.concat(base_id.cast("string"), i.cast("string"))), 1, 6),
    )
    tail = F.when(F.col("id") % 10 == 0, F.substring(F.md5(F.col("id").cast("string")), 1, 6)).otherwise(
        F.lit("common")
    )
    docs_lsh = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat(words, F.array(tail))).alias("text"),
    )
    from aos_spark.llm.dedup import minhash_lsh_pairs

    timed("minhash_lsh_1m_docs", minhash_lsh_pairs(docs_lsh), results)

    # 8. bucketized range join: n points against n/10 intervals
    from aos_spark.ops.intervals import bucketized_range_join

    pts = spark.range(n).select((F.col("id") % 10_000_000).cast("double").alias("v"))
    ivs = spark.range(n // 10).select(
        (F.col("id") % 10_000_000).cast("double").alias("lo"),
        ((F.col("id") % 10_000_000) + 50.0).alias("hi"),
        F.col("id").alias("interval_id"),
    )
    timed(
        "range_join_2m_intervals",
        bucketized_range_join(pts, ivs, "v", "lo", "hi", bucket_width=64.0)
        .groupBy()
        .count(),
        results,
    )

    # 9. cohort retention shape: first-touch agg + user-keyed join at n rows
    evd = ev.select("user_id", F.to_date("ts").alias("d"))
    first = evd.groupBy("user_id").agg(F.min("d").alias("c"))
    cohort = (
        evd.distinct()
        .join(first, "user_id")
        .groupBy("c", F.datediff("d", "c").alias("ds"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    timed("cohort_retention", cohort, results)

    # 10. span-level dedup on the same ~1M synthetic doc corpus: 26-word
    # docs -> 2 spans each; the every-10th near-dups share their first
    # 20-token span, so the keeper window sees real collisions.
    from aos_spark.llm.dedup import span_dedup_retention

    timed("span_dedup_1m_docs", span_dedup_retention(docs_lsh, span=20), results)

    # 11. bloom semi-join: n-row fact against an n/100-key build side —
    # the bitset must stay O(m) regardless of n. m=2^22 dispatches to the
    # broadcast-join probe tier, a fully LAZY plan (no eager bitset
    # collect — that is the ≤2^17 literal tier), so the standard timed()
    # wrapper measures build + probe + verify end-to-end.
    from aos_spark.ops.bloom import bloom_semijoin

    fact = spark.range(n).select((F.col("id") * 7 % (n * 2)).alias("fk"))
    build = spark.range(n // 100).select((F.col("id") * 14).alias("bk"))
    timed(
        "bloom_semijoin_fact_n",
        bloom_semijoin(fact, "fk", build, "bk", m_bits=1 << 22).groupBy().count(),
        results,
    )

    # 12. bigram rarity at ~1M docs: the occurrence explode (~25M rows)
    # and the zipfian-hot count join are the stress points.
    from aos_spark.llm.text import bigram_rarity

    timed("bigram_rarity_1m_docs", bigram_rarity(docs_lsh), results)

    # 13. Markov transition matrix at n events: the lag window is the only
    # data-sized stage; the count/normalize frames are |states|²-bounded.
    from aos_spark.ops.sequences import session_paths, transition_matrix

    seq_ev = ev.select(
        "user_id",
        "ts",
        (F.col("user_id") % 8).cast("string").alias("state"),
    ).withColumn("event_id", F.monotonically_increasing_id())
    timed(
        "transition_matrix_n_events",
        transition_matrix(seq_ev, "user_id", "state", ["ts", "event_id"]),
        results,
    )

    # 14. session paths at n events: same key shuffle; the path-count
    # frame is |states|^max_len-bounded, top-k via TakeOrdered.
    timed(
        "session_paths_n_events",
        session_paths(seq_ev, "user_id", "ts", "state", "event_id"),
        results,
    )

    # 15. burst detection at n events: hourly rollup shrinks the window
    # input by ~events-per-hour before the RANGE frame runs.
    from aos_spark.ops.sequences import burst_hours

    timed("burst_hours_n_events", burst_hours(ev, "user_id", "ts"), results)

    # 16. postings index at ~1M docs: the cap window must keep hot-term
    # state bounded while df/tf stay exact.
    from aos_spark.llm.text import postings_index

    timed("postings_index_1m_docs", postings_index(docs_lsh), results)

    # 17. key skew profile on a 90%-hot key column at n rows: one count
    # shuffle + a scalar agg per profiled column.
    from aos_spark.ops.skew import key_distribution_profile

    hotk = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k")
    )
    timed("key_skew_profile_hot", key_distribution_profile(hotk, ["k"]), results)

    print(json.dumps({"rows": n, "timings": results}))


if __name__ == "__main__":
    main()
