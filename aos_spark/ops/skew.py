"""Skew mitigation helpers.

AQE skew-join splitting is on by default (session.py) and is the first
line of defense. These helpers cover the two cases AQE cannot fix:

1. a skewed high-cardinality aggregation whose partial aggregate does not
   reduce (e.g. exact distinct counting per hot key) — ``salted_distinct_count``
   pre-splits the hot key across R salt partitions and merges;
2. a shuffle join where one side's hot keys overwhelm single tasks and the
   other side is small enough to replicate — ``salted_join`` explodes the
   small side R ways so each hot-key partition joins locally.

Both are semantics-preserving rewrites: results are verified equal to the
unsalted plans in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT x) per key without funneling each hot key through a
    single task: phase 1 dedups (key, salt, x) where salt = hash(x) % R —
    the hot key's distinct set is partitioned R ways — phase 2 sums the
    per-salt distinct counts (disjoint by construction, so the sum is
    exact, not approximate). NULLs are excluded first, matching
    COUNT(DISTINCT x) (r9 review: the distinct-rows formulation counted
    NULL as a value, silently disagreeing with the unsalted plan)."""
    df = df.filter(F.col(distinct_col).isNotNull())
    salted = df.withColumn("__salt", F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts)))
    per_salt = (
        salted.select(*keys, "__salt", distinct_col)
        .distinct()
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return per_salt.groupBy(*keys).agg(F.sum("__c").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big rows get a random-ish salt
    derived from a UNIQUE column-free expression (monotonically increasing
    id is nondeterministic across retries, so we hash the whole row), and
    ``small`` is exploded once per salt value. Each (key, salt) bucket is
    then uniform. Use when the small side is too big to broadcast outright
    but cheap to replicate R times.

    ``how`` ∈ {inner, left}: these preserve the unsalted join's semantics
    (unmatched BIG rows keep their single salt). right/full would emit an
    unmatched small row once PER SALT — n_salts duplicates — so they are
    rejected rather than silently wrong (r9 review)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): an "
            "outer small side replicates unmatched rows once per salt"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_s = small.withColumn("__salt", F.explode(salts))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def key_distribution_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-key-column skew diagnostics — the measurement feeding the
    salting decisions above (and CMS-fed salting in ops/sketches).

    Deliberately RATIONAL arithmetic only (the tf-idf precedent: ln()
    differs in the last ulp across libms, which the repo's bit-exact
    oracle contract cannot tolerate). The concentration measure is
    Simpson's Σc²: it is EXACTLY the self-join row count of the key —
    the quantity a shuffle-join's cost is proportional to — and
    ``eff_keys = n_rows² / Σc²`` (inverse Simpson) is the effective
    number of distinct keys (1 = one key dominates, n_keys = uniform).

    Per column: one map-side-combined count shuffle, then a scalar
    aggregate over the counts frame; the per-column one-row results
    union. Counts accumulate as DECIMAL(38,0) (exact at any volume);
    the two derived ratios are single IEEE divisions of operands that
    convert to double exactly while Σc² and n_rows stay under 2^53 —
    beyond that the ratios carry the documented ≤1-ulp conversion
    rounding (the moment_aggs note), with counts themselves still exact.

    Output per key column: key_col, n_keys, n_rows, max_count,
    top_share, selfjoin_rows, eff_keys, skew_factor
    (= max_count·n_keys/n_rows, the hot-key over-representation vs
    uniform).
    """
    from functools import reduce

    outs = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        stats = counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("__c").alias("n_rows"),
            F.max("__c").alias("max_count"),
            F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias(
                "__s2"
            ),
        )
        outs.append(
            stats.select(
                F.lit(c).alias("key_col"),
                "n_keys",
                "n_rows",
                "max_count",
                F.round(F.col("max_count") / F.col("n_rows"), 6).alias(
                    "top_share"
                ),
                # exact while Σc² ≤ 2^63−1 (≈9.2e18 self-join rows — far
                # past the point the diagnostic's answer is "never run
                # this join"); beyond that the ANSI-off cast nulls, which
                # itself reads as "off the scale"
                F.col("__s2").cast("long").alias("selfjoin_rows"),
                F.round(
                    (
                        F.col("n_rows").cast("double")
                        * F.col("n_rows").cast("double")
                    )
                    / F.col("__s2").cast("double"),
                    6,
                ).alias("eff_keys"),
                # product computed in DOUBLE: a long·long product wraps
                # past 2^63 (review catch); each factor converts exactly
                # below 2^53 and the ratio is what matters
                F.round(
                    (
                        F.col("max_count").cast("double")
                        * F.col("n_keys").cast("double")
                    )
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("skew_factor"),
            )
        )
    return reduce(DataFrame.unionByName, outs)
