"""Exact distributed second-moment statistics (variance/covariance/
correlation) from DECIMAL moment sums.

Engine-native ``corr``/``covar_samp``/``stddev_samp`` accumulate doubles in
a streaming update (Welford-style in Spark, a different order in DuckDB/
pandas), so the last bits depend on partitioning and engine — they can
never be cross-engine or cross-run exact. This module instead aggregates
the five raw moments (n, Σx, Σy, Σxy, Σx², Σy²) as DECIMAL(38, s) — exact
integers-in-disguise, order-independent — and derives the statistics with
a fixed sequence of double operations, so the result is bit-identical on
ANY partitioning and in any engine that follows the same formula.

Numerical caveat, stated honestly: the textbook moment form loses
precision when |mean| ≫ stddev. The decimal accumulation removes the
summation error entirely (sums are exact); only the final catastrophic
cancellation remains, which is acceptable for the value ranges here and
is the price of cross-engine reproducibility. For ill-conditioned data,
pre-center x and y by an approximate mean first (same operator shape).

INPUT CONTRACT (round-9 lesson, the order_autocorrelation divergence):
the value columns must be EXACTLY representable at the decimal scale —
raw columns with ≤scale decimal places, values pre-rounded with
ROUND(x, scale) in double space, or exact decimals. NEVER feed a
computed double (a quotient, product, or mean): the double→decimal cast
itself is knife-edge unsafe across engines — Spark correctly rounds the
shortest decimal repr half-up via BigDecimal, DuckDB scales by
10^scale in double space first (a double rounding) — and measured
divergence rates on identical doubles are ~0.4% for quotient-shaped
values at scale 6 and ~4% for anything at scale 15. Because this module
emits the rounded moment sums as OUTPUT columns, even one flipped unit
is a visible result difference, not an absorbed intermediate. Build
exact series instead (integral division → decimal multiply — see
queries_r5b.q_order_autocorrelation) and keep
tests/test_stats_cross_engine.py green.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def complete_pairs(df: DataFrame, x: str, y: str, scale: int = 6) -> DataFrame:
    """Pairwise-deletion pre-filter for the moment machinery: keep only
    rows where BOTH value columns are non-NULL (a pair contributes to all
    six aggregates or to none — engine-native corr/covar_samp semantics).

    Two layers (ADVICE r9 + r10): the RAW isNotNull conjuncts mirror the
    oracles' ``WHERE x IS NOT NULL AND y IS NOT NULL`` and push down to
    the scan; the POST-CAST conjuncts close the non-ANSI overflow hole —
    under non-ANSI Spark a decimal(18,scale) overflow casts to NULL, so
    without them the sums would skip the row while n (and the partner
    column's sums) kept it, the exact r9 wrong-n-vs-sums corruption
    class. Filtering ONCE here keeps all six aggregates consistent by
    construction with zero per-aggregate branches (the r10 perf fix that
    retired the twelve when-gated sums stands). Under the gate's ANSI
    sessions the cast raises here exactly as it previously raised inside
    the aggregate, and with in-contract magnitudes (|value| <
    10^(18-scale)) the cast conjuncts are vacuously true — no result
    change in either certified configuration."""
    dec = f"decimal(18,{scale})"
    return df.filter(
        F.col(x).isNotNull()
        & F.col(y).isNotNull()
        & F.col(x).cast(dec).isNotNull()
        & F.col(y).cast(dec).isNotNull()
    )


def moment_aggs(x: str, y: str, scale: int = 6) -> list[Column]:
    """The five exact moment sums + count for (x, y), decimal-accumulated.

    INPUT: a pairwise-complete frame — callers pre-filter NULLs with
    :func:`complete_pairs` (the r9 per-aggregate CASE gating is retired;
    see its docstring). ``n`` is therefore the complete-pair count.

    Each sum is ROUNDED (linear sums to 2 decimals, product sums to whole
    units) before the double cast: a decimal whose integer-unit magnitude
    stays under 2^53 converts to double EXACTLY in every engine, whereas
    casting a 26-significant-digit DECIMAL(38,12) to double rounds
    differently ulp-wise across engines (observed Spark vs DuckDB). The
    rounding perturbs the moments by ≤0.5 unit — relative 1e-14 here —
    and identically in both engines, preserving bit-exactness."""
    xd = F.col(x).cast(f"decimal(18,{scale})")
    yd = F.col(y).cast(f"decimal(18,{scale})")

    def lin(c: Column) -> Column:
        return F.round(F.sum(c), 2).cast("double")

    def prod(c: Column) -> Column:
        return F.round(F.sum(c.cast(f"decimal(38,{2 * scale})")), 0).cast("double")

    return [
        F.count(F.lit(1)).alias("n"),
        lin(xd).alias("sum_x"),
        lin(yd).alias("sum_y"),
        prod(xd * yd).alias("sum_xy"),
        prod(xd * xd).alias("sum_xx"),
        prod(yd * yd).alias("sum_yy"),
    ]


def derive_stats(df: DataFrame, round_to: int = 6) -> DataFrame:
    """Attach covar_samp / corr / stddev columns derived from the moment
    sums with a FIXED operation order (documented in the SQL oracle)."""
    n = F.col("n").cast("double")
    cov = (F.col("sum_xy") - F.col("sum_x") * F.col("sum_y") / n) / (n - 1)
    var_x = (F.col("sum_xx") - F.col("sum_x") * F.col("sum_x") / n) / (n - 1)
    var_y = (F.col("sum_yy") - F.col("sum_y") * F.col("sum_y") / n) / (n - 1)
    # NULL, never NaN/Infinity (r9 review): engine-native corr/covar_samp
    # return NULL for n<2 and for zero-variance groups; the unguarded
    # moment form emitted 0/0=NaN and cov/0=Inf there, values the
    # null-contract rollups downstream were never designed for. (A
    # constant group's variance can also land a hair NEGATIVE from the
    # unit-rounding of the moment sums — the same guard routes that to
    # NULL instead of sqrt(NaN).) The guarded expressions keep the fixed
    # op order on every group the guards don't fire for.
    valid = F.col("n") >= 2
    cov_g = F.when(valid, cov)
    sd_x = F.when(valid & (var_x >= 0), F.sqrt(var_x))
    sd_y = F.when(valid & (var_y >= 0), F.sqrt(var_y))
    corr = F.when(
        valid & (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
    )
    return df.select(
        *df.columns,
        F.round(cov_g, round_to).alias("covar_xy"),
        F.round(sd_x, round_to).alias("stddev_x"),
        F.round(sd_y, round_to).alias("stddev_y"),
        F.round(corr, round_to).alias("corr_xy"),
    )


def grouped_correlation(
    df: DataFrame, group_cols: list[str], x: str, y: str, scale: int = 6
) -> DataFrame:
    """Per-group exact-moment correlation: one map-side-combined shuffle on
    the group keys; every downstream value is a deterministic function of
    the exact moments. NULL pairs are pairwise-deleted up front
    (:func:`complete_pairs`)."""
    moments = (
        complete_pairs(df, x, y, scale)
        .groupBy(*group_cols)
        .agg(*moment_aggs(x, y, scale))
    )
    return derive_stats(moments)


def lagged_autocorrelation(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    lag: int = 1,
    scale: int = 6,
) -> DataFrame:
    """Per-group lag-``k`` autocorrelation of an ordered series, built
    from the same exact decimal moments as :func:`grouped_correlation`.

    Pairs (xₜ, xₜ₋ₖ) come from ONE group-partitioned ``lag`` window (the
    series must already be one row per ``order_col`` value per group);
    the moment aggregate then reuses the deterministic machinery above,
    so the autocorrelation is bit-identical on any partitioning and in
    any engine following the same formula. Physical shape: one key-hash
    shuffle shared by the window and the moment agg (same partitioning —
    Catalyst elides the second exchange).

    Note the same magnitude caveat as ``moment_aggs``: values are
    accumulated as DECIMAL(18, scale), so per-row magnitudes must stay
    under 10^(18-scale); pre-scale wider series before calling.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(order_col)
    lagged = df.withColumn("__prev", F.lag(value_col, lag).over(w)).filter(
        F.col("__prev").isNotNull()
    )
    return grouped_correlation(lagged, group_cols, value_col, "__prev", scale)


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier screening via median absolute deviation:
    flag rows where |x − median| > k · MAD, with both the median and the
    MAD computed EXACTLY by the repo's rank-and-interpolate pattern
    (see q_percentile_cont) — never an engine-native approximate
    quantile, whose tie conventions differ across engines.

    Two group-partitioned ranking windows (values, then deviations),
    two broadcast-sized per-group stat frames joined back, one final
    rollup — every shuffle is keyed by the group columns, nothing is
    globally sorted. Every derived number is a fixed sequence of IEEE754
    ops on identical operands in any engine, so the outlier rule
    (including boundary cases) is deterministic. The deviation frame
    feeds three consumers (the MAD ranking, the flag join, the rollup),
    so it is persisted via the repo's tracked cache — without it the
    fact scans 4×; with it, once (callers release via
    ``cache.release_tracked()``, same contract as the dedup pipelines).

    Scale caveat (same one percentile_cont_interp documents): the
    ranking windows partition on the GROUP columns, so per-group data
    volume lands on one task's sort. Fine for dimension-cardinality
    groups; for a handful of groups over a 100 TB fact, use the
    fixed-bin mergeable sketch (ops/sketches.quantile_histogram) or
    range-partition pre-bucketing instead of exact ranks.

    Output per group: n_rows, median, mad, n_outliers, outlier_frac.
    """
    from pyspark.sql import Window

    from aos_spark.cache import persist_tracked

    def _p50(frame: DataFrame, col: str) -> DataFrame:
        """Exact interpolated median of ``col`` per group → one row per
        group with column __med."""
        w = Window.partitionBy(*group_cols).orderBy(col, *tiebreak_cols)
        cw = Window.partitionBy(*group_cols)
        ranked = frame.select(
            *group_cols,
            F.col(col).alias("__v"),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(cw).alias("__n"),
        )
        idx = F.lit(0.5) * (F.col("__n") - 1).cast("double")
        lo = F.floor(idx).cast("bigint") + 1
        hi = F.least(lo + 1, F.col("__n"))
        v_lo = F.min(F.when(F.col("__rn") == lo, F.col("__v")))
        v_hi = F.min(F.when(F.col("__rn") == hi, F.col("__v")))
        frac = F.min(F.when(F.col("__rn") == lo, idx - F.floor(idx)))
        return ranked.groupBy(*group_cols).agg(
            (v_lo + frac * (v_hi - v_lo)).alias("__med")
        )

    med = _p50(df, value_col)
    with_dev = persist_tracked(
        df.join(med, on=group_cols).withColumn(
            "__dev", F.abs(F.col(value_col) - F.col("__med"))
        )
    )
    mad = _p50(with_dev, "__dev").withColumnRenamed("__med", "__mad")
    flagged = with_dev.join(mad, on=group_cols).withColumn(
        "__is_out", F.col("__dev") > F.lit(k) * F.col("__mad")
    )
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("__med"), 6).alias("median"),
        F.round(F.min("__mad"), 6).alias("mad"),
        F.sum(F.col("__is_out").cast("long")).alias("n_outliers"),
        F.round(
            F.sum(F.col("__is_out").cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("outlier_frac"),
    )


def grouped_linregress(
    df: DataFrame, group_cols: list[str], x: str, y: str, scale: int = 6
) -> DataFrame:
    """Per-group ordinary-least-squares line (slope/intercept/r) from the
    SAME exact decimal moments as grouped_correlation — slope =
    cov/var_x and intercept = (Σy − slope·Σx)/n are fixed IEEE sequences
    over the order-independent moment sums, so the fit is bit-identical
    on any partitioning and engine. One map-combined shuffle, same
    magnitude caveats as moment_aggs; NULL pairs pairwise-deleted up
    front (:func:`complete_pairs`)."""
    m = complete_pairs(df, x, y, scale).groupBy(*group_cols).agg(*moment_aggs(x, y, scale))
    n = F.col("n").cast("double")
    cov = (F.col("sum_xy") - F.col("sum_x") * F.col("sum_y") / n) / (n - 1)
    var_x = (F.col("sum_xx") - F.col("sum_x") * F.col("sum_x") / n) / (n - 1)
    var_y = (F.col("sum_yy") - F.col("sum_y") * F.col("sum_y") / n) / (n - 1)
    slope = cov / var_x
    # NULL for degenerate groups (n<2, constant x) — same rationale as
    # derive_stats (r9 review): the unguarded form emitted NaN/Infinity
    valid = (F.col("n") >= 2) & (var_x > 0)
    return m.select(
        *group_cols,
        "n",
        F.round(F.when(valid, slope), 6).alias("slope"),
        F.round(
            F.when(valid, (F.col("sum_y") - slope * F.col("sum_x")) / n), 6
        ).alias("intercept"),
        F.round(
            F.when(valid & (var_y > 0), cov / F.sqrt(var_x * var_y)), 6
        ).alias("r"),
    )


def grouped_gini(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group Gini concentration index over an exact DECIMAL value
    column, via the rank formula G = (2·Σ i·x_i − (n+1)·Σx_i) / (n·Σx_i)
    with i the 1-based rank in ascending (value, tiebreak) order.

    Determinism: x_i is decimal, i is BIGINT, so both Σ moments are exact
    decimals (rank·value promotes to decimal(38,s) — overflow headroom to
    ~10^36, far past any realistic group); the ONLY float op is the final
    single division, a fixed IEEE op on identical operands in any engine
    or partitioning. Ties in the value column are broken by
    ``order_cols`` so the rank sequence itself is reproducible (Gini is
    tie-insensitive mathematically, but the intermediate Σ i·x_i is not).

    Cost: one shuffle keyed by the group (the rank window), then a
    map-combined rollup on the same partitioning — Spark reuses the
    exchange. Skew bound = hottest group's row count, the usual
    partitioned-window envelope."""
    from pyspark.sql import Window

    tiebreak = order_cols or []
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col), *tiebreak)
    ranked = df.withColumn("__i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col)).alias("__s"),
        F.sum(F.col("__i") * F.col(value_col)).alias("__s1"),
    )
    num = F.lit(2) * F.col("__s1") - (F.col("n") + F.lit(1)) * F.col("__s")
    den = F.col("n") * F.col("__s")
    return agg.select(
        *group_cols,
        "n",
        F.col("__s").cast("double").alias("total_value"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    )


def grouped_winsorized_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    order_cols: list[str],
    tail_pct: int = 5,
) -> DataFrame:
    """Per-group winsorized mean: clamp (don't drop — that's trimmed_mean)
    each group's values at its exact-rank lower/upper tail_pct bounds,
    then average. The bound is the value at rank ⌈n·pct/100⌉ from each
    end — pure integer rank selection on an exact DECIMAL column, no
    interpolation, so the clamped sum is exact and the single final
    division is the only float op.

    Plan: one group-keyed rank window; the SAME ranked frame feeds both
    the |groups|-sized bounds aggregate (broadcast back) and the clamped
    rollup — Spark reuses the window exchange for the rollup. Skew
    envelope = hottest group, the partitioned-window standard."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col), *order_cols)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    lo_rank = F.ceil(F.col("__n") * F.lit(int(tail_pct)) / F.lit(100)).cast("long")
    ranked = ranked.withColumn("__lo_rk", F.greatest(lo_rank, F.lit(1))).withColumn(
        "__hi_rk", F.col("__n") - F.col("__lo_rk") + 1
    )
    bounds = (
        ranked.filter(
            (F.col("__rn") == F.col("__lo_rk")) | (F.col("__rn") == F.col("__hi_rk"))
        )
        .groupBy(*group_cols)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__lo_rk"), F.col(value_col))).alias(
                "__p_lo"
            ),
            F.max(F.when(F.col("__rn") == F.col("__hi_rk"), F.col(value_col))).alias(
                "__p_hi"
            ),
        )
    )
    clamped = ranked.join(F.broadcast(bounds), group_cols).withColumn(
        "__w",
        F.when(F.col(value_col) < F.col("__p_lo"), F.col("__p_lo"))
        .when(F.col(value_col) > F.col("__p_hi"), F.col("__p_hi"))
        .otherwise(F.col(value_col)),
    )
    return clamped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__p_lo").cast("double").alias("lo_bound"),
        F.min("__p_hi").cast("double").alias("hi_bound"),
        F.round(
            F.sum("__w").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("winsorized_mean"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two named
    groups of an INTEGER-valued column: D = max over observed values of
    |F_a(v) − F_b(v)|, with the argmax value (smallest on ties) reported.

    The corpus collapses to a value HISTOGRAM first (one map-combined
    shuffle, |distinct values| rows — bounded for lengths/counts/grades,
    the intended domain), so the two cumulative windows and the argmax
    rank run over the histogram, not the data. Those windows are
    deliberately unpartitioned: they order a bounded dim-sized frame,
    the language_confusion_matrix precedent, not a corpus-sized
    WindowExec. Each CDF value is ONE division of exact BIGINTs; |Δ| and
    the (desc, value asc) ordering compare identically in any engine."""
    from pyspark.sql import Window

    h = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(value_col)
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, F.lit(1)).otherwise(F.lit(0))
            ).alias("__ca"),
            F.sum(
                F.when(F.col(group_col) == group_b, F.lit(1)).otherwise(F.lit(0))
            ).alias("__cb"),
        )
    )
    w_cum = Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    tot = h.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    cum = (
        h.withColumn("__cum_a", F.sum("__ca").over(w_cum))
        .withColumn("__cum_b", F.sum("__cb").over(w_cum))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__d",
            F.abs(
                F.col("__cum_a").cast("double") / F.col("__na").cast("double")
                - F.col("__cum_b").cast("double") / F.col("__nb").cast("double")
            ),
        )
    )
    w_top = Window.orderBy(F.col("__d").desc(), F.col(value_col))
    return (
        cum.withColumn("__rk", F.row_number().over(w_top))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__na").alias("n_a"),
            F.col("__nb").alias("n_b"),
            F.col(value_col).alias("ks_at"),
            F.round("__d", 6).alias("ks_stat"),
        )
    )
