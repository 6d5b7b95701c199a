"""Count-min sketch — sublinear frequency estimation for hot-key /
heavy-hitter detection.

At 100 TB you cannot afford an exact `groupBy(key).count()` just to decide
which keys need salting (ops/skew); a count-min sketch compresses the
frequency table to d×w counters in ONE map-side-combined shuffle of d·w
groups, independent of key cardinality. Estimates never undercount
(collisions only add), overcount is bounded by 2N/w with probability
1-(1/2)^d — so "estimate > threshold" is a safe hot-key test.

Hashes are md5-derived (the cross-engine-reproducible trick used across
the oracle suite), so the sketch itself is deterministic and the gate
query can verify the exact same construction in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def _bucket(key: Column, row: Column | int, width: int) -> Column:
    r = F.lit(row) if isinstance(row, int) else row
    h = F.conv(
        F.substring(
            F.md5(F.concat(r.cast("string"), F.lit(":"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    )
    return h.cast("bigint") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: one row per (hash row, bucket) with its counter.
    d×w rows total — broadcastable whatever the input size."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row")
    exploded = df.select(F.col(key_col).alias("__key"), rows)
    return (
        exploded.select(
            "__row", _bucket(F.col("__key"), F.col("__row"), width).alias("__bucket")
        )
        .groupBy("__row", "__bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimated frequency per key: min over the d counters the key hashes
    to. The sketch side is d×w rows — broadcast; keys never shuffle beyond
    their own aggregation."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__row"),
    ).withColumn("__bucket", _bucket(F.col(key_col), F.col("__row"), width))
    return (
        probes.join(F.broadcast(sketch), ["__row", "__bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("counter", F.lit(0))).alias("est_count"))
    )


HLL_P = 6  # 2^6 = 64 registers; relative error ≈ 1.04/√64 ≈ 13%
HLL_HASH_BITS = 32


def rho_case_sql(expr: str, q: int) -> str:
    """ANSI-SQL CASE computing ρ(w) = leading zeros of the q-bit word
    ``expr`` plus one (q+1 when w = 0) — pure integer comparisons, shared
    verbatim by the Spark plan (F.expr) and the DuckDB oracle so the
    register values are bit-identical with no log2/floor transcendental
    edge cases."""
    branches = " ".join(
        f"WHEN {expr} >= {1 << (q - r)} THEN {r}" for r in range(1, q + 1)
    )
    return f"CASE {branches} ELSE {q + 1} END"


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """HyperLogLog register frame: (register index, max ρ) — 2^p rows max,
    built in ONE map-side-combined shuffle of ≤2^p groups regardless of
    input size (same scale story as the CMS above). The hash is the
    md5-first-8-hex trick, so the sketch is deterministic and externally
    reproducible; index = top p bits, ρ over the remaining 32−p bits.
    Duplicate keys cannot change any register (max is idempotent), so the
    frame needs no pre-distinct. (Delegates to the grouped variant with
    no groups — r9 review removed the verbatim duplicate body, whose two
    copies had to stay bit-identical for the cross-engine gate.)"""
    return hll_registers_grouped(df, key_col, [], p)


def hll_estimate(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """One-row distinct-count estimate from the register frame (Flajolet
    et al. 2007): raw = α_m·m²/Σ2^(−M_i) with empty registers contributing
    2⁰, the small-range linear-counting correction m·ln(m/V) when
    raw ≤ 2.5m and V (empty registers) > 0, and the 32-bit large-range
    correction −2³²·ln(1 − raw/2³²) when raw > 2³²/30. Everything except
    the ln branches is exact IEEE754 arithmetic (the 2^−M terms come from
    integer shifts, not pow), so in the uncorrected band the estimate is
    bit-identical across engines; the ln branches are within-engine
    deterministic only. (Delegates to hll_estimate_from_registers — r9
    review removed the duplicate estimation body.)"""
    return hll_estimate_from_registers(hll_registers(df, key_col, p), [], p)


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group HLL register frame — (group..., register, max_rho). The
    MERGE story is the point at scale: register frames combine by a
    further groupBy-max (union two frames, max per (group, register)), so
    per-partition / per-day sketches roll up into any coarser grouping
    without touching raw data again."""
    q = HLL_HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return (
        df.select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            F.shiftright("__h", q).alias("register"),
            F.col("__h").bitwiseAND(F.lit((1 << q) - 1)).alias("__w"),
        )
        .select(*group_cols, "register", F.expr(rho_case_sql("__w", q)).alias("__rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two register frames (set union of the underlying keys):
    union + max per (group, register). Lossless w.r.t. the sketch."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group estimate straight from a register frame — the entry
    point for MERGED sketches (e.g. daily registers rolled up to weekly
    with a groupBy-max, then estimated here without re-reading raw data).
    Same Flajolet arithmetic as hll_estimate (which delegates here);
    shift-based 2^−M terms, the ln linear-counting branch only fires when
    v_zero > 0. The estimation pipeline lives ONLY here — the gate's
    bit-exactness contract needs a single copy."""
    m = 1 << p
    agg = regs.groupBy(*group_cols).agg(
        # shiftleft with a column bit-count needs the SQL form (the Python
        # wrapper only takes an int); 1<<M then exact double division gives
        # the 2^-M terms without pow(). SUM over zero register rows is
        # NULL — coalesce so an EMPTY input yields estimate 0.0 (V = m;
        # linear counting m·ln(m/m) = 0), not NULL.
        F.sum(F.lit(1.0) / F.expr("CAST(shiftleft(1, max_rho) AS DOUBLE)")).alias(
            "__present_inv"
        ),
        F.count(F.lit(1)).alias("__n_present"),
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    present_inv = F.coalesce(F.col("__present_inv"), F.lit(0.0))
    sum_inv = present_inv + (F.lit(m) - F.col("__n_present")).cast("double")
    v_zero = (F.lit(m) - F.col("__n_present")).alias("v_zero")
    raw = F.when(F.col("__n_present") == 0, F.lit(0.0)).otherwise(
        F.lit(alpha) * m * m / sum_inv
    )
    # Flajolet's full correction ladder for the 32-bit hash (r9 review —
    # the large-range branch was missing, biasing estimates low once true
    # cardinality approaches 2^32/30 ≈ 143M): small-range linear counting
    # below 2.5m with empty registers, raw in the middle band, and
    # E* = −2³²·ln(1 − raw/2³²) above 2³²/30. The large-range formula is
    # undefined at raw ≥ 2³² (saturated sketch — every register at max ρ
    # can push raw past the hash space); clamp to the raw estimate there
    # rather than emit NaN.
    two32 = float(1 << 32)
    corrected = (
        F.when(
            (raw <= 2.5 * m) & (F.col("__n_present") < m),
            F.when(F.col("__n_present") == 0, F.lit(0.0)).otherwise(
                F.lit(float(m)) * F.log(F.lit(m).cast("double") / v_zero)
            ),
        )
        .when(
            (raw > F.lit(two32 / 30.0)) & (raw < F.lit(two32)),
            -F.lit(two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(
        *group_cols,
        F.lit(m).alias("m"),
        v_zero,
        F.round(raw, 6).alias("raw_estimate"),
        F.round(corrected, 6).alias("estimate"),
    )


def hll_estimate_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Per-group distinct estimate from per-group registers — same
    arithmetic as hll_estimate, one row per group, ONE pass over the data
    regardless of group count (contrast exact per-group countDistinct,
    which shuffles the full (group, key) domain)."""
    return hll_estimate_from_registers(
        hll_registers_grouped(df, key_col, group_cols, p), group_cols, p
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable equi-width quantile sketch over a KNOWN value range:
    (bin, n) with values clamped into [lo, hi). Completes the sketch trio
    (CMS = frequency, HLL = distinct, this = quantiles): fixed n_bins
    state, one aggregate pass, merge = union + sum — per-day sketches
    roll up losslessly. Precision is (hi−lo)/n_bins; for unknown ranges
    run a min/max pass first (or use the exact percentile tier)."""
    w = (hi - lo) / n_bins
    b = F.floor((F.col(value_col) - lo) / w).cast("int")
    bin_ = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantile_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).groupBy("bin").agg(F.sum("n").alias("n"))


def quantile_estimate(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Estimate quantiles from the sketch: cumulative counts over the
    (tiny, fixed-size) bin frame, then for each q the first bin whose
    cumulative share reaches q, reported as the bin's upper edge. All
    +-*/ and one window over ≤ n_bins rows — engine-exact."""
    from pyspark.sql import Window

    w = (hi - lo) / n_bins
    win = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.withColumn("__cum", F.sum("n").over(win)).crossJoin(
        F.broadcast(sketch.agg(F.sum("n").alias("__total")))
    )
    out = None
    for q in qs:
        hit = (
            cum.filter(F.col("__cum") >= F.col("__total") * q)
            .agg(F.min("bin").alias("__b"))
            .select(
                F.lit(q).alias("q"),
                F.round(F.lit(lo) + (F.col("__b") + 1) * w, 6).alias("value_at_q"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def hot_keys(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Keys whose estimated frequency exceeds ``threshold`` — the input to
    salting decisions (ops/skew). Never misses a genuinely hot key (CMS
    never undercounts); may include borderline false positives, which a
    targeted exact count over just these candidates can then prune.

    Candidate generation is SUBLINEAR (r9 review — probing every distinct
    key shuffled the full key domain, the exact cost the sketch exists to
    avoid): a map-side pigeonhole pass counts keys WITHIN each partition
    (no shuffle; Arrow batches accumulated per partition) and emits those
    with local count ≥ ceil((threshold+1)/P). Any key with global count >
    threshold must clear that bar in at least one of its P partitions, so
    a truly hot key cannot be missed; candidate volume is bounded by
    N·P/threshold rows instead of |distinct keys|. When threshold+1 ≤
    P_cap that bar would degenerate to 1 (every key a candidate), so the
    probe switches to an exact groupBy count instead (ADVICE r10) —
    same shuffle volume as the degenerate pre-filter, exact result.

    P is an UPPER bound, enforced by construction (ADVICE r9): the probe
    runs on ``coalesce(P_cap)`` of the projected frame, which guarantees
    ≤ P_cap partitions WITHOUT a shuffle and without the
    ``df.rdd.getNumPartitions()`` probe the previous version used — that
    call finalizes the AQE plan (materializing shuffle stages for
    shuffled inputs, i.e. it was NOT job-free) and measured a different
    physical plan than the one the mapInPandas pass executes. Overstating
    P only LOWERS the local bar (more candidates, never a miss), so the
    guarantee is partitioning-independent. Borderline
    NON-hot keys' membership depends on how their rows spread across
    partitions — pass ``candidates`` explicitly when the false-positive
    set must be partitioning-invariant. NULL keys are never candidates
    (the md5 bucket of NULL is NULL; a NULL-heavy key calls for a
    dedicated null-route, not salting)."""
    if candidates is None:
        import pandas as pd  # noqa: PLC0415 - worker-side dependency

        sc = df.sparkSession.sparkContext
        # partition-count cap the probe plan cannot exceed (coalesce below);
        # generous so coalesce is a no-op for typical scan parallelism
        p_cap = max(64, int(sc.defaultParallelism) * 4)
        if threshold + 1 <= p_cap:
            # ADVICE r10: here ceil((T+1)/P_cap) = 1, so the pigeonhole
            # pre-filter keeps EVERY distinct key — a full distinct in
            # disguise, with a CMS probe bolted on. The candidate bound
            # buys nothing at thresholds this small; an exact map-side-
            # combined groupBy count is the same shuffle volume and is
            # strictly stronger (exact counts, zero false positives).
            # Output schema/name match the sketch path; NULL keys are
            # excluded there too (NULL md5 bucket), so the contract holds.
            return (
                df.filter(F.col(key_col).isNotNull())
                .groupBy(key_col)
                .agg(F.count(F.lit(1)).alias("est_count"))
                .filter(F.col("est_count") > threshold)
            )
        thr_local = -(-(threshold + 1) // p_cap)  # ceil((T+1)/P_cap)

        def _local_heavy(batches):
            from collections import Counter

            counts: Counter = Counter()
            for pdf in batches:
                counts.update(pdf[key_col].dropna().value_counts().to_dict())
            yield pd.DataFrame(
                {key_col: [k for k, v in counts.items() if v >= thr_local]}
            )

        candidates = (
            df.select(key_col)
            .coalesce(p_cap)
            .mapInPandas(_local_heavy, schema=df.select(key_col).schema)
            .distinct()
        )
    sketch = cms_build(df, key_col, depth, width)
    est = cms_estimate(sketch, candidates, key_col, depth, width)
    return est.filter(F.col("est_count") > threshold)
