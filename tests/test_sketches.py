"""Tests for the count-min sketch (ops/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aos_spark.ops import sketches


def _skewed(spark):
    # one hot key (600 rows), many cold keys (2 rows each)
    hot = spark.range(600).select(F.lit("hot").alias("k"))
    cold = spark.range(200).select(F.concat(F.lit("c"), (F.col("id") % 100)).alias("k"))
    return hot.unionAll(cold)


def test_cms_never_undercounts(spark):
    df = _skewed(spark)
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = sketches.cms_build(df, "k")
    est = {
        r["k"]: r["est_count"]
        for r in sketches.cms_estimate(sk, df.select("k").distinct(), "k").collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n  # collisions only ever ADD


def test_cms_overcount_bounded(spark):
    df = _skewed(spark)
    n_total = df.count()
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    sk = sketches.cms_build(df, "k")
    est = {
        r["k"]: r["est_count"]
        for r in sketches.cms_estimate(sk, df.select("k").distinct(), "k").collect()
    }
    # e*N/w bound (w=64) holds with overwhelming probability for d=4
    bound = 3 * n_total / sketches.DEFAULT_WIDTH
    assert all(est[k] - exact[k] <= bound for k in exact)


def test_hot_keys_finds_the_hot_key(spark):
    df = _skewed(spark)
    hot = sketches.hot_keys(df, "k", threshold=300)
    keys = [r["k"] for r in hot.collect()]
    assert "hot" in keys
    # threshold + overcount bound: no cold key (2 rows) can clear 300
    assert keys == ["hot"]


def test_sketch_size_is_bounded(spark):
    df = _skewed(spark)
    sk = sketches.cms_build(df, "k")
    assert sk.count() <= sketches.DEFAULT_DEPTH * sketches.DEFAULT_WIDTH


def test_hll_bounded_error_and_determinism(spark):
    from aos_spark.ops import sketches

    df = spark.range(10_000).select(F.col("id").alias("k"))
    est = sketches.hll_estimate(df, "k").collect()[0]
    # 64 registers → σ ≈ 1.04/√64 ≈ 13%; assert within 3σ of the truth
    assert abs(est.estimate - 10_000) / 10_000 < 0.39
    assert est.v_zero == 0  # 10k distinct fills all 64 registers
    # duplicates cannot move any register: same sketch for 3× the rows
    tripled = df.union(df).union(df)
    est2 = sketches.hll_estimate(tripled, "k").collect()[0]
    assert est2 == est


def test_hll_small_range_correction_fires(spark):
    from aos_spark.ops import sketches

    df = spark.range(20).select(F.col("id").alias("k"))
    est = sketches.hll_estimate(df, "k").collect()[0]
    assert est.v_zero > 0  # 20 keys cannot fill 64 registers
    assert est.estimate != est.raw_estimate  # linear counting kicked in
    assert abs(est.estimate - 20) / 20 < 0.5


def test_hll_empty_input_is_zero(spark):
    """Empty input → estimate 0.0, not NULL (ADVICE r2): V = m and the
    linear-counting branch gives m·ln(m/m) = 0."""
    from aos_spark.ops import sketches

    df = spark.range(5).filter("id < 0").select(F.col("id").alias("k"))
    est = sketches.hll_estimate(df, "k").collect()[0]
    assert est.v_zero == est.m
    assert est.raw_estimate == 0.0
    assert est.estimate == 0.0


def test_hll_rho_case_sql_matches_python(spark):
    from aos_spark.ops import sketches

    q = 26
    rows = spark.sql(
        f"SELECT w, {sketches.rho_case_sql('w', q)} AS rho FROM VALUES "
        f"(0), (1), (2), (3), ({1 << (q - 1)}), ({(1 << q) - 1}) AS t(w)"
    ).collect()
    expect = {0: q + 1, 1: q, 2: q - 1, 3: q - 1, 1 << (q - 1): 1, (1 << q) - 1: 1}
    assert {r.w: r.rho for r in rows} == expect


def test_hll_grouped_merge_is_lossless(spark):
    """Register frames built on two halves of the data and merged with
    hll_merge must equal the frame built on the whole — the mergeability
    contract that lets per-day sketches roll up without rescanning."""
    from aos_spark.ops import sketches

    df = spark.range(5_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    a = df.filter(F.col("k") < 2_500)
    b = df.filter(F.col("k") >= 2_500)
    whole = sketches.hll_registers_grouped(df, "k", ["g"])
    merged = sketches.hll_merge(
        sketches.hll_registers_grouped(a, "k", ["g"]),
        sketches.hll_registers_grouped(b, "k", ["g"]),
        ["g"],
    )
    key = lambda r: (r["g"], r["register"], r["max_rho"])
    assert sorted(map(key, whole.collect())) == sorted(map(key, merged.collect()))


def test_hll_grouped_estimates_within_error(spark):
    from aos_spark.ops import sketches

    df = spark.range(9_000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    rows = sketches.hll_estimate_grouped(df, "k", ["g"]).collect()
    assert len(rows) == 3
    for r in rows:  # 3000 distinct per group, σ ≈ 13% at m=64
        assert abs(r["estimate"] - 3_000) / 3_000 < 0.39


def test_quantile_sketch_merge_and_accuracy(spark):
    """Sketch of halves merged == sketch of whole (lossless), and the
    p50 estimate lands within one bin width of the true median."""
    from aos_spark.ops import sketches

    df = spark.range(10_000).select((F.col("id") % 1000).cast("double").alias("v"))
    a, b = df.filter(F.col("id") < 5_000), df.filter(F.col("id") >= 5_000)
    whole = sketches.quantile_sketch(df, "v", 0.0, 1000.0)
    merged = sketches.quantile_merge(
        sketches.quantile_sketch(a, "v", 0.0, 1000.0),
        sketches.quantile_sketch(b, "v", 0.0, 1000.0),
    )
    key = lambda r: (r["bin"], r["n"])
    assert sorted(map(key, whole.collect())) == sorted(map(key, merged.collect()))
    est = {
        r["q"]: r["value_at_q"]
        for r in sketches.quantile_estimate(whole, [0.5], 0.0, 1000.0).collect()
    }
    assert abs(est[0.5] - 500.0) <= 1000.0 / 256 + 1e-9


def test_quantile_sketch_empty_input(spark):
    """Empty input → empty sketch; estimates return one row per q with
    NULL value (no crash, no division blowup)."""
    from aos_spark.ops import sketches

    df = spark.range(5).filter("id < 0").select(F.col("id").cast("double").alias("v"))
    sk = sketches.quantile_sketch(df, "v", 0.0, 10.0)
    assert sk.count() == 0
    est = sketches.quantile_estimate(sk, [0.5], 0.0, 10.0).collect()
    assert len(est) == 1 and est[0]["value_at_q"] is None


def test_hll_large_range_correction(spark):
    """r9 review: the 32-bit large-range correction was missing, biasing
    estimates low once raw approaches the hash space. Above 2^32/30 the
    estimate must be -2^32 * ln(1 - raw/2^32) (> raw); at raw >= 2^32
    (saturated sketch) the formula is undefined and the raw estimate is
    kept instead of emitting NaN."""
    import math

    from aos_spark.ops.sketches import HLL_P, hll_estimate_from_registers

    m = 1 << HLL_P
    # all registers at rho=24: raw ≈ 7.7e8 — inside the correction band
    regs = spark.createDataFrame(
        [(r, 24) for r in range(m)], "register int, max_rho int"
    )
    row = hll_estimate_from_registers(regs, []).collect()[0]
    raw = row["raw_estimate"]
    assert (1 << 32) / 30.0 < raw < float(1 << 32)
    expected = -float(1 << 32) * math.log(1.0 - raw / float(1 << 32))
    assert row["estimate"] > raw
    assert abs(row["estimate"] - expected) / expected < 1e-6

    # saturated: rho = q+1 = 27 pushes raw past 2^32 — clamp to raw
    regs_sat = spark.createDataFrame(
        [(r, 27) for r in range(m)], "register int, max_rho int"
    )
    row_s = hll_estimate_from_registers(regs_sat, []).collect()[0]
    assert row_s["raw_estimate"] >= float(1 << 32)
    assert row_s["estimate"] == row_s["raw_estimate"]
    assert not math.isnan(row_s["estimate"])


def test_hot_keys_pigeonhole_candidates_cannot_miss(spark):
    """r9 review: candidates now come from a map-side local-count pass
    instead of an exact distinct over the key domain. Pigeonhole
    guarantee: a key over threshold globally must clear the local bar in
    some partition — verified here with the hot key's rows deliberately
    SPREAD thin across many partitions (the worst case for a local
    filter), plus the explicit-candidates escape hatch."""
    rows = [("hot",)] * 400 + [(f"cold{i}",) for i in range(50)]
    # 32 partitions, hot rows interleaved so every partition sees ~12-13
    df = spark.createDataFrame(rows, ["k"]).repartition(32)
    hot = sketches.hot_keys(df, "k", threshold=300)
    assert [r["k"] for r in hot.collect()] == ["hot"]

    # explicit candidates: partitioning-invariant probe set
    cand = spark.createDataFrame([("hot",), ("cold1",)], ["k"])
    hot2 = sketches.hot_keys(df, "k", threshold=300, candidates=cand)
    assert [r["k"] for r in hot2.collect()] == ["hot"]


def test_hot_keys_pigeonhole_holds_on_shuffled_input(spark):
    """ADVICE r9: the pigeonhole bar used df.rdd.getNumPartitions(),
    which (a) finalizes the AQE plan — a job for shuffled inputs — and
    (b) measured a different physical plan than the probe executes. The
    bar now comes from a coalesce() cap enforced on the probe plan
    itself, so the no-missed-hot-key guarantee must hold even when the
    input is a fresh shuffle whose final partition count AQE may change."""
    df = _skewed(spark)
    # a shuffle boundary upstream of the probe (the case the old code
    # measured wrong): group-and-explode back to rows
    shuffled = df.repartition(17, "k")
    hot = sketches.hot_keys(shuffled, "k", threshold=300)
    assert [r["k"] for r in hot.collect()] == ["hot"]


def test_hot_keys_small_threshold_exact_fallback(spark):
    """ADVICE r10: for threshold+1 <= P_cap the pigeonhole bar was
    ceil((T+1)/P_cap) = 1, degenerating the candidate pre-filter to a
    full distinct. The probe now answers small thresholds with an exact
    groupBy count — same schema (key, est_count), exact values, no
    false positives, NULLs still excluded."""
    rows = (
        [("hot",)] * 40
        + [("warm",)] * 11
        + [(f"cold{i}",) for i in range(20)]
        + [(None,)] * 60
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    hot = sketches.hot_keys(df, "k", threshold=10)
    got = {r["k"]: r["est_count"] for r in hot.collect()}
    # exact counts, not CMS estimates; NULL (60 rows > threshold) excluded
    assert got == {"hot": 40, "warm": 11}
