"""Property tests for the round-3 relational/statistical operators: the
interpolated-percentile construction matches numpy's linear interpolation,
the discrete-percentile construction picks actual corpus elements, and the
gap-fill spine is dense and forward-filled correctly."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Window


def _percentile_cont(spark, values, p):
    """Mirror of q_percentile_cont's window+agg construction for one group."""
    df = spark.createDataFrame([(float(v), i) for i, v in enumerate(values)], ["v", "i"])
    w = Window.partitionBy(F.lit(1)).orderBy("v", "i")
    cw = Window.partitionBy(F.lit(1))
    d = df.select(
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    idx = F.lit(p) * (F.col("n") - 1).cast("double")
    lo = F.floor(idx).cast("bigint") + 1
    hi = F.least(lo + 1, F.col("n"))
    frac = idx - F.floor(idx)
    v_lo = F.min(F.when(F.col("rn") == lo, F.col("v")))
    v_hi = F.min(F.when(F.col("rn") == hi, F.col("v")))
    f = F.min(F.when(F.col("rn") == lo, frac))
    return d.agg((v_lo + f * (v_hi - v_lo)).alias("q")).collect()[0]["q"]


def test_percentile_cont_matches_numpy(spark):
    rng = np.random.RandomState(7)
    for n in (1, 2, 3, 10, 101):
        values = rng.uniform(-50, 50, size=n).round(3)
        for p in (0.0, 0.25, 0.5, 0.9, 1.0):
            got = _percentile_cont(spark, values, p)
            want = float(np.percentile(values, p * 100, method="linear"))
            assert abs(got - want) < 1e-9, (n, p, got, want)


def test_corpus_length_percentiles_pick_corpus_elements(spark, sf_dir):
    from aos_spark.queries import QUERIES

    rows = QUERIES["corpus_length_percentiles"](spark, sf_dir).collect()
    assert rows
    lengths = {
        (r["lang"], r["n_chars"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "n_chars")
        .collect()
    }
    for r in rows:
        for c in ("p25_chars", "p50_chars", "p75_chars", "max_chars"):
            assert (r["lang"], r[c]) in lengths  # discrete = actual element
        assert r["p25_chars"] <= r["p50_chars"] <= r["p75_chars"] <= r["max_chars"]


def test_gapfill_spine_is_dense_and_filled(spark, sf_dir):
    from aos_spark.queries import QUERIES

    rows = QUERIES["gapfill_hourly_events"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    hours = {min(r["window_start"] for r in rows), max(r["window_start"] for r in rows)}
    lo, hi = min(hours), max(hours)
    expect_n = int((hi - lo).total_seconds() // 3600) + 1
    for typ, rs in by_type.items():
        rs.sort(key=lambda r: r["window_start"])
        # dense: every hour between the global bounds appears exactly once
        assert len(rs) == expect_n, typ
        for a, b in zip(rs, rs[1:]):
            assert b["window_start"] - a["window_start"] == dt.timedelta(hours=1)
        # forward fill: gap rows carry the previous non-gap value
        carried = None
        for r in rs:
            if r["n_events"] > 0:
                carried = r["sum_value"]
                assert r["ffill_sum_value"] == r["sum_value"]
            else:
                assert r["n_events"] == 0 and r["sum_value"] == 0.0
                assert r["ffill_sum_value"] == carried


def test_salted_distinct_exact_on_skewed_data(spark):
    from aos_spark.ops.skew import salted_distinct_count

    # one hot key owning 90% of rows, many duplicate values
    rows = [("hot", i % 37) for i in range(9000)] + [
        (f"cold{i % 5}", i % 11) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_exact_moment_corr_agrees_with_native(spark, sf_dir):
    """The decimal-moment correlation must agree with Spark's native corr
    to ~1e-9 (they differ only in accumulation rounding)."""
    from aos_spark.io.readers import read_sf_table
    from aos_spark.ops.stats import grouped_correlation

    li = read_sf_table(spark, sf_dir, "lineitem")
    ours = {
        r["l_returnflag"]: r
        for r in grouped_correlation(
            li, ["l_returnflag"], "l_quantity", "l_extendedprice"
        ).collect()
    }
    native = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.stddev_samp("l_quantity").alias("sx"),
        )
        .collect()
    }
    for k, r in ours.items():
        assert abs(r["corr_xy"] - native[k]["c"]) < 1e-6
        assert abs(r["covar_xy"] - native[k]["cv"]) < 1e-3 * max(1, abs(native[k]["cv"]))
        assert abs(r["stddev_x"] - native[k]["sx"]) < 1e-6 * max(1, native[k]["sx"])


def test_sessionize_and_asof_survive_ntz_timestamps(spark):
    """TIMESTAMP_NTZ regression lock (rounds 2-3 both lost the driver gate
    to an LTZ-only cast): sessionize and the asof tolerance path must run
    on NTZ-typed event timestamps."""
    from pyspark.sql import functions as F

    from aos_spark.ops import windows as W
    from aos_spark.ops.asof import asof_join

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "value",
            "event_id",
        )
    )
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    sessions = W.sessionize(ev, ["user_id"], "ts", 6 * 3600, "value")
    assert sessions.count() > 0
    left = ev.select("user_id", "ts", "event_id")
    right = ev.select("user_id", "ts", F.col("value"))
    out = asof_join(left, right, on="ts", by=["user_id"],
                    value_cols=["value"], tolerance_seconds=3600)
    assert out.count() == left.count()

    # and under the GATE's session flavor (timestampType=TIMESTAMP_NTZ,
    # where a bare cast("timestamp") resolves to NTZ and unix_micros
    # rejects it — r9 review follow-up): same two paths must still run
    prev = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        assert W.sessionize(ev, ["user_id"], "ts", 6 * 3600, "value").count() > 0
        out2 = asof_join(left, right, on="ts", by=["user_id"],
                         value_cols=["value"], tolerance_seconds=3600)
        assert out2.count() == left.count()
    finally:
        spark.conf.set("spark.sql.timestampType", prev)


def test_embedding_quantize_string_roundtrips_int8_array(spark, sf_dir):
    """The driver-facing q_int8 column is a comma-joined string (the
    driver's pandas canonicalizer can't hash LIST cells — VERDICT r4);
    this keeps the underlying int8 array semantics under test: parse the
    string back and check range, scale inversion, and sign."""
    from aos_spark.queries import QUERIES

    rows = QUERIES["embedding_quantize"](spark, sf_dir).limit(50).collect()
    assert rows
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(5000)
        .collect()
    }
    checked = 0
    for r in rows:
        q = [int(x) for x in r["q_int8"].split(",")]
        assert all(-127 <= v <= 127 for v in q)
        if r["vec_id"] not in emb:
            continue
        e = emb[r["vec_id"]]
        assert len(q) == len(e)
        if r["scale"] > 0:
            maxabs = max(abs(x) for x in e)
            assert abs(r["scale"] - 127.0 / maxabs) < 1e-9
            # floor(x*scale) within 1 quantum of x*scale, sign preserved
            for xv, qv in zip(e, q):
                assert qv <= xv * r["scale"] < qv + 1 or qv in (-127, 127)
        checked += 1
    assert checked > 0


def test_array_agg_sorted_string_is_sorted_distinct(spark, sf_dir):
    """statuses is array_sort(collect_set(...)) joined to a string —
    verify sortedness/distinctness against a direct distinct-pairs scan."""
    from aos_spark.queries import QUERIES

    rows = QUERIES["array_agg_sorted"](spark, sf_dir).collect()
    want = {}
    for r in (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_orderstatus")
        .distinct()
        .collect()
    ):
        want.setdefault(r["o_orderpriority"], set()).add(r["o_orderstatus"])
    assert rows
    for r in rows:
        got = r["statuses"].split(",")
        assert got == sorted(set(got))  # sorted, no dups
        assert set(got) == want[r["o_orderpriority"]]


def test_trimmed_mean_is_outlier_robust(spark, tmp_path):
    import os

    from aos_spark.queries_r5b import q_trimmed_mean_prices

    d = str(tmp_path / "sf")
    os.makedirs(d)
    # 40 orders at ~100, one absurd outlier; 5% trim (cut=2) removes it
    rows = [(i, "1-URGENT", 100.0 + (i % 5)) for i in range(40)]
    rows.append((99, "1-URGENT", 1_000_000.0))
    spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).write.parquet(os.path.join(d, "orders.parquet"))
    r = q_trimmed_mean_prices(spark, d).collect()[0]
    assert r["n_rows"] == 41 and r["n_kept"] == 37
    assert 100.0 <= r["trimmed_mean"] <= 105.0  # outlier gone


def test_sessionize_subsecond_gap_splits(spark):
    """r9 review: unix_timestamp truncation let a true gap of 21600.8 s
    read as exactly 21600, merging sessions the streaming face splits.
    Gaps are now sub-second exact (unix_micros), matching
    streaming/jobs.py's fractional-epoch sessionizer."""
    from datetime import datetime

    from aos_spark.ops import windows as W

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0, 0, 100_000), 1.0),
            # 1800.8 s later: must be a NEW session at gap_seconds=1800
            (1, datetime(2024, 1, 1, 0, 30, 0, 900_000), 1.0),
            # 1799.5 s later: SAME session
            (1, datetime(2024, 1, 1, 1, 0, 0, 400_000), 1.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = W.sessionize(ev, ["user_id"], "ts", 1800, "value").collect()
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [1, 2], out


def test_lead_segments_null_point_value_keeps_segment(spark):
    """r9 review: a successor row with a NULL point value dropped the
    segment, shorting an n-point track below n-1 segments; the filter
    now tests successor EXISTENCE."""
    from aos_spark.ops.windows import lead_segments

    df = spark.createDataFrame(
        [(1, 1, 10.0, 1.0), (1, 2, None, 2.0), (1, 3, 30.0, 3.0)],
        "k long, seq long, cx double, cy double",
    )
    out = lead_segments(df, ["k"], "seq", ["cx", "cy"]).collect()
    assert len(out) == 2  # 3 points -> 2 segments, NULL cx notwithstanding
    by_seq = {r["seq"]: (r["cx_next"], r["cy_next"]) for r in out}
    assert by_seq[1] == (None, 2.0)
    assert by_seq[2] == (30.0, 3.0)


def test_moment_stats_pairwise_nulls_and_degenerate_groups(spark):
    """r9 review: moment_aggs counted NULL rows in n while the sums
    skipped them (corrupting every derived statistic), and derive_stats /
    grouped_linregress emitted NaN/Infinity for n<2 or constant groups
    where engine-native corr/covar return NULL."""
    import math

    from aos_spark.ops.stats import grouped_correlation, grouped_linregress

    df = spark.createDataFrame(
        [
            # group a: 3 clean pairs + one NULL-x row that must not count
            ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 7.0),
            ("a", None, 100.0),
            # group b: single pair -> all derived stats NULL
            ("b", 1.0, 1.0),
            # group c: constant x -> corr/slope NULL, stddev_x 0
            ("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 3.0),
        ],
        "g string, x double, y double",
    )
    corr = {r["g"]: r for r in grouped_correlation(df, ["g"], "x", "y").collect()}
    assert corr["a"]["n"] == 3  # NULL-x row excluded from n, not just sums
    # clean 3-pair group: corr is finite and sane
    assert 0.9 < corr["a"]["corr_xy"] <= 1.0
    for col in ("covar_xy", "stddev_x", "stddev_y", "corr_xy"):
        assert corr["b"][col] is None, (col, corr["b"][col])
    assert corr["c"]["corr_xy"] is None
    assert corr["c"]["stddev_x"] == 0.0
    for row in corr.values():
        for col in ("covar_xy", "stddev_x", "stddev_y", "corr_xy"):
            v = row[col]
            assert v is None or math.isfinite(v), (row["g"], col, v)

    lin = {r["g"]: r for r in grouped_linregress(df, ["g"], "x", "y").collect()}
    assert lin["a"]["slope"] is not None and math.isfinite(lin["a"]["slope"])
    assert lin["b"]["slope"] is None and lin["b"]["r"] is None
    assert lin["c"]["slope"] is None and lin["c"]["intercept"] is None


def test_moment_aggs_n_consistent_under_non_ansi_overflow(spark):
    """ADVICE r10: under non-ANSI Spark a decimal(18,scale) overflow casts
    to NULL, so the sums skipped the row while count(1) — and the partner
    column's sums — kept it: the r9 wrong-n-vs-sums corruption class
    re-entering via the overflow path. complete_pairs now also filters on
    post-cast nullity, so an out-of-contract row degrades to pairwise
    deletion (all six aggregates consistent) instead of corrupting the
    derived statistics. (Gate sessions run ANSI where the cast raises
    instead; this exercises the engine's own ANSI-off sessions.)"""
    from aos_spark.ops.stats import grouped_correlation

    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    df = spark.createDataFrame(
        [
            ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 7.0),
            # |x| >= 10^12 overflows decimal(18,6): cast NULLs under
            # non-ANSI, so every sum skips the row — n must too
            ("a", 1.0e13, 5.0),
        ],
        "g string, x double, y double",
    )
    row = grouped_correlation(df, ["g"], "x", "y").collect()[0]
    assert row["n"] == 3  # overflow row pairwise-deleted, not half-counted
    assert 0.9 < row["corr_xy"] <= 1.0  # stats derived from the 3 clean pairs
