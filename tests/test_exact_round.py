"""Locks for ops/exact_round — the idioms that retire the round-9
cross-engine rounding hazard class (see tests/test_stats_cross_engine.py
for the hazard itself and MISMATCH_LOG.jsonl for the incident).

Three forms, one contract: identical values in Spark, DuckDB, and exact
rational arithmetic (Python Fraction), INCLUDING denominators built to
put the quotient exactly on the .5 micro-boundary where the legacy
ROUND(double, 6) output was a cross-engine coin flip.
"""

from __future__ import annotations

import random
from fractions import Fraction

import duckdb
from pyspark.sql import functions as F

from aos_spark.ops.exact_round import (
    duck_round_ratio6,
    round_ratio6,
    scaled_round6,
    sql_round_ratio6,
    sql_scaled_round6,
)

# denominators chosen for 2-adic structure: v2(2e6)=7, so v2(den)=7 (128,
# 384, 640) makes num·2e6/den odd — an EXACT .5 boundary — whenever num
# is odd; 51 and 997 are odd (boundary unreachable); 2e6 divides out.
ADVERSARIAL_DENS = [1, 2, 3, 7, 16, 32, 51, 64, 100, 128, 125, 384, 640, 997, 2_000_000]


def _ground_truth(n: int, d: int) -> float:
    q = Fraction(n * 1_000_000 * 2 + d, d * 2)
    return (q.numerator // q.denominator) / 1e6


def test_round_ratio6_matches_exact_rational_in_both_engines(spark):
    rng = random.Random(9)
    cases = [(rng.randint(0, d * 3), d) for d in ADVERSARIAL_DENS for _ in range(10)]
    cases += [(0, 1), (1, 2), (63, 128), (103, 128), (1, 2_000_000)]

    rows = ", ".join(f"({i}, {n}, {d})" for i, (n, d) in enumerate(cases))
    sres = {
        r.i: r.v
        for r in spark.sql(
            f"SELECT i, {sql_round_ratio6('n', 'd')} AS v"
            f" FROM (VALUES {rows}) t(i, n, d)"
        ).collect()
    }
    dres = dict(
        duckdb.sql(
            f"SELECT i, {duck_round_ratio6('n', 'd')}"
            f" FROM (VALUES {rows}) t(i, n, d)"
        ).fetchall()
    )
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(cases)], ["i", "n", "d"]
    )
    cres = {
        r.i: r.v
        for r in df.select(
            "i", round_ratio6(F.col("n"), F.col("d")).alias("v")
        ).collect()
    }
    for i, (n, d) in enumerate(cases):
        exact = _ground_truth(n, d)
        assert sres[i] == dres[i] == cres[i] == exact, (
            f"n={n} d={d}: sql={sres[i]} duck={dres[i]} col={cres[i]} "
            f"exact={exact}"
        )


def test_scaled_round6_agrees_on_shared_adversarial_doubles(spark):
    """ROUND(x·1e6, 0)/1e6 must agree across engines on IDENTICAL doubles
    including exact half-boundary rationals. Literals go through a string
    cast — DuckDB parses bare 17-digit numerics via DECIMAL(17,13),
    landing one ulp off Spark's correct double parse (a test-harness
    trap, not a pipeline one: pipelines share parquet bits)."""
    rng = random.Random(7)
    vals = ["%.17g" % (rng.randint(0, 384 * 3) / d) for d in (128, 384, 640) for _ in range(50)]
    vals += ["%.17g" % rng.random() for _ in range(100)]
    vals += ["0.1234565", "8124.1700624999994", "-0.0000005", "902147.5838465"]

    rows = ", ".join(
        f"({i}, CAST('{v}' AS DOUBLE))" for i, v in enumerate(vals)
    )
    expr = sql_scaled_round6("v")
    sres = {
        r.i: r.d
        for r in spark.sql(
            f"SELECT i, {expr} AS d FROM (VALUES {rows}) t(i, v)"
        ).collect()
    }
    dres = dict(
        duckdb.sql(f"SELECT i, {expr} FROM (VALUES {rows}) t(i, v)").fetchall()
    )
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], ["i", "v"]
    )
    cres = {
        r.i: r.d for r in df.select("i", scaled_round6(F.col("v")).alias("d")).collect()
    }
    bad = [
        (vals[i], sres[i], dres[i], cres[i])
        for i in range(len(vals))
        if not (sres[i] == dres[i] == cres[i])
    ]
    assert not bad, bad[:5]


def test_round_ratio6_null_propagates(spark):
    """NULL num or den → NULL (the LEFT-JOIN mean shape, e.g. avg_bal for
    an empty nation, must stay NULL — the repo's null contract)."""
    row = spark.sql(
        f"SELECT {sql_round_ratio6('CAST(NULL AS BIGINT)', 'x')} AS a,"
        f"       {sql_round_ratio6('x', 'CAST(NULL AS BIGINT)')} AS b"
        f" FROM (VALUES (3)) t(x)"
    ).collect()[0]
    assert row.a is None and row.b is None
    drow = duckdb.sql(
        f"SELECT {duck_round_ratio6('CAST(NULL AS BIGINT)', 'x')},"
        f"       {duck_round_ratio6('x', 'CAST(NULL AS BIGINT)')}"
        f" FROM (VALUES (3)) t(x)"
    ).fetchone()
    assert drow == (None, None)


def test_round_ratio6_micro_signed_matches_fraction_and_duckdb(spark):
    """r9 review: the unsigned idiom fed a negative numerator truncates
    toward zero (Spark decimal % keeps the dividend sign), so every
    negative mean came out one micro-unit high. The signed variant must
    round half-AWAY-from-zero (both engines' ROUND semantics) and match
    the Fraction ground truth and DuckDB's mirrored CASE on both signs."""
    from fractions import Fraction

    from aos_spark.ops.exact_round import round_ratio6_micro_signed

    cases = [  # (sum_micro, cnt) including exact half-boundary negatives
        (-5_000_000, 4),     # -1.25  -> -1.25
        (-4_999_998, 4),     # -1.2499995 -> half: away from zero
        (5_000_000, 4),
        (-1, 3), (1, 3), (-2, 4), (2, 4), (0, 7),
        (-123_456_789, 97), (123_456_789, 97),
        (-999_999, 2), (999_999, 2),
    ]
    df = spark.createDataFrame(cases, "num long, cnt long")
    got = {
        (r["num"], r["cnt"]): r["avg"]
        for r in df.select(
            "num", "cnt",
            round_ratio6_micro_signed(F.col("num"), F.col("cnt")).alias("avg"),
        ).collect()
    }
    for num, cnt in cases:
        frac = Fraction(num, cnt * 1_000_000)
        # ROUND half away from zero at 6 decimals of the true rational
        scaled = Fraction(abs(num), cnt)  # |value| * 1e6
        q, r = divmod(scaled.numerator, scaled.denominator)
        half = 2 * r >= scaled.denominator
        want = (q + (1 if half else 0)) / 1e6
        if num < 0:
            want = -want
        assert got[(num, cnt)] == want, (num, cnt, got[(num, cnt)], want)

    duck = duckdb.sql(
        """
        SELECT num, cnt,
               CASE WHEN num >= 0 THEN
               CAST((CAST(num AS HUGEINT) * 2 + CAST(cnt AS HUGEINT)) // (CAST(cnt AS HUGEINT) * 2) AS DOUBLE) / 1000000.0
               ELSE
               -(CAST((CAST(-num AS HUGEINT) * 2 + CAST(cnt AS HUGEINT)) // (CAST(cnt AS HUGEINT) * 2) AS DOUBLE) / 1000000.0)
               END AS avg
        FROM (SELECT UNNEST($nums) AS num, UNNEST($cnts) AS cnt)
        """,
        params={"nums": [c[0] for c in cases], "cnts": [c[1] for c in cases]},
    ).fetchall()
    for num, cnt, avg in duck:
        assert got[(num, cnt)] == avg, (num, cnt, got[(num, cnt)], avg)
