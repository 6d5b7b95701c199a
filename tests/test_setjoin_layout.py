"""Unit tests for llm/setjoin (prefix-filtered exact similarity join) and
ops/layout (Z-order keys + skipping census) — the ADVICE r5 gap: both
modules shipped ungated and untested.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from aos_spark.llm.setjoin import ppjoin_pairs
from aos_spark.ops.layout import chunk_minmax_census, zorder_key, zorder_key_sql


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "completely unrelated text about spark clusters and shuffles"),
    (5, "totally different words sharing nothing with anything else"),
    (6, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (7, "spark clusters and shuffles are completely unrelated text about"),
]


def _brute_force(threshold: float, n: int = 3) -> set[tuple[int, int]]:
    sh = {i: _shingles(t, n) for i, t in DOCS}
    out = set()
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


@pytest.mark.parametrize("threshold", [0.07, 0.3, 0.5, 0.8, 1.0])
def test_ppjoin_matches_brute_force(spark, threshold):
    """Completeness + soundness: prefix-filtered output must equal the
    all-pairs brute force at every threshold, including t=0.07 (where
    ceil(0.07 * n) hits the double-rounding hazard the 1e-9 guard fixes)
    and t=1.0 (exact duplicates only)."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in ppjoin_pairs(df, "doc_id", "text", 3, threshold).collect()
    }
    assert got == _brute_force(threshold)


def test_ppjoin_jaccard_values_exact(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = ppjoin_pairs(df, "doc_id", "text", 3, 0.5).collect()
    sh = {i: _shingles(t) for i, t in DOCS}
    for r in rows:
        inter = len(sh[r.id_a] & sh[r.id_b])
        union = len(sh[r.id_a] | sh[r.id_b])
        assert r.jaccard == pytest.approx(inter / union, abs=1e-6)
    # the exact-dup pair scores 1.0
    assert any(r.id_a == 1 and r.id_b == 6 and r.jaccard == 1.0 for r in rows)


def test_ppjoin_threshold_filter_is_unrounded(spark):
    """A pair whose true Jaccard is just BELOW the threshold must not be
    admitted by round-then-compare. 8/17 = 0.470588... < 0.4705885, but
    rounds to 0.470588 at 6 dp — wait, that rounds DOWN; use 0.4705882:
    round6 -> 0.470588 < t, true value 0.47058823 > ... pick the clean
    construction: t such that round(j,6) >= t but j < t."""
    # doc pair with jaccard exactly 9/19 = 0.473684210...
    # threshold 0.4736843: true j < t, but round(j,6)=0.473684 < t too —
    # construct the admitting direction instead: j = 2/3 = 0.666666666...
    # round6 = 0.666667 >= t for t=0.6666665, and true j 0.6666666... >= t
    # as well. The dangerous case is j slightly below t with round(j,6)
    # >= t: j = 0.6666666..., t = 0.66666665 -> round6 0.666667 >= t but
    # true j < t. Build docs with |A∩B|=2, |A∪B|=3.
    docs = [(1, "a b c d"), (2, "a b c e")]
    # shingles(3): doc1 {a b c, b c d}, doc2 {a b c, b c e} -> inter 1,
    # union 3 -> j = 1/3. Use threshold between 1/3 and round(1/3,6):
    # round(1/3,6) = 0.333333 < 1/3, so round-then-compare would DROP a
    # true positive at t=0.3333332 (since 0.333333 < t <= 0.33333333).
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t = 0.3333332
    got = ppjoin_pairs(df, "doc_id", "text", 3, t).collect()
    assert len(got) == 1, "round-before-filter dropped a true positive"


def test_ppjoin_rejects_bad_threshold(spark):
    df = None
    with pytest.raises(ValueError):
        ppjoin_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        ppjoin_pairs(df, threshold=1.5)
    with pytest.raises(ValueError):
        ppjoin_pairs(df, oversize="explode")
    with pytest.raises(ValueError):
        ppjoin_pairs(df, max_shingles_per_doc=0)


def test_ppjoin_cap_above_doc_size_is_exact(spark):
    """A cap no doc reaches must not change anything: brute-force equality
    holds with max_shingles_per_doc barely above the largest doc."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    biggest = max(len(_shingles(t)) for _, t in DOCS)
    got = {
        (r.id_a, r.id_b)
        for r in ppjoin_pairs(
            df, "doc_id", "text", 3, 0.3, max_shingles_per_doc=biggest
        ).collect()
    }
    assert got == _brute_force(0.3)


def test_ppjoin_truncate_bounds_oversize_doc(spark):
    """With oversize='truncate', an over-cap doc is represented by its
    ``cap`` rarest shingles; under-cap pairs stay exact. Construct a corpus
    where docs 1/2 are near-dups under the cap and doc 3 is a mega-doc:
    the 1-2 pair must survive with its exact (uncapped) jaccard, and the
    mega-doc must not crash the plan."""
    mega = " ".join(f"tok{i} mid{i} end{i}" for i in range(400))
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, mega),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = ppjoin_pairs(
        df, "doc_id", "text", 3, 0.5, max_shingles_per_doc=50
    ).collect()
    sh1, sh2 = _shingles(docs[0][1]), _shingles(docs[1][1])
    exact = len(sh1 & sh2) / len(sh1 | sh2)
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    [r12] = rows
    assert r12.jaccard == pytest.approx(exact, abs=1e-6)


def test_ppjoin_truncate_is_deterministic_rarest_first(spark):
    """Truncation keeps the RAREST-first global order: two identical
    over-cap docs still pair at jaccard 1.0 because both truncate to the
    same rarest-``cap`` subset."""
    mega = " ".join(f"w{i} x{i} y{i}" for i in range(100))
    docs = [(1, mega), (2, mega)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = ppjoin_pairs(
        df, "doc_id", "text", 3, 0.9, max_shingles_per_doc=40
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_ppjoin_oversize_raise_fails_fast(spark):
    """oversize='raise' must fail the job with the offending doc id in the
    message, and must NOT fail when every doc fits the cap."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = [(7, "a b c d e f g h i j k l m n o p q r s t u v w x y z")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # Py4JJavaError (classic py4j surface) or SparkRuntimeException
    # (Spark-Connect-style capture of USER_RAISED_EXCEPTION) — but NOT a
    # bare Exception, which would let an unrelated AnalysisException
    # satisfy the raises check (ADVICE r8).
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as ei:
        ppjoin_pairs(
            df, "doc_id", "text", 3, 0.5,
            max_shingles_per_doc=5, oversize="raise",
        ).collect()
    assert "max_shingles_per_doc=5" in str(ei.value)
    assert "document 7" in str(ei.value)
    # under the cap: no raise, normal (empty — single doc) result
    ok = ppjoin_pairs(
        df, "doc_id", "text", 3, 0.5,
        max_shingles_per_doc=1000, oversize="raise",
    ).collect()
    assert ok == []


def _morton_py(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python(spark):
    pts = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 11)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 6).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _morton_py(r.x, r.y, 6)


def test_zorder_key_int_inputs_bits_over_15(spark):
    """Regression for the ADVICE r5 overflow: IntegerType inputs with
    bits > 15 used to wrap mod 32 in Java int shifts. After the
    cast-to-long fix, bit positions up to 2*31-1 are exact."""
    pts = [(1 << 20, 0), (0, 1 << 20), ((1 << 21) - 1, (1 << 21) - 5)]
    df = spark.createDataFrame(pts, ["x", "y"]).select(
        F.col("x").cast("int").alias("x"), F.col("y").cast("int").alias("y")
    )
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 21).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _morton_py(r.x, r.y, 21)


def test_zorder_key_rejects_bad_bits(spark):
    with pytest.raises(ValueError):
        zorder_key(F.col("x"), F.col("y"), 32)
    with pytest.raises(ValueError):
        zorder_key(F.col("x"), F.col("y"), 0)


def test_zorder_key_sql_mirror(spark):
    """The DuckDB-mirror SQL string, evaluated by Spark's own SQL engine,
    must agree with the Column form."""
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        zorder_key(F.col("x"), F.col("y"), 4).alias("z"),
        F.expr(zorder_key_sql("x", "y", 4)).cast("long").alias("z_sql"),
    ).collect()
    for r in rows:
        assert r.z == r.z_sql


def test_chunk_census_zorder_beats_linear_on_y(spark):
    """On a uniform grid, linear (x-only) chunking gives perfect x widths
    but full-domain y widths; Z-order shrinks y substantially. The census
    must reflect both facts."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, ["x", "y"])
    dims = {"x": F.col("x"), "y": F.col("y")}
    lin = chunk_minmax_census(
        df, F.shiftright(F.col("x").cast("long"), 1), dims, "linear"
    ).collect()[0]
    zo = chunk_minmax_census(
        df,
        F.shiftright(zorder_key(F.col("x"), F.col("y"), 5), 6),
        dims,
        "zorder",
    ).collect()[0]
    assert lin.n_rows == zo.n_rows == 1024
    assert lin.n_chunks == zo.n_chunks == 16
    # linear: each chunk spans 2 x-values, all 32 y-values
    assert lin.sum_width_x == 16 * 2
    assert lin.sum_width_y == 16 * 32
    # zorder: each 64-point Z-block is an 8x8 tile
    assert zo.sum_width_x == 16 * 8
    assert zo.sum_width_y == 16 * 8
