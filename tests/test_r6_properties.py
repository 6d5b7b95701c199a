"""Hypothesis property tests for the round-6 operators: randomized
corpora/thresholds against pure-Python replicas. Deterministic profiles
(derandomize) so CI never flakes; example counts sized for the shared
Spark session's per-query latency."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aos_spark.llm.setjoin import ppjoin_pairs
from aos_spark.ops.layout import zorder_key

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

doc_strategy = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=12
).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=6)


def _shingles(text: str, n: int = 3) -> set[str]:
    """Replica of shingle_frame's contract, including the degenerate
    cases: a doc shorter than n tokens contributes its whole token join
    as one shingle, and an EMPTY doc contributes the empty-string
    shingle (concat_ws over missing elements) — so two empty docs are
    exact duplicates, matching the DuckDB oracle's ELSE branch."""
    toks = [t for t in text.split() if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


SLOW = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    docs=corpus_strategy,
    threshold=st.sampled_from([0.07, 0.34, 0.5, 0.75, 1.0]),
)
def test_ppjoin_equals_brute_force_random(spark, docs, threshold):
    """Prefix + position + length filters must be COMPLETE (no pair at or
    above the threshold dropped) and SOUND (none below admitted) on
    arbitrary small corpora — the lemma chain, fuzzed. Low-diversity
    vocab maximizes shared shingles, stressing the prefix order."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in ppjoin_pairs(df, "doc_id", "text", 3, threshold).collect()
    }
    sh = {i: _shingles(t) for i, t in rows}
    want = set()
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= threshold:
            want.add((a, b))
    assert got == want


def _truncated(sh: dict[int, set[str]], cap: int) -> dict[int, set[str]]:
    """Replica of the max_shingles_per_doc truncate semantics: global
    order is (corpus document-frequency ASC, shingle ASC); each doc keeps
    its first ``cap`` shingles in that order."""
    from collections import Counter

    df_count = Counter(g for s in sh.values() for g in s)
    return {
        i: set(sorted(s, key=lambda g: (df_count[g], g))[:cap])
        for i, s in sh.items()
    }


@SLOW
@given(
    docs=corpus_strategy,
    threshold=st.sampled_from([0.34, 0.5, 1.0]),
    cap=st.sampled_from([1, 2, 4, 100]),
)
def test_ppjoin_truncate_equals_brute_force_on_truncated_sets(
    spark, docs, threshold, cap
):
    """max_shingles_per_doc truncate semantics, fuzzed: the output must
    equal the exact all-pairs join over the RAREST-``cap`` subsets (and
    therefore the uncapped result whenever cap >= every doc's shingle
    count — the cap=100 examples)."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ppjoin_pairs(
            df, "doc_id", "text", 3, threshold, max_shingles_per_doc=cap
        ).collect()
    }
    sh = _truncated({i: _shingles(t) for i, t in rows}, cap)
    want = {}
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= threshold:
            want[(a, b)] = round(inter / union, 6)
    assert got == want


@SLOW
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 21) - 1),
            st.integers(min_value=0, max_value=(1 << 21) - 1),
        ),
        min_size=1,
        max_size=8,
    ),
    bits=st.sampled_from([1, 4, 8, 16, 21]),
)
def test_zorder_matches_python_replica_random(spark, pts, bits):
    def morton(x, y, b):
        out = 0
        for i in range(b):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(pts, ["x", "y"]).select(
        F.col("x").cast("int").alias("x"), F.col("y").cast("int").alias("y")
    )
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits).alias("z")
    ).collect()
    for r in rows:
        assert r.z == morton(r.x, r.y, bits)
