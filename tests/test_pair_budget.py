"""Candidate pair-budget guard (VERDICT r13 #1): the shingle family does
Θ(candidates) work, but candidates themselves can grow quadratically when
the shingle vocabulary saturates — many moderately-common shingles, each
under the per-key ``max_shingle_df`` cap, jointly quadratic (the sf3
curve measured Σ C(df,2) growing 9× for 3× docs with the df cap never
engaging). ``max_candidate_pairs`` bounds the SUM.

The engine-side measurable: for ``shingle_intersection_counts`` the
candidate self-join emits exactly C(df,2) (id_a < id_b) rows per kept
key, and every one of those rows lands in exactly one group's n_common —
so ``sum(n_common) over the output == Σ_kept C(df,2)``, and the budget
assertion is a direct aggregation of the engine's own output, not a
re-derivation from the rule.
"""

from __future__ import annotations

from itertools import groupby

import pytest
from pyspark.sql import functions as F

from aos_spark.llm.dedup import (
    PAIRS_PER_SEC_PER_CORE,
    ngram_jaccard_pairs,
    pair_budget_drop_set,
    shingle_intersection_counts,
    suggested_pair_budget,
)
from aos_spark.llm.setjoin import ppjoin_pairs


def _ref_drop_set(freq: dict[str, int], budget: int) -> set[str]:
    """Pure-Python reference of the deterministic rule: keep rarest-first
    (df ASC, shingle ASC) while Σ C(df,2) fits; the first overflowing df
    level keeps its first (remaining DIV C(df,2)) shingles in shingle ASC
    order; hotter levels drop entirely."""
    items = sorted(freq.items(), key=lambda kv: (kv[1], kv[0]))
    drops: set[str] = set()
    total = 0
    exhausted = False
    for df_val, grp in groupby(items, key=lambda kv: kv[1]):
        names = [s for s, _ in grp]
        pp = df_val * (df_val - 1) // 2
        if pp == 0:
            continue  # df <= 1 contributes no pairs, never dropped
        if exhausted:
            drops.update(names)
            continue
        lvl = pp * len(names)
        if total + lvl <= budget:
            total += lvl
            continue
        keep_n = (budget - total) // pp if budget > total else 0
        drops.update(names[keep_n:])
        exhausted = True
    return drops


def _saturating_docs(spark, n_docs: int = 30, vocab: int = 8):
    """A saturating corpus: every doc's trigram shingles come from the
    same tiny rotating vocabulary, so each shingle's df is moderate
    (far under max_shingle_df=1000) while Σ C(df,2) is large — the exact
    regime the per-key cap cannot bound."""
    toks = [f"tok{v}" for v in range(vocab)]
    rows = [
        (i, " ".join(toks[(i + j) % vocab] for j in range(10)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_drop_set_matches_python_reference(spark):
    freq = {
        # df=1 level: never dropped (0 pairs)
        "rare_a": 1, "rare_b": 1,
        # df=2: C=1 each
        "warm_a": 2, "warm_b": 2, "warm_c": 2,
        # df=4: C=6 each
        "hot_a": 4, "hot_b": 4,
        # df=10: C=45
        "mega": 10,
    }
    fdf = spark.createDataFrame(list(freq.items()), ["shingle", "sdf"])
    total = sum(d * (d - 1) // 2 for d in freq.values())  # 3 + 12 + 45 = 60
    for budget in (0, 1, 2, 3, 4, 8, 9, 14, 15, 59, 60, 61, 1000):
        got = {
            r["shingle"]
            for r in pair_budget_drop_set(fdf, budget).collect()
        }
        assert got == _ref_drop_set(freq, budget), f"budget={budget}"
        kept_pairs = sum(
            d * (d - 1) // 2 for s, d in freq.items() if s not in got
        )
        assert kept_pairs <= budget or budget >= total
        # maximality: restoring the rarest dropped pair-bearing shingle
        # must overflow (the rule wastes no budget beyond one boundary key)
        if got:
            cheapest = min(
                (freq[s] * (freq[s] - 1) // 2 for s in got)
            )
            assert kept_pairs + cheapest > budget


@pytest.mark.slow
def test_drop_set_matches_reference_randomized(spark):
    """Hypothesis wave over the fixed-fixture test above: random freq
    maps (duplicate dfs, singleton levels, whole-level and partial-level
    boundaries arise by chance) × random budgets, engine vs the pure-
    Python reference. deadline=None: each example runs Spark jobs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        freq=st.dictionaries(
            st.text("abcdefgh", min_size=1, max_size=4),
            st.integers(min_value=1, max_value=12),
            min_size=1,
            max_size=12,
        ),
        budget=st.integers(min_value=0, max_value=250),
    )
    def check(freq, budget):
        fdf = spark.createDataFrame(list(freq.items()), ["shingle", "sdf"])
        got = {
            r["shingle"] for r in pair_budget_drop_set(fdf, budget).collect()
        }
        assert got == _ref_drop_set(freq, budget), (freq, budget)
        kept = sum(
            d * (d - 1) // 2 for s, d in freq.items() if s not in got
        )
        assert kept <= budget

    check()


def test_drop_set_rejects_negative_budget(spark):
    fdf = spark.createDataFrame([("x", 2)], ["shingle", "sdf"])
    with pytest.raises(ValueError, match="budget"):
        pair_budget_drop_set(fdf, -1)


def test_intersection_budget_holds_on_saturating_fixture(spark):
    df = _saturating_docs(spark)
    free = shingle_intersection_counts(df)
    free_sum = free.agg(F.sum("n_common")).collect()[0][0]
    assert free_sum > 50  # the fixture really is candidate-dense
    for budget in (0, 10, free_sum // 2, free_sum - 1):
        out = shingle_intersection_counts(df, max_candidate_pairs=budget)
        got = out.agg(F.coalesce(F.sum("n_common"), F.lit(0))).collect()[0][0]
        # sum(n_common) IS the candidate row count — the budget's target
        assert got <= budget, f"budget={budget} got={got}"
    # a budget >= the corpus total is a no-op: bit-identical output
    assert (
        shingle_intersection_counts(df, max_candidate_pairs=free_sum)
        .exceptAll(free).count() == 0
    )


def test_budget_only_suppresses_never_invents(spark):
    df = _saturating_docs(spark)
    free = {
        (r["id_a"], r["id_b"]): r
        for r in shingle_intersection_counts(df).collect()
    }
    capped = shingle_intersection_counts(df, max_candidate_pairs=40).collect()
    for r in capped:
        ref = free[(r["id_a"], r["id_b"])]  # no invented pairs
        assert r["n_common"] <= ref["n_common"]  # undercount-only
        # denominators stay exact: built from full per-doc counts
        assert (r["n_a"], r["n_b"]) == (ref["n_a"], ref["n_b"])
    # ngram_jaccard_pairs inherits the contract: pairs subset, no new pairs
    free_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.1).collect()
    }
    capped_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, threshold=0.1, max_candidate_pairs=40
        ).collect()
    }
    assert capped_pairs <= free_pairs


def test_budget_deterministic_across_runs(spark):
    df = _saturating_docs(spark)
    a = sorted(
        map(tuple, shingle_intersection_counts(
            df, max_candidate_pairs=37
        ).collect())
    )
    b = sorted(
        map(tuple, shingle_intersection_counts(
            df, max_candidate_pairs=37
        ).collect())
    )
    assert a == b


def test_budget_raise_mode(spark):
    df = _saturating_docs(spark)
    over = shingle_intersection_counts(
        df, max_candidate_pairs=10, on_over_budget="raise"
    )
    # wrapper class varies with execution context (Py4JJavaError vs
    # pyspark-captured SparkRuntimeException) — match the message
    with pytest.raises(Exception, match="pair budget exceeded"):
        over.collect()
    # under budget the raise arm is inert — identical to the free run
    free = shingle_intersection_counts(df)
    total = free.agg(F.sum("n_common")).collect()[0][0]
    ok = shingle_intersection_counts(
        df, max_candidate_pairs=total, on_over_budget="raise"
    )
    assert ok.exceptAll(free).count() == 0
    with pytest.raises(ValueError, match="on_over_budget"):
        shingle_intersection_counts(df, max_candidate_pairs=5,
                                    on_over_budget="ignore")


def test_ppjoin_budget_semantics(spark):
    df = _saturating_docs(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ppjoin_pairs(df, threshold=0.5).collect()
    }
    assert exact  # fixture produces true near-dups
    # default raise: exactness contract fails fast when the budget binds
    with pytest.raises(Exception, match="pair budget exceeded"):
        ppjoin_pairs(df, threshold=0.5, max_candidate_pairs=3).collect()
    # a generous budget changes nothing (raise arm inert)
    roomy = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ppjoin_pairs(
            df, threshold=0.5, max_candidate_pairs=10_000_000
        ).collect()
    }
    assert roomy == exact
    # drop mode: bounded work, surviving pairs still EXACTLY verified
    dropped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ppjoin_pairs(
            df, threshold=0.5, max_candidate_pairs=20, on_over_budget="drop"
        ).collect()
    }
    assert set(dropped) <= set(exact)  # no false positives, ever
    for k, v in dropped.items():
        assert v == exact[k]  # verification untouched by the budget
    with pytest.raises(ValueError, match="on_over_budget"):
        ppjoin_pairs(df, max_candidate_pairs=5, on_over_budget="maybe")


def test_suggested_pair_budget_sizing_rule():
    """The VERDICT r14 #2 sizing rule: work cap = target_seconds x
    rate x cores, floored at the posting count (linear-regime work).
    No Spark session needed — pure arithmetic contract."""
    # work-cap regime: small corpus, the floor is far below the cap
    b = suggested_pair_budget(n_docs=10_000, avg_shingles=50.0)
    assert b == int(300.0 * PAIRS_PER_SEC_PER_CORE * 32)
    # the r14 measured configuration: 150M budget ~ 47 s of candidate
    # work on the 32-thread box — the rule reproduces that scale
    assert suggested_pair_budget(
        10_000, 50.0, cores=32, target_seconds=46.875
    ) == 150_000_000
    # postings-floor regime: budget never strangles a healthy corpus —
    # floor = ceil(n_docs x avg_shingles) wins when it exceeds the cap
    big = suggested_pair_budget(
        n_docs=2_000_000_000, avg_shingles=500.0, cores=4,
        target_seconds=1.0,
    )
    assert big == 2_000_000_000 * 500
    # fractional shingle averages round the floor UP
    assert suggested_pair_budget(
        3, 2.5, cores=1, target_seconds=1.0, pairs_per_sec_per_core=1.0
    ) == 8
    # monotone in every resource axis
    base = suggested_pair_budget(10_000, 50.0, cores=8, target_seconds=60)
    assert suggested_pair_budget(10_000, 50.0, cores=16, target_seconds=60) > base
    assert suggested_pair_budget(10_000, 50.0, cores=8, target_seconds=120) > base
    # validation
    for bad in (
        dict(n_docs=-1, avg_shingles=1.0),
        dict(n_docs=1, avg_shingles=-0.5),
        dict(n_docs=1, avg_shingles=1.0, cores=0),
        dict(n_docs=1, avg_shingles=1.0, target_seconds=0),
        dict(n_docs=1, avg_shingles=1.0, pairs_per_sec_per_core=0),
    ):
        with pytest.raises(ValueError):
            suggested_pair_budget(**bad)
