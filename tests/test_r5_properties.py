"""Property tests for the round-5 operators: span-dedup accounting
invariants against a naive Python reference, and bloom-filter
no-false-negative / semi-join-equivalence on randomized key sets."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aos_spark.llm.dedup import span_dedup_retention
from aos_spark.ops.bloom import bloom_build, bloom_might_contain, bloom_semijoin

_WORDS = ["alpha", "beta", "gamma", "delta", "w1", "w2", "w3"]

_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=50),
    min_size=1,
    max_size=8,
)


def _spark():
    from aos_spark.session import get_spark

    return get_spark("aos-tests", master="local[4]", shuffle_partitions=4)


def _naive_span_dedup(token_lists, span):
    """Reference implementation: global first-occurrence keeper by
    (doc_id, span_idx) over normalized-token spans."""
    seen = {}
    rows = {}
    for doc_id, toks in enumerate(token_lists):
        if not toks:
            continue
        n = len(toks)
        spans = [toks[i : i + span] for i in range(0, n, span)]
        rows[doc_id] = {"n_tokens": n, "n_spans": len(spans), "kept": []}
        for idx, sp in enumerate(spans):
            key = " ".join(sp)
            if key not in seen:
                seen[key] = (doc_id, idx)
            rows[doc_id]["kept"].append(seen[key] == (doc_id, idx))
    return rows


@settings(max_examples=10, deadline=None)
@given(docs=_docs, span=st.sampled_from([3, 5, 20]))
def test_span_dedup_matches_naive_reference(docs, span):
    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in span_dedup_retention(df, span=span).collect()
    }
    ref = _naive_span_dedup(docs, span)
    assert set(got) == set(ref)
    for doc_id, r in ref.items():
        g = got[doc_id]
        assert g["n_tokens"] == r["n_tokens"]
        assert g["n_spans"] == r["n_spans"]
        assert g["n_kept"] == sum(r["kept"])
        kept_tokens = sum(
            min(span, r["n_tokens"] - i * span)
            for i, k in enumerate(r["kept"])
            if k
        )
        assert g["kept_tokens"] == kept_tokens
        assert 0.0 <= g["retained_frac"] <= 1.0


_keysets = st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=60)


@settings(max_examples=8, deadline=None)
@given(members=_keysets, probes=_keysets)
def test_bloom_property_no_false_negatives_and_exact_semijoin(members, probes):
    spark = _spark()
    build = spark.createDataFrame(
        [(k,) for k in members] or [(None,)], "bk long"
    )
    bits = bloom_build(build, "bk", m_bits=1 << 10, n_hashes=3)
    fact = spark.createDataFrame(
        [(k,) for k in probes] or [(None,)], "fk long"
    )
    hits = {
        r["fk"]
        for r in fact.filter(
            bloom_might_contain(F.col("fk"), bits, n_hashes=3)
        ).collect()
    }
    # no false negatives: every probe that IS a member must survive
    assert set(probes) & set(members) <= hits
    # exact tier-dispatched semi-join equals the plain semi-join
    got = sorted(
        r["fk"]
        for r in bloom_semijoin(
            fact, "fk", build, "bk", m_bits=1 << 10, n_hashes=3
        ).collect()
    )
    expected = sorted(k for k in probes if k in set(members))
    assert got == expected
