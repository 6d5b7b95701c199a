"""Tests for deterministic sampling/splitting (llm/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aos_spark.llm import sampling


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("stratum")
    )


def test_split_stable_under_repartition(spark, docs):
    a = sampling.deterministic_split(docs, "doc_id").select("doc_id", "split")
    b = sampling.deterministic_split(docs.repartition(13), "doc_id").select(
        "doc_id", "split"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_weights_roughly_hold(spark, docs):
    counts = {
        r["split"]: r["n"]
        for r in sampling.deterministic_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 700  # 80% of 1000, loose tolerance
    assert counts["val"] + counts["test"] < 300


def test_split_weights_validated(docs):
    with pytest.raises(ValueError, match="sum to 100"):
        sampling.deterministic_split(docs, "doc_id", splits=(("a", 50), ("b", 40)))


def test_fraction_sample_deterministic_and_sized(spark, docs):
    s1 = sampling.fraction_sample(docs, 0.2)
    s2 = sampling.fraction_sample(docs, 0.2)
    assert s1.exceptAll(s2).count() == 0
    n = s1.count()
    assert 140 <= n <= 260  # ~200 of 1000

    # different salt -> different (deterministic) subset
    s3 = sampling.fraction_sample(docs, 0.2, salt="other")
    assert s3.select("doc_id").exceptAll(s1.select("doc_id")).count() > 0


def test_stratified_exact_n(spark, docs):
    out = sampling.stratified_exact_n(docs, ["stratum"], n=5)
    per = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {i: 5 for i in range(7)}
    # small stratum is returned whole
    small = docs.filter(F.col("doc_id") < 3)
    assert sampling.stratified_exact_n(small, ["stratum"], n=5).count() == 3


def test_apply_mixture_extreme_rates(spark):
    from aos_spark.llm.sampling import apply_mixture, mixture_plan

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", "some words here") for i in range(40)],
        ["doc_id", "lang", "text"],
    )
    # target 'en' only: fr gets rate 0 (absent from targets), en rate 1
    plan = mixture_plan(df, {"en": 1.0}, domain_col="lang")
    kept = apply_mixture(df, plan, domain_col="lang").collect()
    assert {r["lang"] for r in kept} == {"en"}
    assert len(kept) == 20  # rate 1.0 keeps every en doc


def test_apply_mixture_is_deterministic(spark):
    from aos_spark.llm.sampling import apply_mixture, mixture_plan

    df = spark.createDataFrame(
        [(i, "en" if i % 4 else "fr", "w " * (i % 7 + 1)) for i in range(200)],
        ["doc_id", "lang", "text"],
    )
    plan = mixture_plan(df, {"en": 0.3, "fr": 0.7}, domain_col="lang")
    a = sorted(r["doc_id"] for r in apply_mixture(df, plan).collect())
    b = sorted(r["doc_id"] for r in apply_mixture(df.repartition(7), plan).collect())
    assert a == b and 0 < len(a) < 200
