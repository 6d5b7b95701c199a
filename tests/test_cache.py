"""Tracked-persist hygiene: operators register their internal persists;
release_tracked frees every one (bench/check_oracle call it per query)."""

from pyspark.sql import functions as F

from aos_spark.cache import persist_tracked, release_tracked
from aos_spark.llm import dedup as D


def test_release_tracked_unpersists(spark):
    release_tracked()  # drain anything registered by earlier tests
    df = persist_tracked(spark.range(10).withColumn("x", F.col("id") * 2))
    df.count()
    assert df.storageLevel.useMemory
    assert release_tracked() == 1
    assert not df.storageLevel.useMemory


def test_operators_register_persists(spark):
    # minhash_lsh_pairs persists its shingle and band-key frames by design
    # (each feeds 2+ consumers). ngram_jaccard_pairs, the previous subject,
    # no longer persists: its df-cap path became a single-exchange grouped
    # expansion (r15), so its zero registered persists is the correct state.
    release_tracked()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"],
    )
    D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert release_tracked() >= 1
