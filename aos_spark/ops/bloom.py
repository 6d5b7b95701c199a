"""Bloom-filter semi-join pruning.

The canonical 100 TB pattern for "fact rows whose key appears in a big
build side": aggregate the build side's keys into a compact bitset
(m bits as m/64 longs), ship the bitset to every scan task as a literal
array, and drop non-matching fact rows inside the scan's codegen'd
filter — BEFORE the shuffle that the exact semi-join needs. A Bloom
filter has no false negatives, so an exact (shuffle or broadcast)
semi-join over the ~p·N surviving rows restores exact semantics; the
filter only decides how much data the shuffle sees.

This mirrors Spark's own runtime bloom pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but as an explicit
operator the caller controls: sizing (m, k), the hash family, and where
the probe lands in the plan. The build-side aggregate produces at most
m/64 rows regardless of input size — one shuffle of O(m) bytes — and
the driver-side collect is of that bounded bitset, never of data rows
(same discipline as the envelope-dim collect in geo/sjoin.py).

Reference parity: the reference engine has no bloom operator; this is a
builder-brief (LLM/warehouse-tier) addition. False-positive rate for
sizing: p ≈ (1 - e^{-k·n/m})^k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` bit positions for a key — double hashing (Kirsch &
    Mitzenmacher 2006): pos_i = (h1 + i*h2) mod m from two xxhash64 seeds,
    as good as k independent hashes. Internal to Spark only — the bitset
    never crosses engines, so no oracle-reproducible hash is needed."""
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(key, F.lit(0x9E3779B9))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, n_hashes: int = 4
) -> list[int]:
    """Aggregate ``df[key_col]`` into a Bloom bitset, returned as a Python
    list of ``m_bits/64`` longs (the driver-side literal the probe inlines).

    Plan shape: explode keys to (word, bit) pairs -> partial bit_or per
    partition -> one O(m)-byte shuffle -> final bit_or. The collect is of
    <= m/64 aggregated rows, never data rows."""
    assert m_bits % 64 == 0
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, n_hashes)))
    words = (
        # NULL keys can never match an equi-semi-join, so they are not
        # members; dropping them also keeps word_idx non-null below.
        df.filter(F.col(key_col).isNotNull())
        .select(pos.alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitset = [0] * (m_bits // 64)
    for r in words:
        bitset[r["word_idx"]] = r["bits"]
    return bitset


def bloom_might_contain(
    key: Column, bitset: list[int], n_hashes: int = 4
) -> Column:
    """Membership predicate against a driver-built bitset, evaluated as a
    pure codegen'd projection (array-literal lookup + bitwise AND) — no
    join, no shuffle; lands in the scan filter so Parquet row groups whose
    keys all miss are dropped before any exchange."""
    m_bits = len(bitset) * 64
    lit_words = F.array(*[F.lit(w) for w in bitset])
    # 64 single-bit masks as a literal lookup table (PySpark's shiftleft
    # only takes a literal shift count); bit 63 is the long sign bit.
    lit_masks = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)) for b in range(64)]
    )
    checks = []
    for p in _positions(key, m_bits, n_hashes):
        word = F.element_at(lit_words, (F.shiftright(p, 6) + 1).cast("int"))
        mask = F.element_at(lit_masks, (F.pmod(p, F.lit(64)) + 1).cast("int"))
        checks.append(word.bitwiseAND(mask) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semijoin(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter: probe the bitset in the
    fact scan (no false negatives -> no lost rows), then exact-verify the
    survivors with a real LEFT SEMI join. Result is bit-identical to the
    plain semi-join; the bloom stage exists to shrink the exchange feeding
    it by ~(1-p) of the non-matching rows."""
    pruned = fact.filter(
        bloom_might_contain(F.col(fact_key), bloom_build(build, build_key, m_bits, n_hashes), n_hashes)
    )
    return pruned.join(
        build.select(F.col(build_key).alias(fact_key)).dropDuplicates([fact_key]),
        on=fact_key,
        how="left_semi",
    )
