"""Bloom-filter semi-join pruning.

The canonical 100 TB pattern for "fact rows whose key appears in a big
build side": aggregate the build side's keys into a compact bitset
(m bits as m/64 longs) and drop non-matching fact rows BEFORE the
shuffle that the exact semi-join needs. A Bloom filter has no false
negatives, so an exact (shuffle or broadcast) semi-join over the ~p·N
surviving rows restores exact semantics; the filter only decides how
much data the shuffle sees.

Two probe tiers, because a measured literal-array probe does NOT
constant-fold — its per-row cost grows with m (20M-row probe: 2.0 s at
m=2^16, 4.7 s at 2^19, 37 s at 2^22):

- **literal** (``bloom_might_contain``): the bitset inlines into the
  plan as an array literal, so the predicate can land inside the scan's
  codegen'd filter. Right for small bitsets (≤ ~2^17 bits).
- **broadcast join** (``bloom_probe_join``): the word table stays a
  DataFrame — no driver collect at all — and each of the k probes is a
  broadcast-hash-join lookup with a progressive filter, so most
  non-members die on the first bit and m is bounded only by the
  broadcast limit (GBs). 20M-row probe at m=2^22: ~5 s.

``bloom_semijoin`` picks the tier from m. This mirrors Spark's own
runtime bloom pushdown (``spark.sql.optimizer.runtime.bloomFilter.
enabled``), but as an explicit operator the caller controls: sizing
(m, k), the hash family, and where the probe lands in the plan. The
build-side aggregate produces at most m/64 rows regardless of input
size — one shuffle of O(m) bytes; the literal tier's collect is of that
bounded bitset, never of data rows (same discipline as the
envelope-dim collect in geo/sjoin.py).

Reference parity: the reference engine has no bloom operator; this is a
builder-brief (LLM/warehouse-tier) addition. False-positive rate for
sizing: p ≈ (1 - e^{-k·n/m})^k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# past this, the literal-array probe's per-row cost dominates (see module
# docstring measurements) and the broadcast-join tier takes over
LITERAL_MAX_BITS = 1 << 17

# 64 single-bit masks as a literal lookup table (PySpark's shiftleft only
# takes a literal shift count); bit 63 is the long sign bit
_BIT_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` bit positions for a key — double hashing (Kirsch &
    Mitzenmacher 2006): pos_i = (h1 + i*h2) mod m from two xxhash64 seeds,
    as good as k independent hashes. Internal to Spark only — the bitset
    never crosses engines, so no oracle-reproducible hash is needed.

    ANSI-safe: both hashes are pmod-reduced to [0, m) BEFORE the i*h2
    multiply, so every intermediate stays below k*m (<= 2^25 for any
    sane sizing) and the arithmetic never overflows a long — required
    because the driver runs with spark.sql.ansi.enabled=true, where a
    long overflow raises ARITHMETIC_OVERFLOW instead of wrapping.
    Reducing mod m before the add/multiply preserves double-hashing
    semantics mod m exactly."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("long")
        for i in range(n_hashes)
    ]


def _mask(pos: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(m) for m in _BIT_MASKS]),
        (F.pmod(pos, F.lit(64)) + 1).cast("int"),
    )


def bloom_words(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, n_hashes: int = 4
) -> DataFrame:
    """Aggregate ``df[key_col]`` into the Bloom word frame
    (word_idx, bits) — at most m/64 rows regardless of input size.

    Plan shape: explode keys to (word, bit) pairs -> partial bit_or per
    partition -> one O(m)-byte shuffle -> final bit_or. Stays a DataFrame
    so the join-tier probe never collects anything to the driver."""
    assert m_bits % 64 == 0
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, n_hashes)))
    return (
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
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, n_hashes: int = 4
) -> list[int]:
    """Collect the word frame into a Python list of ``m_bits/64`` longs —
    the driver-side literal the small-m probe inlines. The collect is of
    <= m/64 aggregated rows, never data rows."""
    bitset = [0] * (m_bits // 64)
    for r in bloom_words(df, key_col, m_bits, n_hashes).collect():
        bitset[r["word_idx"]] = r["bits"]
    return bitset


def bloom_might_contain(
    key: Column, bitset: list[int], n_hashes: int = 4
) -> Column:
    """Membership predicate against a driver-built bitset (literal tier):
    array-literal lookup + bitwise AND, no join, no shuffle; lands in the
    scan filter so Parquet row groups whose keys all miss are dropped
    before any exchange. Use only for small bitsets — the array literal
    does not constant-fold, so per-row cost grows with m (measurements in
    the module docstring); ``bloom_probe_join`` is the large-m tier."""
    m_bits = len(bitset) * 64
    lit_words = F.array(*[F.lit(w) for w in bitset])
    checks = []
    for p in _positions(key, m_bits, n_hashes):
        word = F.element_at(lit_words, (F.shiftright(p, 6) + 1).cast("int"))
        checks.append(word.bitwiseAND(_mask(p)) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_probe_join(
    fact: DataFrame,
    fact_key: str,
    words: DataFrame,
    m_bits: int,
    n_hashes: int = 4,
) -> DataFrame:
    """Large-m probe tier: k chained BROADCAST left joins against the
    (word_idx, bits) frame, each followed by its bit filter. No fact
    shuffle (every join is a map-side hash probe), no driver collect,
    and the filters are progressive — a non-member usually dies on the
    first probe, so later joins see ~p^(i/k)·N rows. m is bounded only
    by the broadcast limit, not by plan-literal size."""
    out = fact
    for i, p in enumerate(_positions(F.col(fact_key), m_bits, n_hashes)):
        w = words.select(
            F.col("word_idx").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = (
            out.withColumn(f"__w{i}", F.shiftright(p, 6))
            .withColumn(f"__m{i}", _mask(p))
            .join(F.broadcast(w), f"__w{i}", "left")
            .filter(
                F.col(f"__b{i}").isNotNull()
                & (F.col(f"__b{i}").bitwiseAND(F.col(f"__m{i}")) != F.lit(0))
            )
            .drop(f"__w{i}", f"__b{i}", f"__m{i}")
        )
    return out


def bloom_semijoin(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter: probe the bitset over the
    fact side (no false negatives -> no lost rows), then exact-verify the
    survivors with a real LEFT SEMI join. Result is bit-identical to the
    plain semi-join; the bloom stage exists to shrink the exchange feeding
    it by ~(1-p) of the non-matching rows. Probe tier is picked from m:
    literal scan-filter up to LITERAL_MAX_BITS, broadcast-join beyond."""
    if m_bits <= LITERAL_MAX_BITS:
        pruned = fact.filter(
            bloom_might_contain(
                F.col(fact_key), bloom_build(build, build_key, m_bits, n_hashes), n_hashes
            )
        )
    else:
        pruned = bloom_probe_join(
            fact, fact_key, bloom_words(build, build_key, m_bits, n_hashes), m_bits, n_hashes
        )
    return pruned.join(
        build.select(F.col(build_key).alias(fact_key)).dropDuplicates([fact_key]),
        on=fact_key,
        how="left_semi",
    )
