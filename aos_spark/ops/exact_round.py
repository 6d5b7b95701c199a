"""Engine-exact ROUND(num/den, 6) for non-negative integer-valued
rationals — the idiom that retires the round-9 hazard class.

Emitting ``ROUND(CAST(num AS DOUBLE) / den, 6)`` as an output column is
cross-engine knife-edge unsafe: both engines see the same quotient
double, but Spark's ROUND correctly rounds its shortest decimal
representation half-up (BigDecimal) while DuckDB scales by 10^6 in
double space first — a double rounding. Whenever the EXACT rational
num/den sits on a .5 micro-boundary (reachable for any denominator of
the form 2^a·5^b·k — e.g. n_union = 128 with odd n_inter), the two
engines are a coin flip apart. Measured divergence base rates on
identical doubles: ~1.2% for half-boundary values, ~0.03% for random
small-denominator quotients, 0 for uniform doubles (round 9, 3000-value
samples; the order_autocorrelation incident was the decimal-cast twin
of this — see tests/test_stats_cross_engine.py and MISMATCH_LOG.jsonl).

These helpers compute round-half-up(num·10^6 / den) entirely in integer
space — ``floor((2·num·10^6 + den) / (2·den))`` via integral division,
which truncates toward zero identically in Spark (``div``) and DuckDB
(``//`` after HUGEINT cast) for non-negative operands — then scale back
with ONE exact double division by 10^6. Every step is a fixed function
of exact integers, so the result is bit-identical on any engine and any
partitioning, and the semantics are BETTER-defined than the double
path: it rounds the true rational, not its double approximation.

Contract: num ≥ 0, den > 0, both integer-valued (BIGINT/DECIMAL(x,0)).
DECIMAL(38,0) intermediates keep the Spark side overflow-free up to
num ≈ 10^31 — no int64 bound at 100 TB aggregates. The DuckDB side uses
HUGEINT (int128, the same headroom).

For means over DECIMAL(18,6) values, pre-scale the numerator yourself:
``sql_round_ratio6(f"CAST(SUM(x_dec) * 1000000 AS DECIMAL(38,0))", "COUNT(*)",
pre_scaled=True)`` — the numerator is then already in micro-units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spark_frag(num: str, den: str, pre_scaled: bool) -> str:
    scale = "" if pre_scaled else " * 1000000"
    n38 = f"CAST({num} AS DECIMAL(38,0))"
    d38 = f"CAST({den} AS DECIMAL(38,0))"
    return (
        f"CAST(({n38}{scale} * 2 + {d38}) div ({d38} * 2) AS DOUBLE)"
        f" / 1000000.0"
    )


def sql_round_ratio6(num: str, den: str, pre_scaled: bool = False) -> str:
    """Spark-SQL fragment for engine-exact ROUND(num/den, 6) (or
    ROUND(num/(den·10^6), 6) when ``pre_scaled``), num ≥ 0, den > 0."""
    return _spark_frag(num, den, pre_scaled)


def duck_round_ratio6(num: str, den: str, pre_scaled: bool = False) -> str:
    """DuckDB fragment computing the identical value: HUGEINT integral
    division (``//`` truncates toward zero for non-negative operands,
    matching Spark's ``div``)."""
    scale = "" if pre_scaled else " * 1000000"
    nh = f"CAST({num} AS HUGEINT)"
    dh = f"CAST({den} AS HUGEINT)"
    return f"CAST(({nh}{scale} * 2 + {dh}) // ({dh} * 2) AS DOUBLE) / 1000000.0"


def sql_scaled_round6(x: str) -> str:
    """Engine-exact ROUND(x, 6) for a double ``x`` that is BIT-IDENTICAL
    in both engines (same parquet inputs, same IEEE op sequence): scale
    in double space FIRST, then round to an integer. Rounding a double
    to an INTEGER is exact in both engines (Spark's BigDecimal-of-
    shortest-repr HALF_UP and DuckDB's half-away-from-zero agree on
    every double, ties included, because x.5 integers are exactly
    representable), so the only rounding step is shared — unlike
    ROUND(x, 6), where Spark rounds the shortest decimal repr of x while
    DuckDB rounds x·10^6 computed in double space (a double rounding),
    and the two diverge on micro-grid .5 boundaries. Identical SQL text
    in both dialects; measured zero divergence on 11,000 adversarial
    shared doubles incl. exact half-boundary rationals (round 9).

    Semantics note: this rounds the DOUBLE x·10^6, not the underlying
    exact rational — use the integral-division helpers above when num
    and den are available as exact integers (stronger contract).
    Caveat: |x| must stay below 2^52/10^6 ≈ 4.5e9 (scaled value must be
    in the exact-integer double range) — true for every ratio/score/
    probability output."""
    return sql_scaled_round(x, 6)


def sql_scaled_round(x: str, scale: int) -> str:
    """:func:`sql_scaled_round6` at an arbitrary decimal scale."""
    p = float(10 ** scale)
    return f"ROUND(({x}) * {p!r}, 0) / {p!r}"


def scaled_round6(x: Column) -> Column:
    """Column form of :func:`sql_scaled_round6`."""
    return scaled_round(x, 6)


def scaled_round(x: Column, scale: int) -> Column:
    """Column form of :func:`sql_scaled_round`."""
    p = float(10 ** scale)
    return F.round(x * F.lit(p), 0) / F.lit(p)


def round_ratio6_micro(num_micro: Column, den: Column) -> Column:
    """Column form for pre-scaled numerators: engine-exact
    ROUND(num_micro / (den·10^6), 6) where ``num_micro`` is already in
    micro-units (e.g. SUM of a DECIMAL(x,6) column times 10^6 — an exact
    integer). Used for means over exact scale-6 values."""
    a = num_micro.cast("decimal(38,0)") * 2 + den.cast("decimal(38,0)")
    b = den.cast("decimal(38,0)") * 2
    q = (a - (a % b)) / b
    return q.cast("double") / F.lit(1_000_000.0)


def round_micro_cents(num_micro: Column) -> Column:
    """Engine-exact ROUND(v, 2) -> double for a money total v supplied
    in exact MICRO-units (num_micro = v·10^6, an integer-valued decimal,
    v >= 0): half-up integer division to cents — floor((2m + 10^4) /
    (2·10^4)), the same integral-division idiom as the ratio helpers —
    then ONE exact double division by 100.

    Why not publish the scale-6 decimal total directly as double: by
    sf0.1 those totals pass 16 significant digits, and DuckDB's
    decimal->double cast double-rounds (int128 -> double, then /10^6) —
    measured 1 ulp off Spark's correctly-rounded cast at sf1
    (BENCH_SF1_DIAG r12, q1 investigation). And not via a decimal(x,2)
    CAST on both sides: the engines disagree on sub-cent residue (Spark
    rounds HALF_UP, DuckDB's decimal downcast TRUNCATES — 1.015 -> 1.01),
    which scale-4 money products hit routinely. The cents integer is < 2^53 for totals below ~9e13,
    so its double conversion is exact and the /100 is the only (shared,
    correctly-rounded) rounding step. DuckDB mirror:
    ``CAST((m*2 + 10000) // 20000 AS DOUBLE) / 100.0`` over a HUGEINT
    micro sum."""
    a = num_micro.cast("decimal(38,0)") * 2 + F.lit(10_000).cast(
        "decimal(38,0)"
    )
    b = F.lit(20_000).cast("decimal(38,0)")
    q = (a - (a % b)) / b
    return q.cast("double") / F.lit(100.0)


def round_ratio6_micro_signed(num_micro: Column, den: Column) -> Column:
    """Signed variant of :func:`round_ratio6_micro` (den > 0 still):
    every idiom above requires num >= 0 — Spark's decimal ``%`` keeps the
    dividend's sign, so feeding a negative numerator truncates toward
    zero instead of rounding half-up and every negative mean comes out
    one micro-unit high (r9 review, ops/incremental.finalize). Both
    engines' ROUND round halves AWAY from zero, so the signed value is
    the unsigned idiom on |num| with the sign restored."""
    mag = round_ratio6_micro(F.abs(num_micro), den)
    return F.when(num_micro < 0, -mag).otherwise(mag)


def round_ratio6(num: Column, den: Column) -> Column:
    """Column form of :func:`sql_round_ratio6` for DataFrame-side call
    sites (e.g. the jaccard in llm/dedup). Uses the same decimal `div`
    plan — `F.expr` is avoided by the remainder identity:
    floor(a/b) = (a - a % b) / b, exact on decimals, with the final
    division exactly divisible so no decimal-division rounding applies."""
    a = (num.cast("decimal(38,0)") * 2_000_000 + den.cast("decimal(38,0)"))
    b = den.cast("decimal(38,0)") * 2
    q = (a - (a % b)) / b
    # q is an exactly-representable integer; decimal->double is exact for
    # |q| < 2^53 (ratio outputs are <= 1e6+1; mean outputs are bounded by
    # the value domain, not the data size)
    return q.cast("double") / F.lit(1_000_000.0)
