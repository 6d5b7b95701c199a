"""Child Cyclone Index — SURVEY.md §2.5 W3/W4.

Reference: ~120 lines of per-threshold frame differencing at
impact_analysis.py:2617-2740 — for sorted thresholds w1<…<wk per tile,
band_i = X_i − X_{i+1} (last band undifferenced), then
CCI = Σ_w band_w · w² · 1e-6 (CCI_WEIGHT_MULTIPLIER at
impact_analysis.py:184). Re-expressed in long form as ONE window lead +
ONE weighted aggregation — no pivoting frames, no Python loop, scales as
a single shuffle keyed by tile.

Telescoping invariant (FIXTURES.md §8.4): with nested envelopes,
Σ_w band_w = X(p_{w_min}>0), i.e. bands partition the lowest-threshold
exposure into severity slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CCI_WEIGHT_MULTIPLIER = 1e-6


def exceedance_bands(
    long_df: DataFrame,
    id_cols: list[str],
    threshold_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Difference each value column against the next-higher threshold within
    the id group (W3). Input is LONG form: one row per (id, threshold).
    The highest threshold's band is the value itself (lead default 0 —
    but NULL values stay NULL: no-data must not fabricate a 0 band)."""
    w = Window.partitionBy(*id_cols).orderBy(F.col(threshold_col).asc())
    out = long_df
    # "no next ROW" (highest threshold → subtract 0) is not "next row's
    # VALUE is no-data" (band unknowable → NULL): coalescing the lead
    # blindly fabricated an inflated low band from a NULL higher band and
    # broke the telescoping invariant Σbands = X(lowest) (r9 review) —
    # the lead of a constant distinguishes the two cases
    has_next = F.lead(F.lit(1), 1).over(w)
    for c in value_cols:
        nxt = F.lead(c, 1).over(w)
        out = out.withColumn(
            f"band_{c}",
            F.when(
                F.col(c).isNull() | (has_next.isNotNull() & nxt.isNull()),
                F.lit(None).cast("double"),
            ).otherwise(F.col(c) - F.coalesce(nxt, F.lit(0.0))),
        )
    return out


def cci_weighted_sum(
    banded: DataFrame,
    id_cols: list[str],
    threshold_col: str,
    band_cols: list[str],
    weight_multiplier: float = CCI_WEIGHT_MULTIPLIER,
) -> DataFrame:
    """CCI per id: Σ over thresholds of band · threshold² · multiplier (W4)."""
    w2 = F.pow(F.col(threshold_col).cast("double"), F.lit(2.0)) * F.lit(weight_multiplier)
    aggs = [F.sum(F.col(c) * w2).alias(f"cci_{c.removeprefix('band_')}") for c in band_cols]
    return banded.groupBy(*id_cols).agg(*aggs)


def cci_from_long(
    long_df: DataFrame,
    id_cols: list[str],
    threshold_col: str,
    value_cols: list[str],
    weight_multiplier: float = CCI_WEIGHT_MULTIPLIER,
) -> DataFrame:
    """Full CCI: long (id, threshold, values…) → one CCI column per value."""
    banded = exceedance_bands(long_df, id_cols, threshold_col, value_cols)
    return cci_weighted_sum(
        banded, id_cols, threshold_col, [f"band_{c}" for c in value_cols], weight_multiplier
    )
