"""Golden fixtures for the CCI window formulation (W3/W4) — FIXTURES.md §8.4:
with nested envelopes the bands telescope: Σ_w band_w = X at the lowest
threshold, and CCI = Σ band_w · w² · 1e-6.
"""

import math

from aos_spark.ops import cci


def make_long(spark):
    # one tile, nested thresholds 34 < 50 < 64: exposure decreasing
    rows = [
        ("t1", 34, 100.0),
        ("t1", 50, 60.0),
        ("t1", 64, 10.0),
        # tile with no-data exposure at one threshold
        ("t2", 34, None),
        ("t2", 50, 20.0),
    ]
    return spark.createDataFrame(rows, "tile_id string, wind_threshold int, exposure double")


def test_bands_telescope(spark):
    banded = cci.exceedance_bands(make_long(spark), ["tile_id"], "wind_threshold", ["exposure"])
    rows = {(r["tile_id"], r["wind_threshold"]): r["band_exposure"] for r in banded.collect()}
    assert rows[("t1", 34)] == 40.0  # 100 - 60
    assert rows[("t1", 50)] == 50.0  # 60 - 10
    assert rows[("t1", 64)] == 10.0  # last band undifferenced
    # telescoping: sum of bands == lowest-threshold exposure
    assert rows[("t1", 34)] + rows[("t1", 50)] + rows[("t1", 64)] == 100.0
    assert rows[("t2", 34)] is None  # NULL exposure → NULL band, not fabricated 0


def test_cci_weighted_sum(spark):
    out = cci.cci_from_long(make_long(spark), ["tile_id"], "wind_threshold", ["exposure"])
    rows = {r["tile_id"]: r["cci_exposure"] for r in out.collect()}
    expected_t1 = (40.0 * 34**2 + 50.0 * 50**2 + 10.0 * 64**2) * 1e-6
    assert math.isclose(rows["t1"], expected_t1, rel_tol=1e-12)
    # t2: null band at 34 skipped by sum; 20*50² at 50
    assert math.isclose(rows["t2"], 20.0 * 2500 * 1e-6, rel_tol=1e-12)


def test_exceedance_band_null_next_value_does_not_fabricate(spark):
    """r9 review: a NULL value at the next-higher threshold was coalesced
    to 0, fabricating an inflated low band and breaking the telescoping
    invariant; highest-threshold rows still subtract 0."""
    from aos_spark.ops.cci import exceedance_bands

    df = spark.createDataFrame(
        [(1, 30, 100.0), (1, 40, None), (1, 50, 20.0)],
        "zone long, th int, exposure double",
    )
    out = {r["th"]: r["band_exposure"]
           for r in exceedance_bands(df, ["zone"], "th", ["exposure"]).collect()}
    assert out[30] is None      # next value is no-data -> band unknowable
    assert out[40] is None      # own value is no-data
    assert out[50] == 20.0      # highest threshold: subtract 0 as before
