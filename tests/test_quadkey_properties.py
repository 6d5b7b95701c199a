"""Property-based tests (hypothesis) for the quadkey tier — the exactness
of the J1 cover equi-join rests on these invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aos_spark.geo.quadkey import (
    expand_cover,
    point_to_quadkey,
    polygon_cover,
    quadkey_to_bbox,
    quadkey_to_tile_xy,
    tile_xy_to_quadkey,
)

lats = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
lons = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
zooms = st.integers(min_value=1, max_value=18)


@given(lats, lons, zooms)
@settings(max_examples=200, deadline=None)
def test_point_quadkey_bbox_roundtrip(lat, lon, zoom):
    qk = point_to_quadkey(lat, lon, zoom)
    assert len(qk) == zoom
    w, s, e, n = quadkey_to_bbox(qk)
    # the generating point lies inside (or on the edge of) its tile's bbox
    assert w - 1e-9 <= lon <= e + 1e-9
    assert s - 1e-9 <= lat <= n + 1e-9


@given(zooms, st.data())
@settings(max_examples=100, deadline=None)
def test_tile_xy_quadkey_roundtrip(zoom, data):
    n = 1 << zoom
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    qk = tile_xy_to_quadkey(x, y, zoom)
    assert quadkey_to_tile_xy(qk) == (x, y, zoom)


@given(
    st.floats(min_value=-60.0, max_value=55.0, allow_nan=False),
    st.floats(min_value=-170.0, max_value=165.0, allow_nan=False),
    st.floats(min_value=0.5, max_value=5.0, allow_nan=False),
    st.floats(min_value=0.5, max_value=5.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_rect_cover_matches_point_membership(s, w, dw, dh):
    """For a random rectangle, the zoom-7 cover's leaf set must contain the
    tile of every interior sample point, and full-flagged leaves must lie
    inside the rectangle."""
    e, n = w + dw, s + dh
    ring = [(w, s), (e, s), (e, n), (w, n), (w, s)]
    cover = polygon_cover([ring], zoom=7)
    leaves = set(expand_cover(cover, 7))
    # interior grid samples → their tiles are in the cover
    for fx in (0.25, 0.5, 0.75):
        for fy in (0.25, 0.5, 0.75):
            lon = w + fx * dw
            lat = s + fy * dh
            assert point_to_quadkey(lat, lon, 7) in leaves
    # full tiles are genuinely inside
    for qk, full in cover:
        if full:
            tw, ts_, te, tn = quadkey_to_bbox(qk)
            assert tw >= w - 1e-9 and te <= e + 1e-9
            assert ts_ >= s - 1e-9 and tn <= n + 1e-9
