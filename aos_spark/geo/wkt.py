"""Dependency-free planar geometry kernel + WKT codec.

Shapely is not available in this environment, and the engine's geometry
needs are narrow (the hot join is quadkey-reduced, see geo/quadkey.py):
point-in-polygon, rect/polygon relation for quadtree descent, polygon-rect
clip area for the admin area-fallback (reference impact_analysis.py:1034-1047),
segment intersection for landfall (reference reports.py:283-293), and
haversine distance for the 1,500-km country pre-filter (reference
snowflake_utils.py:590-616). All functions operate on plain tuples/lists so
they vectorize cleanly inside Arrow-batched pandas UDFs.

Geometries are represented as:
  point      (lon, lat)
  ring       [(lon, lat), ...]  (closed or open; closure implied)
  polygon    [ring, ...]        (ring 0 = shell, rest = holes)
  multipolygon [polygon, ...]
"""

from __future__ import annotations

import math
import re

EARTH_RADIUS_M = 6_371_008.8

# ---------------------------------------------------------------- WKT codec


def _parse_ring(txt: str) -> list[tuple[float, float]]:
    pts = []
    for pair in txt.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return pts


def _split_top_level(txt: str) -> list[str]:
    """Split on commas at paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(txt):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(txt[start:i])
            start = i + 1
    parts.append(txt[start:])
    return parts


def _strip_outer(txt: str) -> str:
    txt = txt.strip()
    assert txt.startswith("(") and txt.endswith(")"), f"bad WKT fragment: {txt[:40]}"
    return txt[1:-1]


def parse_wkt(wkt: str):
    """Parse WKT → (kind, coords).

    kind ∈ {'POINT','LINESTRING','POLYGON','MULTIPOLYGON'};
    POLYGON → list of rings; MULTIPOLYGON → list of polygons.
    Returns None for empty/invalid input (reference drops unparseable rows,
    snowflake_utils.py:452-478).
    """
    if wkt is None:
        return None
    m = re.match(r"\s*(POINT|LINESTRING|POLYGON|MULTIPOLYGON)\s*(.*)", wkt.strip(), re.I)
    if not m:
        return None
    kind = m.group(1).upper()
    body = m.group(2).strip()
    if body.upper() == "EMPTY" or not body:
        return None
    try:
        if kind == "POINT":
            xy = _strip_outer(body).split()
            return kind, (float(xy[0]), float(xy[1]))
        if kind == "LINESTRING":
            return kind, _parse_ring(_strip_outer(body))
        if kind == "POLYGON":
            rings = [_parse_ring(_strip_outer(r)) for r in _split_top_level(_strip_outer(body))]
            return kind, rings
        if kind == "MULTIPOLYGON":
            polys = []
            for poly_txt in _split_top_level(_strip_outer(body)):
                rings = [
                    _parse_ring(_strip_outer(r))
                    for r in _split_top_level(_strip_outer(poly_txt.strip()))
                ]
                polys.append(rings)
            return kind, polys
    except (ValueError, AssertionError, IndexError):
        return None
    return None


def polygons_of(wkt: str) -> list[list[list[tuple[float, float]]]]:
    """Parse WKT and normalize to a list of polygons (each = list of rings)."""
    parsed = parse_wkt(wkt)
    if parsed is None:
        return []
    kind, coords = parsed
    if kind == "POLYGON":
        return [coords]
    if kind == "MULTIPOLYGON":
        return coords
    return []


def polygon_to_wkt(rings) -> str:
    ring_txts = []
    for ring in rings:
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        ring_txts.append("(" + ", ".join(f"{x} {y}" for x, y in pts) + ")")
    return "POLYGON (" + ", ".join(ring_txts) + ")"


# ------------------------------------------------------- predicates/measures


def point_in_ring(x: float, y: float, ring) -> bool:
    """Ray casting; boundary points count as inside (tolerant, matches the
    'intersects' semantics the reference uses for tiles/facilities)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
            elif abs(x - xin) < 1e-12:
                return True
    return inside


def point_in_polygon(x: float, y: float, rings) -> bool:
    if not rings or not point_in_ring(x, y, rings[0]):
        return False
    return all(not point_in_ring(x, y, hole) for hole in rings[1:])


def point_in_any_polygon(x: float, y: float, polys) -> bool:
    return any(point_in_polygon(x, y, p) for p in polys)


def _segments_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-15 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) - 1e-15 <= c[0] <= max(a[0], b[0]) + 1e-15
            and min(a[1], b[1]) - 1e-15 <= c[1] <= max(a[1], b[1]) + 1e-15
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    return o4 == 0 and on_seg(p3, p4, p2)


def segment_intersects_polygon(p1, p2, rings) -> bool:
    """True if segment p1-p2 touches/crosses the polygon (used for landfall
    line-segment fallback, reference reports.py:283-293)."""
    if point_in_polygon(*p1, rings) or point_in_polygon(*p2, rings):
        return True
    for ring in rings:
        n = len(ring)
        for i in range(n):
            if _segments_intersect(p1, p2, ring[i], ring[(i + 1) % n]):
                return True
    return False


def ring_area(ring) -> float:
    """Shoelace area (planar, in coordinate units²); positive regardless of
    winding."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def polygon_area(rings) -> float:
    if not rings:
        return 0.0
    return ring_area(rings[0]) - sum(ring_area(h) for h in rings[1:])


def clip_ring_to_rect(ring, rect):
    """Sutherland–Hodgman clip of a ring by rect=(w, s, e, n)."""
    w, s, e, n = rect

    def clip_edge(pts, inside, intersect):
        out = []
        m = len(pts)
        for i in range(m):
            cur, nxt = pts[i], pts[(i + 1) % m]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def ix_v(x0):
        def f(a, b):
            t = (x0 - a[0]) / (b[0] - a[0])
            return (x0, a[1] + t * (b[1] - a[1]))

        return f

    def ix_h(y0):
        def f(a, b):
            t = (y0 - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), y0)

        return f

    pts = list(ring)
    for inside, ix in (
        (lambda p: p[0] >= w, ix_v(w)),
        (lambda p: p[0] <= e, ix_v(e)),
        (lambda p: p[1] >= s, ix_h(s)),
        (lambda p: p[1] <= n, ix_h(n)),
    ):
        if not pts:
            return []
        pts = clip_edge(pts, inside, ix)
    return pts


def rect_clip_area(rect, rings) -> float:
    """Area of polygon ∩ rect — the admin area-fallback measure
    (reference impact_analysis.py:1034-1047)."""
    area = 0.0
    for i, ring in enumerate(rings):
        clipped = clip_ring_to_rect(ring, rect)
        if len(clipped) >= 3:
            a = ring_area(clipped)
            area += a if i == 0 else -a
    return max(area, 0.0)


def rect_polygon_relation(rect, rings) -> str:
    """Classify rect=(w,s,e,n) vs polygon → 'disjoint' | 'within' | 'intersects'.

    Drives the quadtree descent in quadkey.polygon_cover. 'within' means the
    rect is entirely inside the polygon (accounting for holes).
    """
    w, s, e, n = rect
    corners = [(w, s), (e, s), (e, n), (w, n)]
    corners_in = [point_in_polygon(x, y, rings) for x, y in corners]

    rect_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    for ring in rings:
        m = len(ring)
        for i in range(m):
            a, b = ring[i], ring[(i + 1) % m]
            # cheap bbox reject for the edge
            if max(a[0], b[0]) < w or min(a[0], b[0]) > e:
                continue
            if max(a[1], b[1]) < s or min(a[1], b[1]) > n:
                continue
            for r1, r2 in rect_edges:
                if _segments_intersect(a, b, r1, r2):
                    return "intersects"
            # edge fully inside rect (no crossing) → boundary passes through
            if w <= a[0] <= e and s <= a[1] <= n:
                return "intersects"

    if all(corners_in):
        return "within"
    if any(corners_in):
        return "intersects"
    # no boundary crossing, no corner inside: either disjoint or rect contains polygon
    px, py = rings[0][0]
    if w <= px <= e and s <= py <= n:
        return "intersects"  # polygon entirely inside rect
    return "disjoint"


# ---------------------------------------------------------------- distances


def haversine_m(lat1, lon1, lat2, lon2) -> float:
    """Great-circle distance in meters."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


def _clamp(v, lo, hi):
    return min(max(v, lo), hi)


def bbox_min_gc_distance_m(box1, box2) -> float:
    """EXACT minimum great-circle distance (meters) between two lat/lon
    bboxes, each (lon_min, lon_max, lat_min, lat_max) — the geodesic form of
    the country pre-filter distance (reference ST_DWITHIN on geography,
    snowflake_utils.py:590-616). Being exact, it is trivially safe for a
    conservative keep-if-within-radius pre-filter.

    Derivation: central angle c between (φ1, λ1), (φ2, λ2) has
    cos c = sin φ1 sin φ2 + cos φ1 cos φ2 cos Δλ. cos Δλ is maximized at the
    coordinate-space longitude gap (Δλ ∈ [0°, 180°]); for fixed Δλ the
    maximum of cos c over the latitude intervals is attained at an interval
    endpoint, the equator, or the stationary partner
    φ* = atan2(sin φ_other, cos φ_other · cos Δλ) clamped to the interval —
    a finite candidate set, enumerated exhaustively. The longitude gap takes
    the shorter way around (antimeridian wrap); each box itself is assumed
    normalized to [-180, 180] without crossing the antimeridian (split such
    boxes first).
    """
    x1min, x1max, y1min, y1max = box1
    x2min, x2max, y2min, y2max = box2
    gap_direct = max(x2min - x1max, x1min - x2max, 0.0)
    gap_wrap = max(360.0 - (max(x1max, x2max) - min(x1min, x2min)), 0.0)
    gap_lon = min(gap_direct, gap_wrap)
    gap_lat = max(y2min - y1max, y1min - y2max, 0.0)
    if gap_lon == 0.0:
        # some meridian crosses both boxes → purely meridional gap
        return EARTH_RADIUS_M * math.radians(gap_lat)
    cosdl = math.cos(math.radians(gap_lon))
    lo1, hi1 = math.radians(y1min), math.radians(y1max)
    lo2, hi2 = math.radians(y2min), math.radians(y2max)
    cands1 = {lo1, hi1} | ({0.0} if lo1 <= 0.0 <= hi1 else set())
    cands2 = {lo2, hi2} | ({0.0} if lo2 <= 0.0 <= hi2 else set())
    for p1 in list(cands1):
        cands2.add(_clamp(math.atan2(math.sin(p1), math.cos(p1) * cosdl), lo2, hi2))
    for p2 in list(cands2):
        cands1.add(_clamp(math.atan2(math.sin(p2), math.cos(p2) * cosdl), lo1, hi1))
    best = -2.0
    for p1 in cands1:
        for p2 in cands2:
            g = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * cosdl
            if g > best:
                best = g
    return EARTH_RADIUS_M * math.acos(_clamp(best, -1.0, 1.0))


def _edge_samples(ring):
    """Vertices + midpoints of every ring edge — the sampling grid the
    distance approximations share."""
    m = len(ring)
    for i in range(m):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % m]
        yield x1, y1
        yield (x1 + x2) / 2.0, (y1 + y2) / 2.0


def polygon_set_distance_m(polys_a, polys_b) -> float:
    """Approximate geodesic min distance (meters) between two polygon
    SETS (multipolygons), 0 when they touch or overlap — the exact-verify
    kernel behind the ST_DWITHIN-parity pre-filter (reference
    snowflake_utils.py:597-609 runs true geography ST_DWITHIN; the bbox
    tier alone over-selects). Overlap is decided exactly (edge
    intersection covers crossings with no contained vertex; containment
    via point_polygon_distance_m's inside test); positive distances use
    vertex+midpoint sampling both ways — well under the 1,500-km decision
    scale, same tolerance argument as point_polygon_distance_m."""
    best = float("inf")
    for pa in polys_a:
        for pb in polys_b:
            for ring in pa:
                m = len(ring)
                for i in range(m):
                    if segment_intersects_polygon(ring[i], ring[(i + 1) % m], pb):
                        return 0.0
            for ring in pa:
                for x, y in _edge_samples(ring):
                    d = point_polygon_distance_m(y, x, pb)
                    if d < best:
                        best = d
                    if best == 0.0:
                        return 0.0
            for ring in pb:
                for x, y in _edge_samples(ring):
                    d = point_polygon_distance_m(y, x, pa)
                    if d < best:
                        best = d
                    if best == 0.0:
                        return 0.0
    return best


def point_polygon_distance_m(lat, lon, rings) -> float:
    """Approximate geodesic distance point→polygon boundary (0 if inside).
    Used by the 1,500-km pre-filter (reference main_pipeline.py:176-217) and
    the nearest-admin fallback (impact_analysis.py:1049-1064). Vertex+midpoint
    sampling is accurate to well under the 1,500-km decision scale."""
    if point_in_polygon(lon, lat, rings):
        return 0.0
    best = float("inf")
    for ring in rings:
        m = len(ring)
        for i in range(m):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % m]
            for t in (0.0, 0.25, 0.5, 0.75, 1.0):
                d = haversine_m(lat, lon, y1 + t * (y2 - y1), x1 + t * (x2 - x1))
                if d < best:
                    best = d
    return best
