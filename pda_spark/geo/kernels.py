"""Vectorized planar-geometry kernels (pure numpy) over decoded WKB.

These replace the PostGIS scalar functions the reference leans on:
ST_Centroid/ST_Transform (/root/reference/database/db.py:73-84),
ST_Area (db.py:150-158), ST_Buffer (db.py:243-245, app/query.py:158),
ST_Intersects (db.py:116-122,219-224,236-241),
ST_Intersection + area ratio (app/query.py:154-156).

Exactness contract:
- centroid / area in EPSG:3035 match PROJ/PostGIS to float64 precision
  (see pda_spark.geo.proj);
- point-in-polygon and polygon-polygon intersects are exact for simple
  polygons (even-odd rule; touching boundaries count as intersecting up to
  float tolerance);
- intersection *area* is exact when at least one operand is convex
  (Sutherland–Hodgman clipping); the scale path for arbitrary shapes is the
  tile/zonal operator in pda_spark.operators.tiling.
"""

from __future__ import annotations

import numpy as np

from pda_spark.geo import proj, wkb

# ------------------------------------------------------------ ring math


def ring_area_signed(ring: np.ndarray) -> float:
    """Shoelace signed area of a closed ring."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])) / 2.0


def ring_centroid(ring: np.ndarray) -> tuple[float, float, float]:
    """(cx, cy, signed_area) of a closed ring (area-weighted centroid)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x0 * y1 - x1 * y0
    a = cross.sum() / 2.0
    if a == 0.0:
        return float(ring[:, 0].mean()), float(ring[:, 1].mean()), 0.0
    cx = float(((x0 + x1) * cross).sum() / (6.0 * a))
    cy = float(((y0 + y1) * cross).sum() / (6.0 * a))
    return cx, cy, float(a)


def polygons_area(polys: list[list[np.ndarray]]) -> float:
    """Area of polygons-with-holes: |outer| - sum(|holes|) per polygon."""
    total = 0.0
    for rings in polys:
        total += abs(ring_area_signed(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area_signed(hole))
    return total


def polygons_centroid(polys: list[list[np.ndarray]]) -> tuple[float, float]:
    """Area-weighted centroid of polygons-with-holes."""
    sa = sx = sy = 0.0
    for rings in polys:
        cx, cy, a = ring_centroid(rings[0])
        a = abs(a)
        sx += cx * a
        sy += cy * a
        sa += a
        for hole in rings[1:]:
            hx, hy, ha = ring_centroid(hole)
            ha = abs(ha)
            sx -= hx * ha
            sy -= hy * ha
            sa -= ha
    if sa == 0.0:
        pts = np.concatenate([r for rings in polys for r in rings])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return sx / sa, sy / sa


def _project_polys(polys: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    out = []
    for rings in polys:
        prings = []
        for r in rings:
            x, y = proj.fwd(r[:, 0], r[:, 1])
            prings.append(np.column_stack([x, y]))
        out.append(prings)
    return out


# ------------------------------------------------ reference scalar funcs


def centroid_3035(geom: wkb.Geom) -> tuple[float, float]:
    """Equal-area centroid: project 4326->3035, centroid, back to 4326.

    Mirrors the reference's insert-time ``CentroidFromPolygon``
    (/root/reference/database/db.py:73-84).
    """
    if geom.gtype == wkb.POINT:
        p = geom.parts[0][0]
        return float(p[0]), float(p[1])
    cx, cy = polygons_centroid(_project_polys(geom.polygons()))
    lon, lat = proj.inv(np.asarray([cx]), np.asarray([cy]))
    return float(lon[0]), float(lat[0])


def area_3035_sqkm(geom: wkb.Geom, ndigits: int | None = 3) -> float:
    """ST_Area(ST_Transform(geom,3035))/1e6 (db.py:150-158), round 3."""
    a = polygons_area(_project_polys(geom.polygons())) / 1e6
    return round(a, ndigits) if ndigits is not None else a


def area_planar(geom: wkb.Geom) -> float:
    """Planar area in the geometry's own coordinates (deg^2 for 4326)."""
    return polygons_area(geom.polygons())


def bbox(geom: wkb.Geom) -> tuple[float, float, float, float]:
    pts = geom.points()
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def buffer_point_3035(lon: float, lat: float, dist_m: float, quad_segs: int = 8) -> bytes:
    """30 km city buffer: ST_Buffer in 3035 then back to 4326
    (db.py:243-245). PostGIS default quad_segs=8 -> 32-gon."""
    x, y = proj.fwd(np.asarray([lon]), np.asarray([lat]))
    theta = np.linspace(0.0, 2.0 * np.pi, 4 * quad_segs, endpoint=False)
    bx = x[0] + dist_m * np.cos(theta)
    by = y[0] + dist_m * np.sin(theta)
    blon, blat = proj.inv(bx, by)
    ring = np.column_stack([blon, blat])
    return wkb.polygon([ring])


def _disc_ring(x: float, y: float, dist: float, quad_segs: int) -> np.ndarray:
    theta = np.linspace(0.0, 2.0 * np.pi, 4 * quad_segs, endpoint=False)
    ring = np.column_stack([x + dist * np.cos(theta), y + dist * np.sin(theta)])
    return np.vstack([ring, ring[:1]])


def _capsule_pieces(
    path: np.ndarray, dist: float, quad_segs: int
) -> list[list[np.ndarray]]:
    """Minkowski sum of a polyline with a disc of radius ``dist``, as a
    list of single-ring polygons ready for scanline union: one rectangle
    per segment (offset BOTH sides — under union the inner half is
    redundant for outer rings and exactly the hole-shrink for inner
    rings) plus one disc per vertex (the PostGIS-style round join)."""
    pieces: list[list[np.ndarray]] = []
    pts = np.asarray(path, dtype=np.float64)
    closed = len(pts) > 1 and bool(np.all(pts[0] == pts[-1]))
    verts = pts[:-1] if closed else pts
    for x, y in verts:
        pieces.append([_disc_ring(float(x), float(y), dist, quad_segs)])
    a = pts[:-1]
    b = pts[1:]
    v = b - a
    ln = np.hypot(v[:, 0], v[:, 1])
    for i in np.nonzero(ln > 0.0)[0]:
        nx = -v[i, 1] / ln[i] * dist
        ny = v[i, 0] / ln[i] * dist
        n = np.array([nx, ny])
        rect = np.array([a[i] + n, b[i] + n, b[i] - n, a[i] - n, a[i] + n])
        pieces.append([rect])
    return pieces


def _buffer_convex_direct(
    ring: np.ndarray, dist: float, quad_segs: int
) -> np.ndarray:
    """Direct offset ring of a CONVEX polygon — no union needed: each
    edge shifts along its outward normal, each vertex gets the arc
    between adjacent edge normals, with arc points snapped to the global
    theta grid (k * 2pi/(4*quad_segs)) so the vertex set matches what
    the capsule-union path produces for grid-aligned normals (e.g.
    rectangles — bit-compatible with q79's closed-form oracle).
    O(V + arc points) vs the union's O(slabs * edges): measured ~1000x
    on the rectangle fixture (5.8 ms -> microseconds per geometry)."""
    r = wkb.close_ring(np.asarray(ring, dtype=np.float64))
    if ring_area_signed(r) < 0:
        r = r[::-1]
    pts = r[:-1]
    nv = len(pts)
    step = 2.0 * np.pi / (4 * quad_segs)
    out: list[np.ndarray] = []
    # per-edge outward normals (CCW ring: outward = right of direction)
    normals = []
    for i in range(nv):
        v = pts[(i + 1) % nv] - pts[i]
        ln = float(np.hypot(v[0], v[1]))
        normals.append(None if ln == 0.0 else np.array([v[1], -v[0]]) / ln)
    for i in range(nv):
        n1 = normals[i]
        if n1 is None:
            continue
        out.append(pts[i] + dist * n1)
        b = pts[(i + 1) % nv]
        out.append(b + dist * n1)
        # arc at b from n1 to the next non-degenerate edge's normal,
        # spanning the exterior TURN angle atan2(cross, dot) — a
        # collinear vertex (turn ~ 0) gets NO arc (the old a2<=a1 ->
        # +2pi wraparound spliced a full circle there, inflating the
        # area by pi*d^2 per redundant vertex; round-5 review)
        j = (i + 1) % nv
        while normals[j] is None:
            j = (j + 1) % nv
        n2 = normals[j]
        turn = float(np.arctan2(
            n1[0] * n2[1] - n1[1] * n2[0], n1[0] * n2[0] + n1[1] * n2[1]
        ))
        if turn <= 1e-12:
            continue
        a1 = float(np.arctan2(n1[1], n1[0]))
        a2 = a1 + turn
        for k in range(int(np.floor(a1 / step)) + 1, int(np.ceil(a2 / step))):
            ang = k * step
            if a1 < ang < a2:
                out.append(b + dist * np.array([np.cos(ang), np.sin(ang)]))
    out.append(out[0])
    return np.array(out)


def buffer_polys(
    polys: list[list[np.ndarray]], dist: float, quad_segs: int = 8
) -> list[list[np.ndarray]]:
    """Positive offset (ST_Buffer with round joins) of polygons-with-holes
    in planar coordinates: polygon (+) disc(dist) computed as
    union(original, per-edge capsules) via the scanline kernel — outward
    growth on outer rings, inward shrink (or disappearance) of holes,
    both emerge from the union with no special casing (VERDICT r4 #6;
    reference cleanup buffer app/query.py:158). Arcs are inscribed
    4*quad_segs-gons, PostGIS's default discretization. Negative dist is
    not supported (the reference only buffers outward).

    Sub-discretization caveat (ADVICE r5): the convex single-ring fast
    path places arc vertices ON the true circle at multiples of
    ``step = pi/(2*quad_segs)``, while the capsule-union path clips
    corners to inscribed-polygon chords; for non-axis-aligned convex
    inputs the two paths therefore differ by O(dist * step^2) in vertex
    placement/area — both legitimate discretizations of the same true
    buffer. They agree EXACTLY when every corner's normal fan aligns
    with the step grid (axis-aligned rectangles — the q79 oracle
    fixture). Path choice is by input shape (single convex ring → fast
    path), deterministic per geometry, so results are reproducible; it
    is just not capsule-bit-identical for rotated convex inputs."""
    if dist < 0:
        raise ValueError("buffer_polys: negative (erosion) buffer not supported")
    from pda_spark.geo import sweep

    if dist > 0 and len(polys) == 1 and len(polys[0]) == 1:
        ring = wkb.close_ring(np.asarray(polys[0][0], dtype=np.float64))
        if len(ring) >= 4 and is_convex(ring):
            return [[_buffer_convex_direct(ring, dist, quad_segs)]]

    pieces = [[wkb.close_ring(r) for r in rings] for rings in polys]
    if dist > 0:
        for rings in polys:
            for r in rings:
                pieces.extend(_capsule_pieces(wkb.close_ring(r), dist, quad_segs))
    _, quads = sweep.union_geometry(pieces)
    return sweep.merged_boundary_polygons(quads)


def buffer_lines(
    lines: list[np.ndarray], dist: float, quad_segs: int = 8
) -> list[list[np.ndarray]]:
    """ST_Buffer of polylines (river/lake centerlines — the lineal rows
    of the reference's land-cover table): pure capsule union."""
    if dist <= 0:
        raise ValueError("buffer_lines: dist must be positive")
    from pda_spark.geo import sweep

    pieces: list[list[np.ndarray]] = []
    for ln in lines:
        pieces.extend(_capsule_pieces(ln, dist, quad_segs))
    _, quads = sweep.union_geometry(pieces)
    return sweep.merged_boundary_polygons(quads)


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """ST_ConvexHull of a point set — Andrew's monotone chain, O(n log n).
    Returns the closed CCW hull ring ((k+1, 2)); duplicate input points
    are collapsed and collinear boundary points dropped (strict turns),
    matching GEOS's minimal-vertex hull."""
    p = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(p) <= 2:
        return np.vstack([p, p[:1]])

    def half(points):
        chain: list[np.ndarray] = []
        for q in points:
            while len(chain) >= 2 and float(
                np.cross(chain[-1] - chain[-2], q - chain[-2])
            ) <= 0.0:
                chain.pop()
            chain.append(q)
        return chain

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1] + [lower[0]])


def erosion_area(
    polys: list[list[np.ndarray]], dist: float, quad_segs: int = 8
) -> float:
    """Area of the NEGATIVE buffer (inward offset) of polygons-with-holes:
    erode(A, d) = A minus the dilation of its boundary, so
    |erode(A,d)| = |A| - |A ∩ capsules(boundary, d)| — both terms the
    scanline kernel computes exactly. For convex rings the erosion has
    sharp corners, so the result is EXACT (no arc approximation at all);
    concave vertices get the same inscribed-polygon rounding as the
    positive buffer. Completes ST_Buffer's negative-distance surface
    area-wise (the geometry itself would need a difference walk)."""
    if dist < 0:
        raise ValueError("erosion_area: dist must be non-negative")
    from pda_spark.geo import sweep

    base = [[wkb.close_ring(r) for r in rings] for rings in polys]
    if dist == 0.0:
        return polygons_area(base)
    capsules: list[list[np.ndarray]] = []
    for rings in polys:
        for r in rings:
            capsules.extend(_capsule_pieces(wkb.close_ring(r), dist, quad_segs))
    return polygons_area(base) - sweep.intersect_union_area(base, capsules)


def buffer_geom_3035(geom: wkb.Geom, dist_m: float, quad_segs: int = 8) -> bytes:
    """ST_Buffer(ST_Transform(geom,3035), d) transformed back to 4326 —
    the reference's buffer semantics for every geometry kind it stores:
    point (db.py:243-245, 30 km cities), polygon (app/query.py:158, 1 m
    cleanup), and the lineal land-cover rows. Returns WKB (multi)polygon."""
    if geom.gtype == wkb.POINT:
        p = geom.parts[0][0]
        return buffer_point_3035(float(p[0]), float(p[1]), dist_m, quad_segs)
    if geom.gtype in (wkb.LINESTRING, wkb.MULTILINESTRING):
        buffered = buffer_lines(
            [np.column_stack(proj.fwd(l[:, 0], l[:, 1])) for l in geom.lines()],
            dist_m, quad_segs,
        )
    else:
        buffered = buffer_polys(_project_polys(geom.polygons()), dist_m, quad_segs)
    out = []
    for rings in buffered:
        inv_rings = []
        for r in rings:
            lon, lat = proj.inv(r[:, 0], r[:, 1])
            inv_rings.append(np.column_stack([lon, lat]))
        out.append(inv_rings)
    if len(out) == 1:
        return wkb.polygon(out[0])
    return wkb.multipolygon(out)


# ------------------------------------------------------ predicates


def points_in_polygons(pts: np.ndarray, polys: list[list[np.ndarray]]) -> np.ndarray:
    """Even-odd ray cast of (N,2) points against polygons-with-holes.

    Vectorized over points x edges. Boundary points may go either way
    (float tolerance); fixture worlds avoid degenerate touching.
    """
    n = len(pts)
    if n == 0:
        return np.zeros(0, dtype=bool)
    inside = np.zeros(n, dtype=bool)
    px = pts[:, 0][:, None]
    py = pts[:, 1][:, None]
    for rings in polys:
        crossings = np.zeros(n, dtype=np.int64)
        for ring in rings:
            x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
            x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
            cond = (y0 > py) != (y1 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
            crossings += (cond & (px < xint)).sum(axis=1)
        inside |= (crossings % 2) == 1
    return inside


def _edges(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    a = np.concatenate([r[:-1] for r in rings])
    b = np.concatenate([r[1:] for r in rings])
    return a, b


def _segments_cross(a0, a1, b0, b1) -> bool:
    """Any proper/improper crossing between edge sets (vectorized n x m).

    The orientation-product test alone reports a false positive for
    COLLINEAR-DISJOINT segment pairs (all four orientations zero); those
    pairs additionally require per-axis interval overlap.
    """

    def orient(p, q, r):
        return (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1]) - (
            q[..., 1] - p[..., 1]
        ) * (r[..., 0] - p[..., 0])

    p = a0[:, None, :]
    q = a1[:, None, :]
    r = b0[None, :, :]
    s = b1[None, :, :]
    d1 = orient(p, q, r)
    d2 = orient(p, q, s)
    d3 = orient(r, s, p)
    d4 = orient(r, s, q)
    hit = ((d1 * d2) <= 0) & ((d3 * d4) <= 0)
    collinear = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    if bool((hit & collinear).any()):
        ox = np.minimum(p[..., 0], q[..., 0]) <= np.maximum(r[..., 0], s[..., 0])
        ox &= np.minimum(r[..., 0], s[..., 0]) <= np.maximum(p[..., 0], q[..., 0])
        oy = np.minimum(p[..., 1], q[..., 1]) <= np.maximum(r[..., 1], s[..., 1])
        oy &= np.minimum(r[..., 1], s[..., 1]) <= np.maximum(p[..., 1], q[..., 1])
        hit &= ~collinear | (ox & oy)
    return bool(hit.any())


def _points_on_segments(pts: np.ndarray, e0: np.ndarray, e1: np.ndarray) -> np.ndarray:
    """(N,) bool: each point lies on any segment (collinear + in bbox)."""
    if len(pts) == 0 or len(e0) == 0:
        return np.zeros(len(pts), dtype=bool)
    p = pts[:, None, :]
    a = e0[None, :, :]
    b = e1[None, :, :]
    cross = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    inx = (np.minimum(a[..., 0], b[..., 0]) <= p[..., 0]) & (
        p[..., 0] <= np.maximum(a[..., 0], b[..., 0])
    )
    iny = (np.minimum(a[..., 1], b[..., 1]) <= p[..., 1]) & (
        p[..., 1] <= np.maximum(a[..., 1], b[..., 1])
    )
    return ((cross == 0) & inx & iny).any(axis=1)


def polys_contains(ga: wkb.Geom, gb: wkb.Geom) -> bool:
    """ST_Contains(A, B) for polygonal operands with B strictly off A's
    boundary (the fixture contract everywhere in this engine): A
    contains B iff every B vertex is interior to A (even-odd — a vertex
    inside one of A's holes counts as outside), no boundary edges
    cross, and no hole ring of A sits strictly inside B (a hole
    swallowed whole by B punches B out of A with zero crossings).
    Boundary-touching inputs are outside the contract — the even-odd
    ray cast's float tolerance makes on-boundary vertices undefined,
    exactly as documented for points_in_polygons."""
    apolys = ga.polygons()
    bpts = gb.points()
    if not points_in_polygons(bpts, apolys).all():
        return False
    ae0, ae1 = _edges([r for rings in apolys for r in rings])
    be0, be1 = _edges([r for rings in gb.polygons() for r in rings])
    if _segments_cross(ae0, ae1, be0, be1):
        return False
    bpolys = gb.polygons()
    for rings in apolys:
        for hole in rings[1:]:
            if points_in_polygons(hole[:-1], bpolys).all():
                return False
    return True


def polys_within(ga: wkb.Geom, gb: wkb.Geom) -> bool:
    """ST_Within(A, B) == ST_Contains(B, A)."""
    return polys_contains(gb, ga)


def is_axis_rect(g: wkb.Geom) -> bool:
    """True iff the geometry is a single closed axis-aligned rectangle
    (5-point ring, every edge horizontal or vertical). For such a pair,
    ST_Intersects == bbox overlap — an exact O(1) fast path."""
    if g.gtype != wkb.POLYGON or len(g.parts) != 1:
        return False
    r = g.parts[0]
    if len(r) != 5:
        return False
    d = np.diff(r, axis=0)
    # Each edge must be strictly horizontal XOR strictly vertical (zero
    # length or diagonal disqualifies), and orientation must alternate
    # H/V/H/V or V/H/V/H — otherwise a zero-area zigzag/backtracking ring
    # (e.g. HHVV) would take the bbox fast path and report intersections
    # the exact kernel rejects (ADVICE r2).
    horiz = (d[:, 1] == 0.0) & (d[:, 0] != 0.0)
    vert = (d[:, 0] == 0.0) & (d[:, 1] != 0.0)
    if not bool(np.all(horiz | vert)):
        return False
    return bool(np.all(horiz == np.array([True, False, True, False]))) or bool(
        np.all(horiz == np.array([False, True, False, True]))
    )


# geometry-kind dispatch: point-like / lineal / polygonal
_KIND = {
    wkb.POINT: "pt",
    wkb.MULTIPOINT: "pt",
    wkb.LINESTRING: "ln",
    wkb.MULTILINESTRING: "ln",
    wkb.POLYGON: "pg",
    wkb.MULTIPOLYGON: "pg",
}


def polys_intersect(ga: wkb.Geom, gb: wkb.Geom) -> bool:
    """ST_Intersects for any point/line/polygon operand combination
    (even-odd interior semantics; boundary contact counts).

    Lineal operands added round 3: the reference's land-cover table mixes
    urban polygons with river/lake centerline LineStrings
    (/root/reference/api_importer/clients/geojson_xyz.py:59-70), and its
    image x land_cover ST_Intersects join (database/db.py:116-122) runs
    against those lines in production.
    """
    ka, kb = _KIND[ga.gtype], _KIND[gb.gtype]
    ax0, ay0, ax1, ay1 = bbox(ga)
    bx0, by0, bx1, by1 = bbox(gb)
    if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
        return False
    # order operands pt < ln < pg so each mixed case is handled once
    if (ka, kb) in (("ln", "pt"), ("pg", "pt"), ("pg", "ln")):
        ga, gb, ka, kb = gb, ga, kb, ka

    if ka == "pt" and kb == "pt":
        pa, pb = ga.points(), gb.points()
        return bool((pa[:, None, :] == pb[None, :, :]).all(axis=2).any())
    if ka == "pt" and kb == "ln":
        e0, e1 = _edges(gb.lines())
        return bool(_points_on_segments(ga.points(), e0, e1).any())
    if ka == "pt" and kb == "pg":
        polys = gb.polygons()
        pts = ga.points()
        if points_in_polygons(pts, polys).any():
            return True
        e0, e1 = _edges([r for rings in polys for r in rings])
        return bool(_points_on_segments(pts, e0, e1).any())
    if ka == "ln" and kb == "ln":
        ea0, ea1 = _edges(ga.lines())
        eb0, eb1 = _edges(gb.lines())
        return _segments_cross(ea0, ea1, eb0, eb1)
    if ka == "ln" and kb == "pg":
        lines = ga.lines()
        polys = gb.polygons()
        # any line vertex inside the polygon interior (even-odd handles
        # holes: a river inside a lake-hole does not intersect) ...
        if points_in_polygons(np.concatenate(lines), polys).any():
            return True
        # ... or any crossing/touch between line edges and ring edges
        ea0, ea1 = _edges(lines)
        eb0, eb1 = _edges([r for rings in polys for r in rings])
        return _segments_cross(ea0, ea1, eb0, eb1)
    # pg x pg
    pa, pb = ga.polygons(), gb.polygons()
    av = np.concatenate([rings[0] for rings in pa])
    bv = np.concatenate([rings[0] for rings in pb])
    if points_in_polygons(av, pb).any() or points_in_polygons(bv, pa).any():
        return True
    ea0, ea1 = _edges([r for rings in pa for r in rings])
    eb0, eb1 = _edges([r for rings in pb for r in rings])
    return _segments_cross(ea0, ea1, eb0, eb1)


# ------------------------------------------------ convex clipping (exact)


def is_convex(ring: np.ndarray) -> bool:
    r = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    n = len(r)
    if n < 3:
        return False
    v = np.roll(r, -1, axis=0) - r
    cross = v[:, 0] * np.roll(v, -1, axis=0)[:, 1] - v[:, 1] * np.roll(v, -1, axis=0)[:, 0]
    return bool((cross >= -1e-30).all() or (cross <= 1e-30).all())


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` ring by CONVEX ``clip`` ring.

    Returns the (closed) intersection ring, possibly empty. Exact for a
    convex clip polygon and arbitrary simple subject.
    """
    clip_r = clip[:-1] if (clip[0] == clip[-1]).all() else clip
    if ring_area_signed(wkb.close_ring(clip_r)) < 0:
        clip_r = clip_r[::-1]
    out = subject[:-1] if (subject[0] == subject[-1]).all() else subject
    out = list(map(tuple, out))
    m = len(clip_r)
    for i in range(m):
        if not out:
            break
        cp0 = clip_r[i]
        cp1 = clip_r[(i + 1) % m]
        ex, ey = cp1[0] - cp0[0], cp1[1] - cp0[1]
        res = []
        prev = out[-1]
        prev_in = ex * (prev[1] - cp0[1]) - ey * (prev[0] - cp0[0]) >= 0
        for cur in out:
            cur_in = ex * (cur[1] - cp0[1]) - ey * (cur[0] - cp0[0]) >= 0
            if cur_in != prev_in:
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ex * (cp0[1] - prev[1]) - ey * (cp0[0] - prev[0])) / denom
                    res.append((prev[0] + t * dx, prev[1] + t * dy))
            if cur_in:
                res.append(cur)
            prev, prev_in = cur, cur_in
        out = res
    if len(out) < 3:
        return np.empty((0, 2))
    return wkb.close_ring(np.asarray(out))


def intersection_area(ga: wkb.Geom, gb: wkb.Geom) -> float:
    """Exact planar intersection area. Fast path: Sutherland–Hodgman when
    one operand of a pair is convex (and neither has holes); otherwise the
    scanline kernel (geo.sweep) computes the exact answer for arbitrary
    simple polygons with holes — no convexity contract to violate."""
    pa, pb = ga.polygons(), gb.polygons()
    simple = all(len(r) == 1 for r in pa) and all(len(r) == 1 for r in pb)
    if simple and (all(is_convex(r[0]) for r in pa) or all(is_convex(r[0]) for r in pb)):
        total = 0.0
        for ra in pa:
            for rb in pb:
                if is_convex(rb[0]):
                    subject, clip = ra[0], rb[0]
                else:
                    subject, clip = rb[0], ra[0]
                ring = clip_convex(subject, clip)
                if len(ring):
                    total += abs(ring_area_signed(ring))
        return total
    from pda_spark.geo import sweep

    return sweep.intersect_union_area(pa, pb)


def union_intersection_area(target: wkb.Geom, others: list[wkb.Geom], max_exact: int = 20) -> float:
    """area(target ∩ union(others)) via inclusion–exclusion.

    Exact when target and all others are convex (intersections of convex
    sets stay convex). Used for the reference's coverage query
    (/root/reference/app/query.py:143-192) at golden-test scale; the
    100 TB path is the tile/zonal approximation in operators.tiling.
    """
    rings = []
    for g in others:
        for p in g.polygons():
            rings.append(p[0])
    if len(rings) > max_exact:
        raise ValueError(f"{len(rings)} polygons > max_exact={max_exact}; use tiling path")
    total = 0.0
    n = len(rings)
    tring = target.polygons()[0][0]

    def rec(start: int, current: np.ndarray, depth: int):
        nonlocal total
        for i in range(start, n):
            clipped = clip_convex(current, rings[i]) if is_convex(rings[i]) else clip_convex(rings[i], current)
            if len(clipped) == 0:
                continue
            total += ((-1) ** depth) * abs(ring_area_signed(clipped))
            rec(i + 1, clipped, depth + 1)

    rec(0, tring, 0)
    return total


def polys_intersect_batch(
    ga_list: list[wkb.Geom], gb_list: list[wkb.Geom], ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Batched ST_Intersects over UNIQUE candidate pairs
    ``(ga_list[ia[k]], gb_list[ib[k]])`` — same decision values as
    ``polys_intersect`` pair-by-pair (same PIP / crossing primitives on
    the same arrays), restructured so a batch of thousands of pairs does
    a handful of large numpy calls instead of thousands of small ones:

    1. bbox reject (vectorized);
    2. grouped vertex containment — ONE ray-cast per distinct polygon
       against the concatenated outer-ring vertices of every partner it
       is paired with (``np.add.reduceat`` recovers per-pair "any");
    3. per-pair edge crossing only for still-undecided pairs (pairs that
       neither contain a partner vertex nor are bbox-disjoint — rare in
       footprint data).

    Non-polygonal operands (points/lines) fall back to the scalar
    kernel per pair.
    """
    n = len(ia)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    gt_a = np.array([g.gtype for g in ga_list], dtype=np.int64)
    gt_b = np.array([g.gtype for g in gb_list], dtype=np.int64)
    is_pg_a = (gt_a == wkb.POLYGON) | (gt_a == wkb.MULTIPOLYGON)
    is_pg_b = (gt_b == wkb.POLYGON) | (gt_b == wkb.MULTIPOLYGON)
    pg_pair = is_pg_a[ia] & is_pg_b[ib]

    for k in np.nonzero(~pg_pair)[0]:
        out[k] = polys_intersect(ga_list[ia[k]], gb_list[ib[k]])

    alive = np.nonzero(pg_pair)[0]
    if alive.size == 0:
        return out

    bb_a = np.array([bbox(g) for g in ga_list])
    bb_b = np.array([bbox(g) for g in gb_list])
    A = bb_a[ia[alive]]
    B = bb_b[ib[alive]]
    overlap = (A[:, 0] <= B[:, 2]) & (B[:, 0] <= A[:, 2]) & (A[:, 1] <= B[:, 3]) & (B[:, 1] <= A[:, 3])
    alive = alive[overlap]  # bbox-disjoint pairs stay False, decided
    if alive.size == 0:
        return out

    # per-unique-geometry tables (outer-ring vertices; lazily built)
    overts_a: dict[int, np.ndarray] = {}
    overts_b: dict[int, np.ndarray] = {}

    def outer(gl, cache, j):
        v = cache.get(j)
        if v is None:
            v = np.concatenate([rings[0] for rings in gl[j].polygons()])
            cache[j] = v
        return v

    def contain_stage(group_of, vert_side_idx, vert_gl, vert_cache, poly_gl, poly_side_idx, live):
        """any(outer vertex of vert side in poly side), grouped by the
        poly side's unique geometry; returns bool array over ``live``."""
        hit = np.zeros(live.size, dtype=bool)
        order = np.argsort(group_of[live], kind="stable")
        lv = live[order]
        gcodes = group_of[lv]
        starts = np.nonzero(np.r_[True, gcodes[1:] != gcodes[:-1]])[0]
        for s, e in zip(starts, np.r_[starts[1:], gcodes.size]):
            pj = gcodes[s]
            ks = lv[s:e]
            vlists = [outer(vert_gl, vert_cache, j) for j in vert_side_idx[ks]]
            lens = np.array([len(v) for v in vlists])
            ins = points_in_polygons(np.concatenate(vlists), poly_gl[pj].polygons())
            offs = np.r_[0, np.cumsum(lens[:-1])]
            hit[order[s:e]] = np.add.reduceat(ins, offs) > 0
        return hit

    h1 = contain_stage(ib, ia, ga_list, overts_a, gb_list, ib, alive)
    out[alive[h1]] = True
    alive = alive[~h1]
    if alive.size:
        h2 = contain_stage(ia, ib, gb_list, overts_b, ga_list, ia, alive)
        out[alive[h2]] = True
        alive = alive[~h2]

    # stage 3: per-pair edge crossing (cache edge arrays per unique geom)
    edges_a: dict[int, tuple] = {}
    edges_b: dict[int, tuple] = {}

    def edges_of(gl, cache, j):
        v = cache.get(j)
        if v is None:
            v = _edges([r for rings in gl[j].polygons() for r in rings])
            cache[j] = v
        return v

    for k in alive:
        ea0, ea1 = edges_of(ga_list, edges_a, ia[k])
        eb0, eb1 = edges_of(gb_list, edges_b, ib[k])
        out[k] = _segments_cross(ea0, ea1, eb0, eb1)
    return out


def dp_simplify(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative stack, no
    recursion depth limit). Keeps endpoints; a vertex survives iff its
    distance to the current anchor segment exceeds ``tol``. For a CLOSED
    ring pass the full ring (first == last): the zero-length anchor
    segment degenerates to distance-from-ring[0], which keeps the
    farthest vertex first — exactly the split-at-farthest-vertex scheme
    GEOS uses for rings."""
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        l2 = float(seg @ seg)
        sub = pts[i + 1 : j]
        if l2 == 0.0:
            d2 = ((sub - pts[i]) ** 2).sum(axis=1)
        else:
            t = np.clip((sub - pts[i]) @ seg / l2, 0.0, 1.0)
            proj = pts[i] + t[:, None] * seg
            d2 = ((sub - proj) ** 2).sum(axis=1)
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            ki = i + 1 + k
            keep[ki] = True
            stack.append((i, ki))
            stack.append((ki, j))
    return pts[keep]


def simplify_geom(g: wkb.Geom, tol: float) -> wkb.Geom:
    """ST_Simplify over any supported geometry: DP per polyline / per
    ring. A ring that would collapse below 4 points (triangle + closure)
    is returned unsimplified (ST_SimplifyPreserveTopology-ish guard)."""
    if g.gtype in (wkb.POINT, wkb.MULTIPOINT):
        return g
    if g.gtype in (wkb.LINESTRING, wkb.MULTILINESTRING):
        lines = [dp_simplify(ln, tol) for ln in g.lines()]
        if g.gtype == wkb.LINESTRING:
            return wkb.Geom(wkb.LINESTRING, [lines[0]])
        return wkb.Geom(wkb.MULTILINESTRING, [[ln] for ln in lines])

    def ring_ok(r):
        s = dp_simplify(r, tol)
        return s if len(s) >= 4 else r

    polys = [[ring_ok(r) for r in rings] for rings in g.polygons()]
    if g.gtype == wkb.POLYGON:
        return wkb.Geom(wkb.POLYGON, polys[0])
    return wkb.Geom(wkb.MULTIPOLYGON, polys)
