"""Exact scanline (horizontal-slab) measure kernels for ARBITRARY simple
polygons with holes — union area, union∩union area, and dissolved
(union) geometry as a y-monotone trapezoid decomposition.

This replaces the convex-only inclusion–exclusion path for the engine's
ST_UNION / coverage semantics (reference: ST_UNION GROUP BY at
/root/reference/app/query.py:195-213 and the coverage ratio at
app/query.py:143-192). PostGIS gets these from GEOS; we re-derive them
from first principles:

Algorithm (vertical decomposition):
1. collect every edge of every ring (outer rings AND holes — fill is
   even-odd per polygon, so holes need no special casing);
2. breakpoints = all vertex y's + all pairwise edge-crossing y's. Between
   consecutive breakpoints no two edges cross and no edge starts/ends, so
   the interval structure of any scanline is CONSTANT across the slab and
   every interval endpoint is linear in y;
3. per slab, evaluate the scanline at the midpoint: per polygon the
   even-odd crossing intervals, per layer the union of its polygons'
   intervals, then the requested boolean over layers (union / intersect);
4. total covered length L(y) is affine within the slab (sum of linear
   endpoint differences with fixed structure), so the slab's exact area
   is L(y_mid) * slab_height.

Cost: O((V + X) * E) for V vertices, X edge crossings, E edges — always
polynomial (the inclusion–exclusion path is exponential in overlap
count). The per-cell subproblems of the tiling scale path keep E small,
so this is also the 100 TB inner kernel.

Exactness: float64 arithmetic on exact slab topology — equal to the
algebraic answer up to IEEE754 rounding (verified against shoelace /
inclusion–exclusion oracles in tests/test_geo_kernels.py).
"""

from __future__ import annotations

import numpy as np

from pda_spark.geo import wkb

__all__ = [
    "union_area",
    "intersect_union_area",
    "union_geometry",
    "intersect_union_geometry",
    "merged_boundary_polygons",
]


def _edges_of_layer(polys: list[list[np.ndarray]]):
    """Edge arrays (x0, y0, x1, y1, pid) for one layer. Every ring of a
    polygon (outer + holes) carries the polygon's pid — even-odd crossing
    counting per pid gives polygon-with-holes fill for free."""
    xs0, ys0, xs1, ys1, pids = [], [], [], [], []
    for pid, rings in enumerate(polys):
        for ring in rings:
            r = wkb.close_ring(np.asarray(ring, dtype=np.float64))
            if len(r) < 4:  # closed triangle has 4 points
                continue
            xs0.append(r[:-1, 0])
            ys0.append(r[:-1, 1])
            xs1.append(r[1:, 0])
            ys1.append(r[1:, 1])
            pids.append(np.full(len(r) - 1, pid, dtype=np.int64))
    if not xs0:
        z = np.empty(0)
        return z, z, z, z, np.empty(0, dtype=np.int64)
    return (
        np.concatenate(xs0),
        np.concatenate(ys0),
        np.concatenate(xs1),
        np.concatenate(ys1),
        np.concatenate(pids),
    )


def _crossing_ys(x0, y0, x1, y1, chunk: int = 256) -> np.ndarray:
    """y coordinates of proper pairwise segment crossings (vectorized,
    chunked O(E^2)). Endpoint touches need no breakpoint — endpoints are
    vertex breakpoints already."""
    n = len(x0)
    if n < 2:
        return np.empty(0)
    dx = x1 - x0
    dy = y1 - y0
    out = []
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        # segment i in [a,b) x segment j in [0,n)
        denom = dx[a:b, None] * dy[None, :] - dy[a:b, None] * dx[None, :]
        rx = x0[None, :] - x0[a:b, None]
        ry = y0[None, :] - y0[a:b, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (rx * dy[None, :] - ry * dx[None, :]) / denom
            u = (rx * dy[a:b, None] - ry * dx[a:b, None]) / denom
        with np.errstate(invalid="ignore"):
            ok = (denom != 0) & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
        if ok.any():
            with np.errstate(invalid="ignore"):
                yi = y0[a:b, None] + t * dy[a:b, None]
            out.append(yi[ok])
    return np.concatenate(out) if out else np.empty(0)


def _layer_union_intervals(edges, ym: float):
    """Merged covered intervals of one layer at scanline y=ym.

    Returns (starts, ends, start_eids, end_eids): the union of the
    layer's polygons' even-odd intervals, with the edge index bounding
    each side (for geometry chaining)."""
    x0, y0, x1, y1, pid = edges
    mask = (y0 > ym) != (y1 > ym)
    if not mask.any():
        e = np.empty(0)
        return e, e, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    eids = np.nonzero(mask)[0]
    xs = x0[mask] + (ym - y0[mask]) * (x1[mask] - x0[mask]) / (y1[mask] - y0[mask])
    p = pid[mask]
    order = np.lexsort((xs, p))
    xs, p, eids = xs[order], p[order], eids[order]
    # parity within each polygon group -> per-polygon entry/exit points
    grp_first = np.r_[True, p[1:] != p[:-1]]
    first_idx = np.maximum.accumulate(np.where(grp_first, np.arange(len(p)), 0))
    parity = (np.arange(len(p)) - first_idx) % 2
    # union across polygons: +1 at entries, -1 at exits; entries sort
    # before exits at equal x so touching intervals fuse
    delta = np.where(parity == 0, 1, -1)
    order2 = np.lexsort((-delta, xs))
    xs2, d2, e2 = xs[order2], delta[order2], eids[order2]
    cov = np.cumsum(d2)
    opening = (cov == 1) & (d2 == 1)
    closing = (cov == 0) & (d2 == -1)
    return xs2[opening], xs2[closing], e2[opening], e2[closing]


def _intersect_intervals(sa, ea, sb, eb, ea_ids=None, eb_ids=None):
    """Intersection of two disjoint sorted interval lists -> (starts, ends)
    (+ bounding edge ids when both id quadruples are given)."""
    zi = np.empty(0, dtype=np.int64)
    if len(sa) == 0 or len(sb) == 0:
        return (np.empty(0), np.empty(0)) + ((zi, zi) if ea_ids is not None else ())
    # event sweep over both lists
    xs = np.concatenate([sa, ea, sb, eb])
    da = np.concatenate([np.ones(len(sa)), -np.ones(len(ea)), np.zeros(len(sb) + len(eb))])
    db = np.concatenate([np.zeros(len(sa) + len(ea)), np.ones(len(sb)), -np.ones(len(eb))])
    if ea_ids is not None:
        eids = np.concatenate([ea_ids[0], ea_ids[1], eb_ids[0], eb_ids[1]])
    order = np.lexsort((-(da + db), xs))  # opens before closes at ties
    xs, da, db = xs[order], da[order], db[order]
    ca, cb = np.cumsum(da), np.cumsum(db)
    both = (ca > 0) & (cb > 0)
    # segment [xs[i], xs[i+1]) is covered iff both[i]
    seg_on = both[:-1]
    starts = xs[:-1][seg_on]
    ends = xs[1:][seg_on]
    keep = ends > starts
    if ea_ids is None:
        return starts[keep], ends[keep]
    eids = eids[order]
    # boundary edges: the events delimiting each covered segment
    s_ids = eids[:-1][seg_on][keep]
    e_ids = eids[1:][seg_on][keep]
    return starts[keep], ends[keep], s_ids, e_ids


def _slabs(layers_edges) -> np.ndarray:
    ys = []
    for x0, y0, x1, y1, _ in layers_edges:
        ys.append(y0)
        ys.append(y1)
    allx0 = np.concatenate([e[0] for e in layers_edges])
    ally0 = np.concatenate([e[1] for e in layers_edges])
    allx1 = np.concatenate([e[2] for e in layers_edges])
    ally1 = np.concatenate([e[3] for e in layers_edges])
    bp = np.concatenate(ys + [_crossing_ys(allx0, ally0, allx1, ally1)])
    return np.unique(bp)


def union_area(polys: list[list[np.ndarray]]) -> float:
    """Exact area of union(polys); each polygon is [outer, *holes]
    (even-odd fill). Arbitrary simple rings — no convexity requirement."""
    edges = _edges_of_layer(polys)
    if len(edges[0]) == 0:
        return 0.0
    bps = _slabs([edges])
    total = 0.0
    for i in range(len(bps) - 1):
        h = bps[i + 1] - bps[i]
        if h <= 0.0:
            continue
        ym = 0.5 * (bps[i] + bps[i + 1])
        s, e, _, _ = _layer_union_intervals(edges, ym)
        if len(s):
            total += float(np.sum(e - s)) * h
    return total


def intersect_union_area(
    polys_a: list[list[np.ndarray]], polys_b: list[list[np.ndarray]]
) -> float:
    """Exact area of union(polys_a) ∩ union(polys_b) — the coverage-query
    numerator (area of class-union covered by the image-union)."""
    ea = _edges_of_layer(polys_a)
    eb = _edges_of_layer(polys_b)
    if len(ea[0]) == 0 or len(eb[0]) == 0:
        return 0.0
    bps = _slabs([ea, eb])
    total = 0.0
    for i in range(len(bps) - 1):
        h = bps[i + 1] - bps[i]
        if h <= 0.0:
            continue
        ym = 0.5 * (bps[i] + bps[i + 1])
        sa, eaa, _, _ = _layer_union_intervals(ea, ym)
        sb, ebb, _, _ = _layer_union_intervals(eb, ym)
        s, e = _intersect_intervals(sa, eaa, sb, ebb)
        if len(s):
            total += float(np.sum(e - s)) * h
    return total


def _chain_quads(bps, slab_intervals, edge_x) -> tuple[float, list[np.ndarray]]:
    """Shared slab sweep: measure covered length per slab AND merge
    vertically-adjacent trapezoids bounded by the same edge pair.
    ``slab_intervals(ym)`` returns (starts, ends, left_eids, right_eids)
    for the scanline at ym."""
    total = 0.0
    out: list[np.ndarray] = []
    chains: dict[tuple[int, int], list[float]] = {}
    for i in range(len(bps) - 1):
        ylo, yhi = float(bps[i]), float(bps[i + 1])
        h = yhi - ylo
        if h <= 0.0:
            continue
        ym = 0.5 * (ylo + yhi)
        s, e, le, re = slab_intervals(ym)
        if len(s):
            total += float(np.sum(e - s)) * h
        nxt: dict[tuple[int, int], list[float]] = {}
        for j in range(len(s)):
            key = (int(le[j]), int(re[j]))
            prev = chains.pop(key, None)
            if prev is not None and prev[1] == ylo:
                nxt[key] = [prev[0], yhi]
            else:
                if prev is not None:
                    out.append(_emit_quad(edge_x, prev, key))
                nxt[key] = [ylo, yhi]
        for key, span in chains.items():
            out.append(_emit_quad(edge_x, span, key))
        chains = nxt
    for key, span in chains.items():
        out.append(_emit_quad(edge_x, span, key))
    return total, [q for q in out if q is not None]


def intersect_union_geometry(
    polys_a: list[list[np.ndarray]], polys_b: list[list[np.ndarray]]
) -> tuple[float, list[np.ndarray]]:
    """(exact area, trapezoid decomposition) of union(a) ∩ union(b) — the
    reference's ST_INTERSECTION geometry output (app/query.py:154-156),
    as a non-overlapping y-monotone cover of the intersection region."""
    ea = _edges_of_layer(polys_a)
    eb = _edges_of_layer(polys_b)
    if len(ea[0]) == 0 or len(eb[0]) == 0:
        return 0.0, []
    # evaluate boundary edges in a combined edge table (b offset by len(a))
    off = len(ea[0])
    x0 = np.concatenate([ea[0], eb[0]])
    y0 = np.concatenate([ea[1], eb[1]])
    x1 = np.concatenate([ea[2], eb[2]])
    y1 = np.concatenate([ea[3], eb[3]])

    def edge_x(eid: np.ndarray, y: float) -> np.ndarray:
        dy = y1[eid] - y0[eid]
        return x0[eid] + (y - y0[eid]) * (x1[eid] - x0[eid]) / dy

    def slab_intervals(ym: float):
        sa, eaa, la, ra = _layer_union_intervals(ea, ym)
        sb, ebb, lb, rb = _layer_union_intervals(eb, ym)
        return _intersect_intervals(
            sa, eaa, sb, ebb, ea_ids=(la, ra), eb_ids=(lb + off, rb + off)
        )

    return _chain_quads(_slabs([ea, eb]), slab_intervals, edge_x)


def union_geometry(polys: list[list[np.ndarray]]) -> tuple[float, list[np.ndarray]]:
    """Dissolved geometry: (exact union area, trapezoid decomposition).

    The returned rings are non-overlapping closed quads whose union IS the
    union region (a y-monotone decomposition — geometrically a true
    dissolve, with redundant collinear boundary vertices). Vertically
    adjacent trapezoids bounded by the same pair of edges are merged.
    """
    edges = _edges_of_layer(polys)
    if len(edges[0]) == 0:
        return 0.0, []
    x0, y0, x1, y1, _ = edges

    def edge_x(eid: np.ndarray, y: float) -> np.ndarray:
        dy = y1[eid] - y0[eid]
        return x0[eid] + (y - y0[eid]) * (x1[eid] - x0[eid]) / dy

    return _chain_quads(
        _slabs([edges]), lambda ym: _layer_union_intervals(edges, ym), edge_x
    )


def _emit_quad(edge_x, span, key):
    ys, ye = span
    l_eid = np.array([key[0]])
    r_eid = np.array([key[1]])
    xl0, xr0 = float(edge_x(l_eid, ys)[0]), float(edge_x(r_eid, ys)[0])
    xl1, xr1 = float(edge_x(l_eid, ye)[0]), float(edge_x(r_eid, ye)[0])
    ring = np.array([[xl0, ys], [xr0, ys], [xr1, ye], [xl1, ye], [xl0, ys]])
    # degenerate (zero-area sliver from coincident boundaries) -> skip
    if abs((xr0 - xl0) + (xr1 - xl1)) * (ye - ys) < 1e-300:
        return None
    return ring


# ------------------------------------------- boundary merging (round 3)


def _ring_area(pts: list[tuple]) -> float:
    a = 0.0
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        a += x0 * y1 - x1 * y0
    return a / 2.0


def _pip(px: float, py: float, ring: np.ndarray) -> bool:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    return bool(((cond) & (px < xint)).sum() % 2 == 1)


def merged_boundary_polygons(quads: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Stitch a non-overlapping trapezoid decomposition (the output of
    ``union_geometry``) into merged-boundary polygons-with-holes — the
    shape PostGIS ST_UNION emits (reference app/query.py:195-213), with
    internal horizontal seams cancelled and collinear vertices removed.

    Exactness model: every vertex y is an exact slab breakpoint shared by
    construction; x's are edge interpolations that can differ by ~1 ulp
    between adjacent quads, so x's are snapped per exact-y level within a
    relative 1e-9 tolerance before seam cancellation and stitching.
    CW rings (holes of the union) are attached to the smallest CCW outer
    containing them. If stitching hits a degenerate pinch topology the
    function falls back to the decomposition itself (one polygon per
    quad) — same region, unmerged boundaries.
    """
    if not quads:
        return []
    fallback = [[np.asarray(q, dtype=np.float64)] for q in quads]

    # 1. collect corner x's per exact y level and snap within tolerance
    levels: dict[float, list] = {}
    corners = []
    for q in quads:
        xl0, ys = float(q[0][0]), float(q[0][1])
        xr0 = float(q[1][0])
        xr1, ye = float(q[2][0]), float(q[2][1])
        xl1 = float(q[3][0])
        corners.append((xl0, xr0, ys, xl1, xr1, ye))
        levels.setdefault(ys, []).extend((xl0, xr0))
        levels.setdefault(ye, []).extend((xl1, xr1))
    scale = max(1.0, max(abs(x) for c in corners for x in (c[0], c[1], c[3], c[4])))
    eps = 1e-9 * scale
    snap: dict[float, dict[float, float]] = {}
    for y, xs in levels.items():
        m: dict[float, float] = {}
        rep = None
        for x in sorted(set(xs)):
            if rep is None or x - rep > eps:
                rep = x
            m[x] = rep
        snap[y] = m

    # 2. directed boundary segments (interior on the left); horizontal
    #    edges go through per-level seam cancellation
    segs: list[tuple] = []
    horiz: dict[float, list] = {}
    for xl0, xr0, ys, xl1, xr1, ye in corners:
        a0, b0 = snap[ys][xl0], snap[ys][xr0]
        a1, b1 = snap[ye][xl1], snap[ye][xr1]
        if (b0, ys) != (b1, ye):
            segs.append((b0, ys, b1, ye))  # right side, upward
        if (a1, ye) != (a0, ys):
            segs.append((a1, ye, a0, ys))  # left side, downward
        if b0 > a0:
            horiz.setdefault(ys, []).append((a0, b0, 1))  # bottom
        if b1 > a1:
            horiz.setdefault(ye, []).append((a1, b1, -1))  # top
    for y, items in horiz.items():
        xs = sorted({x for x0, x1, _ in items for x in (x0, x1)})
        for i in range(len(xs) - 1):
            a, b = xs[i], xs[i + 1]
            mid = 0.5 * (a + b)
            f = sum(s for x0, x1, s in items if x0 < mid < x1)
            if f > 0:
                segs.append((a, y, b, y))  # bottom boundary, +x
            elif f < 0:
                segs.append((b, y, a, y))  # top boundary, -x

    # 3. walk cycles; at junctions take the sharpest left turn (keeps
    #    rings simple at pinch points, interior stays on the left)
    import math
    from collections import defaultdict

    out_map = defaultdict(list)
    for i, s in enumerate(segs):
        out_map[(s[0], s[1])].append(i)
    used = [False] * len(segs)
    rings: list[list[tuple]] = []
    for i0 in range(len(segs)):
        if used[i0]:
            continue
        start = (segs[i0][0], segs[i0][1])
        pts = [start]
        cur = i0
        ok = True
        for _guard in range(len(segs) + 1):
            used[cur] = True
            ax, ay, bx, by = segs[cur]
            pts.append((bx, by))
            if (bx, by) == start:
                break
            cands = [j for j in out_map[(bx, by)] if not used[j]]
            if not cands:
                ok = False
                break
            if len(cands) == 1:
                cur = cands[0]
            else:
                din = (bx - ax, by - ay)

                def turn(j):
                    cx, cy = segs[j][2] - segs[j][0], segs[j][3] - segs[j][1]
                    return math.atan2(din[0] * cy - din[1] * cx, din[0] * cx + din[1] * cy)

                cur = max(cands, key=turn)
        else:
            ok = False
        if not ok:
            return fallback
        # drop collinear vertices
        core = pts[:-1]
        n = len(core)
        keep = []
        for i in range(n):
            p, v, q = core[i - 1], core[i], core[(i + 1) % n]
            if (v[0] - p[0]) * (q[1] - v[1]) - (v[1] - p[1]) * (q[0] - v[0]) != 0.0:
                keep.append(v)
        if len(keep) >= 3:
            rings.append(keep)

    # 4. CCW rings are outers, CW rings are holes of their smallest
    #    containing outer (probe an edge midpoint — strictly interior)
    outers: list[tuple] = []
    holes: list[list[tuple]] = []
    for r in rings:
        a = _ring_area(r)
        arr = np.array(r + [r[0]], dtype=np.float64)
        if a > 0:
            outers.append((a, arr))
        elif a < 0:
            holes.append(arr)
    if not outers:
        return fallback
    polys: list[list[np.ndarray]] = [[arr] for _a, arr in outers]
    order = sorted(range(len(outers)), key=lambda i: outers[i][0])
    for h in holes:
        mx, my = 0.5 * (h[0][0] + h[1][0]), 0.5 * (h[0][1] + h[1][1])
        for i in order:  # smallest containing outer first
            if _pip(mx, my, outers[i][1]):
                polys[i].append(h)
                break
        else:
            return fallback
    return polys
